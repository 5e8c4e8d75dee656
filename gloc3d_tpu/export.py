"""Model export: ahead-of-time serialized executables.

The reference hands models from Python to C++ via TorchScript traces
(main.py:189-198 save → loop_detector.h:47-57 load; s2s_libtorch/gen_*).
The TPU-native equivalent is ``jax.export``: the jitted descriptor function
is lowered to StableHLO, serialized to bytes, and reloadable in any process
(Python or the C++ PJRT runtime) without the model-building code.

  blob = export_descriptor_fn(model, params, example_inputs)
  fn   = load_exported(blob)         # callable: inputs → descriptors
"""

from __future__ import annotations

from typing import Callable

import jax
from jax import export as jexport


def export_fn(fn: Callable, *example_args) -> bytes:
    """Serialize jit(fn) specialized to the example shapes → bytes."""
    exported = jexport.export(jax.jit(fn))(*example_args)
    return exported.serialize()


def load_exported(blob: bytes) -> Callable:
    """Deserialize an exported function; returns a device-callable."""
    exported = jexport.deserialize(blob)
    return exported.call


def export_descriptor_model(model, params, *example_inputs) -> bytes:
    """Export a DescriptorModel forward (params baked in as constants)."""

    def fwd(*inputs):
        return model.apply(params, *inputs)

    return export_fn(fwd, *example_inputs)
