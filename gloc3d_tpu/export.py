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


def export_fn(fn: Callable, *example_args,
              platforms=("cpu", "tpu")) -> bytes:
    """Serialize jit(fn) specialized to the example shapes → bytes.

    ``platforms`` lowers for every listed backend so the blob exported on
    one machine (e.g. a CPU build box) runs on another (the TPU serving
    host) — the cross-machine half of the TorchScript hand-off story."""
    exported = jexport.export(
        jax.jit(fn), platforms=list(platforms))(*example_args)
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


class ExportedDescriptorModel:
    """Model-shaped adapter over a serialized descriptor blob.

    ``apply(params, *inputs)`` ignores ``params`` (they were baked into the
    blob at export time) and calls the deserialized executable — so a
    GlobalLocalizer can serve queries in a process that never imports any
    model-building code, which is the reference's TorchScript→C++ hand-off
    (main.py:189-198 save → loop_detector.h:47-57 load) without the second
    language boundary. Wire it up via ``gloc query --from-export BLOB``.

    Only the plain forward is supported: the blob is specialized to the
    export-time batch shape (B=1 query extraction), and keyword paths
    (host_stats' ``voxel_stats``) need the real model.
    """

    # GlobalLocalizer checks this before routing the forward through
    # voxel_stats fast paths (device_sort / host_stats)
    supports_voxel_stats = False

    def __init__(self, blob: bytes):
        self._call = load_exported(blob)

    def apply(self, params, *inputs, **kwargs):
        del params
        if kwargs:
            raise ValueError(
                "exported models support only the plain forward (got "
                f"kwargs {sorted(kwargs)}); host_stats/voxel_stats paths "
                "need the real model")
        return self._call(*inputs)
