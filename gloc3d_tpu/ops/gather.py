"""Row gather that lowers well on TPU.

XLA lowers `table[idx]` (fancy indexing / gather-of-rows) at ~10 GB/s on
this hardware once the gathered block exceeds ~10 MB — 14 ms for a 134 MB
probe in the IVF scan (tools/probe_ivf.py), against an HBM speed of light
of ~800 GB/s. A vmapped `dynamic_slice` with a traced start index lowers
to dynamic-slice HLO instead and runs ~10× faster. This is the same
family of pathology as the repeated-index `take_along_axis` documented in
ARCHITECTURE.md's scatter/gather discipline.
"""

from __future__ import annotations

import jax

Array = jax.Array


def row_gather(table: Array, idx: Array) -> Array:
    """``table[idx]`` for leading-axis row gathers, via vmapped
    dynamic_slice.

    Args:
      table: (N, ...) array; rows are gathered whole.
      idx: integer array of any shape; values index table's axis 0
        (callers clamp/validate — dynamic_slice clamps out-of-range starts
        to the valid window, matching jnp's clip-mode gather on TPU).

    Returns:
      Array of shape ``idx.shape + table.shape[1:]``.
    """
    def one(j):
        return jax.lax.dynamic_slice(
            table, (j,) + (0,) * (table.ndim - 1), (1,) + table.shape[1:]
        )[0]

    fn = one
    for _ in range(idx.ndim):
        fn = jax.vmap(fn)
    return fn(idx)
