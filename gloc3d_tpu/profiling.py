"""Profiling and observability.

Replaces the reference's TicToc wall-clock timers (tic_toc.h:10-32 sprinkled
through global_localization.cpp:433-524) and tensorboardX scalars
(main.py:170-187) with:

  - ``StageTimer``: named accumulating timers with async-dispatch-safe
    blocking (a device fetch, since block_until_ready does not actually
    block through the axon relay — see bench.py).
  - ``trace``: a jax.profiler trace context for XLA-level inspection.
  - ``MetricsLogger``: append-only JSONL metrics (step, name, value) — the
    tensorboard substitute that needs no dependency; a tensorboard reader
    can be pointed at the same values later.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict
from typing import Dict

import jax
import numpy as np


def _block(x) -> None:
    """Force real completion of a device value (fetch one scalar)."""
    leaves = jax.tree_util.tree_leaves(x)
    if leaves and hasattr(leaves[0], "addressable_shards"):
        np.asarray(leaves[0].reshape(-1)[0] if leaves[0].ndim else leaves[0])


class StageTimer:
    """Accumulating per-stage wall timers (TicToc parity)."""

    def __init__(self):
        self.total: Dict[str, float] = defaultdict(float)
        self.count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, result_ref=None):
        t0 = time.time()
        yield
        if result_ref is not None:
            _block(result_ref)
        self.total[name] += time.time() - t0
        self.count[name] += 1

    def mean_ms(self, name: str) -> float:
        return self.total[name] / max(self.count[name], 1) * 1000.0

    def report(self) -> Dict[str, float]:
        return {k: self.mean_ms(k) for k in self.total}


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace (view with tensorboard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class MetricsLogger:
    """Append-only JSONL metrics stream."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self.path = path
        self._f = open(path, "a")

    def log(self, step: int, **values) -> None:
        rec = {"step": int(step)}
        for k, v in values.items():
            rec[k] = float(v) if isinstance(v, (int, float, np.floating)) else v
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self) -> None:
        self._f.close()
