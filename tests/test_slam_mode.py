"""SLAM-mode loop closure over a trajectory (scan-context-style protocol).

Exercises the reference's online loop-detection semantics
(loop_detector.cpp:46-81): keyframes stream in, the recent window is
excluded from search, and a loop fires when the nearest non-recent
descriptor clears the metric gate.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gloc3d_tpu.config import IndexConfig
from gloc3d_tpu.index import DescriptorBank
from test_pipeline import CFG, scan_at
from gloc3d_tpu.models import build_model


def test_loop_closure_on_revisit():
    model = build_model(CFG.model, CFG.voxel)
    pts, mask = scan_at(0, 0, 0)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(pts[None]), jnp.asarray(mask[None])
    )
    fwd = jax.jit(lambda p, m: model.apply(params, p, m))

    # square loop trajectory: 16 keyframes out, then revisit the start
    waypoints = []
    for t in np.linspace(0, 1, 16, endpoint=False):
        if t < 0.25:
            waypoints.append((-30 + 240 * t, -30, 0.0))
        elif t < 0.5:
            waypoints.append((30, -30 + 240 * (t - 0.25), np.pi / 2))
        elif t < 0.75:
            waypoints.append((30 - 240 * (t - 0.5), 30, np.pi))
        else:
            waypoints.append((-30, 30 - 240 * (t - 0.75), -np.pi / 2))

    # calibrate the metric gate from the data: with an untrained model the
    # absolute descriptor scale is arbitrary, so place the gate between the
    # revisit distance and the smallest distinct-place distance — the same
    # calibration a deployment does on a validation run.
    descs = []
    for wp in waypoints:
        p, m = scan_at(*wp)
        descs.append(np.asarray(
            fwd(jnp.asarray(p[None]), jnp.asarray(m[None]))[0]
        ))
    descs = np.stack(descs)
    d2_all = ((descs[:, None] - descs[None]) ** 2).sum(-1)
    min_interplace = d2_all[np.triu_indices(16, k=3)].min()

    p, m = scan_at(waypoints[2][0] + 0.5, waypoints[2][1], waypoints[2][2])
    d_revisit = np.asarray(fwd(jnp.asarray(p[None]), jnp.asarray(m[None]))[0])
    revisit_d2 = ((d_revisit - descs[2]) ** 2).sum()
    assert revisit_d2 < 0.25 * min_interplace, (
        "revisit must be far closer than any distinct-place pair"
    )
    gate = float(np.sqrt(revisit_d2 * min_interplace))  # geometric midpoint

    cfg = IndexConfig(dim=128, top_k=3, num_exclude_recent=5,
                      metric_dist_threshold=gate, capacity=64)
    bank = DescriptorBank(cfg)
    fired = []
    for i, d in enumerate(descs):
        hit = bank.detect_loop(jnp.asarray(d))
        bank.add(jnp.asarray(d))
        if hit is not None:
            fired.append((i, hit[0]))
    assert not fired, f"no loop should fire on the first lap: {fired}"

    hit = bank.detect_loop(jnp.asarray(d_revisit))
    assert hit is not None
    assert hit[0] == 2


def test_loop_closure_sharded_bank(devices):
    """The same exclude-recent streaming protocol on the 8-device mesh bank:
    global-index validity masking in sharded_topk (loop_detector.cpp:62-81
    semantics) matches the flat DescriptorBank decision for decision."""
    from gloc3d_tpu.parallel import make_mesh
    from gloc3d_tpu.parallel.sharding import ShardedBank

    rng = np.random.RandomState(0)
    descs = rng.randn(24, 16).astype(np.float32) * 2.0
    revisit = descs[3] + 0.05  # near keyframe 3
    gate = 1.0
    n_excl = 5

    cfg = IndexConfig(dim=16, top_k=3, num_exclude_recent=n_excl,
                      metric_dist_threshold=gate, capacity=32)
    flat = DescriptorBank(cfg)
    sharded = ShardedBank(make_mesh(), dim=16, capacity=32)

    decisions_flat, decisions_sharded = [], []
    for i, d in enumerate(descs):
        hit = flat.detect_loop(jnp.asarray(d))
        decisions_flat.append(None if hit is None else hit[0])
        flat.add(jnp.asarray(d))

        if len(sharded) > n_excl + cfg.top_k:
            d2, idx = sharded.query(d[None], k=1,
                                    exclude_after=len(sharded) - n_excl)
            hit_s = (int(idx[0, 0]), float(d2[0, 0])) \
                if float(d2[0, 0]) < gate else None
        else:
            hit_s = None
        decisions_sharded.append(None if hit_s is None else hit_s[0])
        sharded.add(d[None])

    assert decisions_flat == decisions_sharded

    hit = flat.detect_loop(jnp.asarray(revisit))
    d2, idx = sharded.query(revisit[None], k=1,
                            exclude_after=len(sharded) - n_excl)
    hit_s = int(idx[0, 0]) if float(d2[0, 0]) < gate else None
    assert (hit[0] if hit else None) == hit_s == 3
