"""Micro-attribution of the s2s detect path's non-conv time (real TPU).

bench.py's headline (1.9 ms device) decomposes roughly as conv ~0.4,
top-k ~0.1, leaving ~1.3 ms in the point pipeline + composition. This
times each candidate hot spot in isolation (marginal in-jit chaining) so
the next optimization is aimed at a measured number, not a guess:

  g_table      — the (122480,)-row gather from the (11200, 4) stats table
                 (ops/voxelize.py::points_to_voxels_hoststats:203)
  g_table_rg   — same via ops/gather.py::row_gather (vmapped dynamic_slice)
  g_table_oh   — same as one-hot bf16 matmul (122480×11200 @ 11200×128)
  pn_matmul    — PointNet-sized bf16 matmul (122480, 16) @ (16, 64)
  feats_build  — full points_to_voxels_hoststats + 14-dim concat
  cumsum       — _cumsum_rows_128 on (61240, 128)
  seg_bounds   — the k=2 boundary gathers of segment_sum_sorted_fast
  seg_bounds_rg— same via row_gather
  segsum       — full segment_sum_sorted_fast (122480, 64)
  vlad         — NetVLAD-FC pool on the (1, 80, 140, 128) feature map

Usage: python tools/profile_detect.py  (TPU; one process)
"""

import os
import sys
import time

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("GLOC3D_COMPILE_CACHE", "/tmp/gloc3d_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gloc3d_tpu.config import PipelineConfig
from gloc3d_tpu.data.native import compute_voxel_stats_host_sorted
from gloc3d_tpu.ops.gather import row_gather
from gloc3d_tpu.ops.pallas_scatter import (
    _cumsum_rows_128, segment_sum_sorted_fast,
)
from gloc3d_tpu.ops.voxelize import points_to_voxels_hoststats


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def marginal(fn, *args, n1=10, n2=30, reps=3):
    def chain(n):
        @jax.jit
        def run(*a):
            def body(_, c):
                return fn(*a, c)

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        return run

    f1, f2 = chain(n1), chain(n2)
    _ = np.asarray(f1(*args)), np.asarray(f2(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.time(); _ = np.asarray(f1(*args)); t1 = time.time() - t0
        t0 = time.time(); _ = np.asarray(f2(*args)); t2 = time.time() - t0
        best = min(best, (t2 - t1) / (n2 - n1) * 1000.0)
    return best


def main():
    cfg = PipelineConfig.s2s()
    vc = cfg.voxel
    n_pts = vc.max_points
    raw = np.fromfile(
        "/root/reference/s2s_libtorch/000000.bin", np.float32
    ).reshape(-1, 4)
    pts = np.zeros((1, n_pts, 4), np.float32)
    n_real = min(len(raw), n_pts)
    pts[0, :n_real] = raw[:n_real]
    counts = np.asarray([n_real], np.int64)
    s_p, s_v, s_i, s_c, s_g, s_s = compute_voxel_stats_host_sorted(
        pts, counts, vc.xbound, vc.ybound, vc.zbound, crop=True,
        num_threads=1)

    v = s_c.shape[1]
    log(f"N={n_pts} V={v}")
    table = jnp.asarray(
        np.concatenate([s_c[..., None], s_g], axis=-1)[0])  # (V, 4)
    ids = jnp.asarray(s_i[0])                               # (N,)

    # ---- the stats-table gather (3 formulations) -----------------------
    def g_table(t, i, c):
        g = t[i + (c * 0).astype(jnp.int32)]
        return g.sum() * 1e-9

    log(f"g_table   (fancy index):   {marginal(g_table, table, ids):.3f} ms")

    def g_table_rg(t, i, c):
        g = row_gather(t, i + (c * 0).astype(jnp.int32))
        return g.sum() * 1e-9

    log(f"g_table_rg (dyn-slice):    {marginal(g_table_rg, table, ids):.3f} ms")

    # one-hot matmul: pad table to 128 cols, chunked over points
    v_pad = -(-v // 128) * 128
    t_pad = jnp.zeros((v_pad, 128)).at[:v, :4].set(table).astype(jnp.bfloat16)

    def g_table_oh(tp, i, c):
        ii = (i + (c * 0).astype(jnp.int32)).reshape(-1, 1)
        vids = jax.lax.broadcasted_iota(jnp.int32, (ii.shape[0], v_pad), 1)
        oh = (ii == vids).astype(jnp.bfloat16)
        g = jax.lax.dot_general(oh, tp, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return g.sum() * 1e-9

    log(f"g_table_oh (one-hot mm):   {marginal(g_table_oh, t_pad, ids, n1=4, n2=8):.3f} ms")

    # ---- PointNet-sized matmul ------------------------------------------
    rng = np.random.RandomState(0)
    f16 = jnp.asarray(rng.randn(n_pts, 16).astype(np.float32), jnp.bfloat16)
    w = jnp.asarray(rng.randn(16, 64).astype(np.float32) * 0.1, jnp.bfloat16)

    def pn(f, ww, c):
        y = jax.lax.dot_general(
            f * (1.0 + c * 1e-30).astype(f.dtype), ww,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return y.sum() * 1e-9

    log(f"pn_matmul (122k x16x64):   {marginal(pn, f16, w):.3f} ms")

    # ---- full feature build ---------------------------------------------
    p_d = jnp.asarray(s_p)
    v_d = jnp.asarray(s_v)
    i_d = jnp.asarray(s_i)
    c_d = jnp.asarray(s_c)
    g_d = jnp.asarray(s_g)

    def feats_build(p, m, i, rc, ct, c):
        vox = points_to_voxels_hoststats(
            p[..., :3] + c * 0.0, m, i, rc, ct,
            vc.xbound, vc.ybound, vc.zbound)
        f = jnp.concatenate([
            p, vox["voxel_point_count"][..., None],
            vox["local_points_xyz"], vox["point_centroids"],
            p[..., :3] - vox["voxel_centers"]], axis=-1)
        return f.sum() * 1e-9

    log(f"feats_build (hoststats):   "
        f"{marginal(feats_build, p_d, v_d, i_d, c_d, g_d):.3f} ms")

    # ---- segment sum pieces ----------------------------------------------
    feats64 = jnp.asarray(rng.randn(n_pts, 64).astype(np.float32))
    starts = jnp.asarray(s_s[0])

    x128 = feats64.reshape(n_pts // 2, 128)

    def cum(x, c):
        y = _cumsum_rows_128(x * (1.0 + c * 1e-30))
        return y[-1].sum() * 1e-9

    log(f"cumsum (61240, 128):       {marginal(cum, x128):.3f} ms")

    cumd = jax.jit(_cumsum_rows_128)(x128)

    def seg_bounds(cu, st, c):
        r_idx = st.astype(jnp.int32) - 1 + (c * 0).astype(jnp.int32)
        s_all = jnp.zeros((st.shape[0], 64))
        for m in range(2):
            q = (r_idx - m) // 2
            rows = cu[jnp.maximum(q, 0)]
            part = jax.lax.dynamic_slice_in_dim(rows, m * 64, 64, axis=1)
            s_all = s_all + jnp.where((r_idx >= m)[:, None], part, 0.0)
        return s_all.sum() * 1e-9

    log(f"seg_bounds (fancy index):  {marginal(seg_bounds, cumd, starts):.3f} ms")

    def seg_bounds_rg(cu, st, c):
        r_idx = st.astype(jnp.int32) - 1 + (c * 0).astype(jnp.int32)
        s_all = jnp.zeros((st.shape[0], 64))
        for m in range(2):
            q = (r_idx - m) // 2
            rows = row_gather(cu, jnp.maximum(q, 0))
            part = jax.lax.dynamic_slice_in_dim(rows, m * 64, 64, axis=1)
            s_all = s_all + jnp.where((r_idx >= m)[:, None], part, 0.0)
        return s_all.sum() * 1e-9

    log(f"seg_bounds_rg (dyn-slice): {marginal(seg_bounds_rg, cumd, starts):.3f} ms")

    def segsum(f, st, c):
        y = segment_sum_sorted_fast(f * (1.0 + c * 1e-30), st)
        return y.sum() * 1e-9

    log(f"segsum full (122480, 64):  {marginal(segsum, feats64, starts):.3f} ms")

    # ---- VLAD pool --------------------------------------------------------
    from gloc3d_tpu.models import build_model

    model = build_model(cfg.model, cfg.voxel)
    fm = jnp.asarray(rng.randn(1, 80, 140, 128).astype(np.float32))
    pts_d = jnp.asarray(pts)
    mask_d = jnp.asarray((np.arange(n_pts) < n_real)[None].astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), pts_d, mask_d)

    def vlad(p, f, c):
        pool = model.bind(p).pool
        d = pool(f * (1.0 + c * 1e-30))
        return d.sum() * 1e-6

    log(f"vlad pool (80x140x128):    {marginal(vlad, params, fm):.3f} ms")


if __name__ == "__main__":
    main()
