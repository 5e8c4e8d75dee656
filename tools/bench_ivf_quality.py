"""Pipeline-level IVF quality at map scale (round-3 VERDICT weak #5).

The round-3 IVF study measured recall-vs-nprobe at the BANK level on
synthetic gaussians; this harness measures what serving actually pays: on
a 100k-row map whose first 4,096 rows are REAL keyframes (model
descriptors + BEV images of synthetic-city scans along a serpentine
trajectory, 2 m spacing) and whose other 95,904 rows are adversarial
decoys (perturbed real descriptors at 0.5-2x each row's nearest-neighbor
distance — hard negatives inside the real data's local structure), a
256-query population (poses ≤ 8 m from random keyframes, yaw = heading
±15° with half reversed) is pushed through recognition + registration
under:

  flat exact fp32  |  IVF+int8 at nprobe ∈ {16, 32, 64}

reporting recognition recall@1/@5/@20 (top-k hits a ground-truth positive
within posDistThr = 20 m, main.py:322-351 semantics) and located-query
success (first successful registration lane lands on a positive —
global_localization.cpp:511-574 first-success-wins). Decoy store rows are
all-free images, so a decoy reaching the registration stage fails the
overlap gate and honestly costs the query its located status.

The model forward runs ONCE per query (shared across backends); each
backend only re-runs search + registration, so the comparison isolates
index quality.

Usage: python tools/bench_ivf_quality.py [n_total] [n_kf] [n_q]
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


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def make_city(seed, x_extent, y_extent, n_walls):
    """Wall-segment city covering [-x, x] × [0, y]."""
    rng = np.random.RandomState(seed)
    walls = []
    for _ in range(n_walls):
        x0 = rng.uniform(-x_extent, x_extent)
        y0 = rng.uniform(-20, y_extent + 20)
        ang = rng.uniform(0, np.pi)
        ts = rng.uniform(0, rng.uniform(4, 14), 250)
        walls.append(np.stack(
            [x0 + np.cos(ang) * ts, y0 + np.sin(ang) * ts,
             rng.uniform(0, 3.5, 250)], 1))
    return np.concatenate(walls).astype(np.float32)


def scan_at(world, x, y, yaw, seed, n_pts=16384, radius=35.0):
    r = np.random.RandomState(seed)
    rel = world[:, :2] - np.array([x, y])
    pts = world[np.einsum("ij,ij->i", rel, rel) < radius * radius]
    c, s = np.cos(-yaw), np.sin(-yaw)
    px, py = pts[:, 0] - x, pts[:, 1] - y
    out = np.stack([c * px - s * py, s * px + c * py,
                    pts[:, 2] - 1.73], 1)  # sensor 1.73 m above ground
    out = out + r.normal(0, 0.03, out.shape).astype(np.float32)
    k = min(len(out), n_pts)
    sel = r.choice(len(out), k, replace=len(out) < n_pts)
    return out[sel].astype(np.float32)


def main():
    n_total = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_kf = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    n_q = int(sys.argv[3]) if len(sys.argv) > 3 else 256

    from gloc3d_tpu.config import PipelineConfig
    from gloc3d_tpu.index.ivf import IVFBank
    from gloc3d_tpu.models import build_model
    from gloc3d_tpu.models.fold import fold_batch_norm
    from gloc3d_tpu.ops.topk import l2_topk
    from gloc3d_tpu.pipeline import GlobalLocalizer

    cfg = PipelineConfig.s2s().fast_match(fm=True)
    cfg = cfg.replace(model=cfg.model.replace(fold_bn=True),
                      index=cfg.index.replace(capacity=n_total),
                      # scans here are 16,384 rays — padding to the KITTI
                      # 122k max_points would only slow the training stage
                      voxel=cfg.voxel.replace(max_points=16384),
                      bev=cfg.bev.replace(max_points=16384))
    vc, s, dim, topk = cfg.voxel, cfg.bev.image_size, cfg.index.dim, \
        cfg.index.top_k
    n_pts = vc.max_points

    # ---- city + trajectory: serpentine rows 30 m apart, 2 m kf spacing
    kf_per_row = 64
    n_rows = (n_kf + kf_per_row - 1) // kf_per_row
    row_len = kf_per_row * 2.0
    world = make_city(3, row_len / 2 + 50, n_rows * 30.0,
                      n_walls=int(24 * n_rows))
    kf_poses = np.zeros((n_kf, 3), np.float32)
    rng = np.random.RandomState(0)
    for i in range(n_kf):
        r_i, c_i = divmod(i, kf_per_row)
        x = (c_i if r_i % 2 == 0 else kf_per_row - 1 - c_i) * 2.0 \
            - row_len / 2
        kf_poses[i] = (x, 30.0 * r_i,
                       (0.0 if r_i % 2 == 0 else np.pi)
                       + rng.uniform(-0.2, 0.2))
    qi = rng.choice(n_kf, n_q, replace=False)
    q_poses = kf_poses[qi].copy()
    q_poses[:, :2] += rng.uniform(-8, 8, (n_q, 2))
    # realistic revisit yaw: near the keyframe heading with ±15° noise,
    # half the queries traversing in reverse (the 180°-forgiveness case,
    # global_localization.cpp:423-449). The descriptor is a BEV NetVLAD —
    # deliberately NOT yaw-invariant (matches the reference model), so a
    # fully random yaw would measure the model, not the index.
    q_poses[:, 2] += rng.uniform(-0.26, 0.26, n_q) \
        + np.pi * (rng.rand(n_q) < 0.5)

    d = np.linalg.norm(
        q_poses[:, None, :2] - kf_poses[None, :, :2], axis=-1)
    positives = [np.nonzero(d[i] < 20.0)[0] for i in range(n_q)]
    n_pos = np.array([len(p) for p in positives])
    log(f"city {row_len:.0f}x{n_rows*30:.0f} m, {len(world)} world pts; "
        f"{n_kf} keyframes, {n_q} queries, positives/query "
        f"median {int(np.median(n_pos))} min {n_pos.min()}")
    assert n_pos.min() > 0

    # ---- train the descriptor model on the city ------------------------
    # An untrained model's descriptor geometry is degenerate (measured:
    # exact-search recall@20 = 0.016, IVF k-means cells collapse to p50
    # fill 0) — index quality is unmeasurable on it. Train the flagship
    # s2s model in the A/B learning regime (ab_torch_flax_s2s part 3:
    # lr 3e-4, SGD m=0.9 wd=1e-3 clip=1.0, StepLR(5, 0.5), triplet margin
    # sqrt(0.1), hardest-negative mining — main.py:139-158/630-645
    # semantics) on 256 map keyframes + 128 revisit queries.
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ab_torch_flax import (  # noqa: E402
        LR_GAMMA, LR_STEP, MARGIN, MOMENTUM, N_NEG, WD, mine_batch, recalls,
    )
    import optax
    from gloc3d_tpu.models.losses import training_triplet_loss
    from gloc3d_tpu.train.cluster import init_vlad_from_data

    model = build_model(cfg.model, vc)
    base = build_model(
        cfg.model.replace(fold_bn=False, compute_dtype="float32"), vc)
    pad0 = np.zeros((1, n_pts, 4), np.float32)
    m0 = np.zeros((1, n_pts), np.float32)
    m0[0, :16384] = 1.0
    params0 = jax.jit(base.init)(
        jax.random.PRNGKey(0), jnp.asarray(pad0), jnp.asarray(m0))

    n_tr_db = min(256, n_kf)
    n_tr_q = min(128, n_kf)
    tr_db_poses = kf_poses[:: max(n_kf // n_tr_db, 1)][:n_tr_db].copy()
    rng3 = np.random.RandomState(11)
    tqi = rng3.choice(n_kf, n_tr_q, replace=False)
    tr_q_poses = kf_poses[tqi].copy()
    tr_q_poses[:, :2] += rng3.uniform(-8, 8, (n_tr_q, 2))
    tr_q_poses[:, 2] += rng3.uniform(-0.26, 0.26, n_tr_q) \
        + np.pi * (rng3.rand(n_tr_q) < 0.5)

    def build_scans(poses, seed0):
        pts = np.zeros((len(poses), n_pts, 4), np.float32)
        msk = np.zeros((len(poses), n_pts), np.float32)
        for j, (x, y, yaw) in enumerate(poses):
            sc = scan_at(world, x, y, yaw, seed0 + j)
            pts[j, :len(sc), :3] = sc
            pts[j, :len(sc), 3] = np.random.RandomState(
                seed0 + j).uniform(0, 1, len(sc))
            msk[j, :len(sc)] = 1.0
        return pts, msk

    t0 = time.time()
    tr_db = build_scans(tr_db_poses, 4_000_000)
    tr_q = build_scans(tr_q_poses, 5_000_000)
    log(f"training scans built in {time.time()-t0:.0f} s")

    params0, _, _ = init_vlad_from_data(
        cfg, base, params0, tr_db[0][:64], tr_db[1][:64],
        jax.random.PRNGKey(2), num_images=64, per_image=100)
    tparams, tstats = params0["params"], params0["batch_stats"]

    epochs, B = int(os.environ.get("IVFQ_EPOCHS", "20")), 2
    steps_per_epoch = n_tr_q // B
    lr_sched = optax.piecewise_constant_schedule(
        3e-4, {e * steps_per_epoch: LR_GAMMA
               for e in range(LR_STEP, epochs + 1, LR_STEP)})
    topt = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.add_decayed_weights(WD),
        optax.trace(decay=MOMENTUM),
        optax.scale_by_schedule(lambda c: -lr_sched(c)),
    )
    tstate = topt.init(tparams)

    @jax.jit
    def train_step(params, stats, state, pts_all, m_all, neg_mask):
        def loss_fn(pp):
            out, upd = base.apply(
                {"params": pp, "batch_stats": stats}, pts_all, m_all,
                train=True, mutable=["batch_stats"])
            xq, xp = out[:B], out[B:2 * B]
            xn = out[2 * B:].reshape(B, N_NEG, -1)
            return (training_triplet_loss(xq, xp, xn, neg_mask, MARGIN),
                    upd["batch_stats"])
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        upd, state = topt.update(grads, state, params)
        return optax.apply_updates(params, upd), new_stats, state, loss

    @jax.jit
    def fwd_eval(params, stats, pts, m):
        return base.apply({"params": params, "batch_stats": stats}, pts, m)

    def cache_of(pts, m, bs=8):
        outs, nq = [], len(pts)
        pad = (-nq) % bs
        if pad:
            pts = np.concatenate([pts, np.repeat(pts[-1:], pad, 0)])
            m = np.concatenate([m, np.repeat(m[-1:], pad, 0)])
        for i in range(0, len(pts), bs):
            outs.append(np.asarray(fwd_eval(
                tparams, tstats, jnp.asarray(pts[i:i + bs]),
                jnp.asarray(m[i:i + bs]))))
        return np.concatenate(outs)[:nq]

    dmat = np.linalg.norm(
        tr_q_poses[:, None, :2] - tr_db_poses[None, :, :2], axis=-1)
    pos_l = [np.nonzero(dmat[i] < 10.0)[0] for i in range(n_tr_q)]
    neg_l = [np.nonzero(dmat[i] > 20.0)[0] for i in range(n_tr_q)]
    mine_rng = np.random.RandomState(42)
    t0 = time.time()
    for epoch in range(epochs):
        cache_q, cache_db = cache_of(*tr_q), cache_of(*tr_db)
        losses = []
        order = np.random.RandomState(1000 + epoch).permutation(n_tr_q)
        for i in range(0, n_tr_q - B + 1, B):
            pa = np.zeros((2 * B + B * N_NEG, n_pts, 4), np.float32)
            ma = np.zeros((2 * B + B * N_NEG, n_pts), np.float32)
            nm = np.zeros((B, N_NEG), np.float32)
            got = False
            for bi, qi_ in enumerate(order[i:i + B]):
                mres = mine_batch(cache_q, cache_db, qi_, pos_l, neg_l,
                                  mine_rng)
                if mres is None:
                    continue
                p_idx, n_idx = mres
                got = True
                pa[bi], ma[bi] = tr_q[0][qi_], tr_q[1][qi_]
                pa[B + bi], ma[B + bi] = tr_db[0][p_idx], tr_db[1][p_idx]
                for j, ni in enumerate(n_idx):
                    pa[2 * B + bi * N_NEG + j] = tr_db[0][ni]
                    ma[2 * B + bi * N_NEG + j] = tr_db[1][ni]
                    nm[bi, j] = 1.0
            if not got:
                continue
            tparams, tstats, tstate, loss = train_step(
                tparams, tstats, tstate, jnp.asarray(pa), jnp.asarray(ma),
                jnp.asarray(nm))
            losses.append(float(loss))
        r = recalls(cache_db, cache_q, tr_db_poses[:, :2], tr_q_poses[:, :2])
        log(f"train epoch {epoch}: loss={np.mean(losses):.4f} "
            f"r@1={r['r@1']:.3f} r@5={r['r@5']:.3f} "
            f"({(time.time()-t0)/(epoch+1):.0f} s/epoch)")

    fparams = {"params": fold_batch_norm(tparams, tstats)}

    loc = GlobalLocalizer(cfg, model, fparams, host_stats=True,
                          device_keyframes=True, host_mirror=False)
    # pre-size the store so ingest never reallocates mid-loop
    loc._kf_cap = n_total
    loc._kf_store = jnp.zeros((n_total, s, s // 8), jnp.uint8)
    loc._kf_origins = jnp.zeros((n_total, 2), jnp.float32)

    B = 32

    def extract_batch(poses, seed0):
        pts = np.zeros((len(poses), n_pts, 4), np.float32)
        msk = np.zeros((len(poses), n_pts), np.float32)
        for j, (x, y, yaw) in enumerate(poses):
            sc = scan_at(world, x, y, yaw, seed0 + j)
            pts[j, :len(sc), :3] = sc
            pts[j, :len(sc), 3] = np.random.RandomState(
                seed0 + j).uniform(0, 1, len(sc))
            msk[j, :len(sc)] = 1.0
        desc, bev, _ = loc.extract(pts, msk)
        return np.asarray(desc), bev

    t0 = time.time()
    kf_desc = np.zeros((n_kf, dim), np.float32)
    for i in range(0, n_kf, B):
        de, bev = extract_batch(kf_poses[i:i + B], 1000 + i)
        kf_desc[i:i + len(de)] = de
        loc._store_keyframes(bev.image, bev.origin_xy, offset=i)
    log(f"extracted+stored {n_kf} keyframes in {time.time()-t0:.0f} s")

    t0 = time.time()
    q_desc = np.zeros((n_q, dim), np.float32)
    q_imgs = np.zeros((n_q, s, s), np.float32)
    q_orgs = np.zeros((n_q, 2), np.float32)
    for i in range(0, n_q, B):
        de, bev = extract_batch(q_poses[i:i + B], 500_000 + i)
        q_desc[i:i + len(de)] = de
        q_imgs[i:i + len(de)] = np.asarray(bev.image)
        q_orgs[i:i + len(de)] = np.asarray(bev.origin_xy)
    log(f"extracted {n_q} queries in {time.time()-t0:.0f} s")

    # ---- adversarial decoys: perturbed copies of real descriptors -----
    # Each decoy = a real keyframe descriptor + noise scaled by that row's
    # nearest-neighbor distance (0.5-2x), renormalized. This places decoys
    # INSIDE the real data's local structure — some closer to a query than
    # the true match (hard negatives, "other places that look similar") —
    # while inheriting the real rows' cell distribution (the previous
    # 64-center gaussian-blob decoys both exerted zero top-20 pressure and
    # skewed one IVF cell past 131k rows -> 68 GB probe gather).
    n_decoy = n_total - n_kf
    rng2 = np.random.RandomState(7)
    sq = np.einsum("nd,nd->n", kf_desc, kf_desc)
    g = sq[:, None] + sq[None] - 2.0 * (kf_desc @ kf_desc.T)  # dot-form
    np.fill_diagonal(g, np.inf)
    d_nn = np.sqrt(np.maximum(g.min(1), 0.0))  # (n_kf,) nearest-nbr dist
    src = rng2.randint(0, n_kf, n_decoy)
    eps = rng2.uniform(0.5, 2.0, n_decoy).astype(np.float32)
    noise = rng2.randn(n_decoy, dim).astype(np.float32)
    noise /= np.maximum(np.linalg.norm(noise, axis=1, keepdims=True), 1e-9)
    decoys = kf_desc[src] + noise * (eps * d_nn[src])[:, None]
    decoys /= np.maximum(
        np.linalg.norm(decoys, axis=1, keepdims=True), 1e-9)
    decoys *= np.linalg.norm(kf_desc[src], axis=1, keepdims=True)
    bank_np = np.concatenate([kf_desc, decoys.astype(np.float32)])
    # nearest-neighbor sanity: how confusable are decoys really?
    sample = rng2.choice(n_q, 8, replace=False)
    dd = ((q_desc[sample, None] - bank_np[None, :]) ** 2).sum(-1)
    frac_decoy_top20 = float(
        (np.argsort(dd, 1)[:, :20] >= n_kf).mean())
    log(f"decoy pressure: {frac_decoy_top20:.2f} of sampled top-20 rows "
        f"are decoys under exact search")

    # ---- backends ------------------------------------------------------
    bank_d = jnp.asarray(bank_np)
    search_flat = jax.jit(lambda q: l2_topk(q, bank_d, topk))

    cap0 = max(256, 2 * n_total // 1024)
    ivf = IVFBank(dim=dim, num_cells=1024, cell_capacity=cap0,
                  nprobe=32, quantize="int8",
                  max_cell_capacity=4 * cap0)
    t0 = time.time()
    ivf.train(jnp.asarray(bank_np[
        rng2.choice(n_total, min(65536, n_total), replace=False)]))
    ivf.add(jnp.asarray(bank_np))
    log(f"IVF built (1024 cells, int8, cap {ivf.cell_capacity}) in "
        f"{time.time()-t0:.0f} s; spilled={ivf.spilled} "
        f"overflow={ivf.spill_overflow} "
        f"fill p50/p99/max={np.percentile(ivf._sizes, 50):.0f}/"
        f"{np.percentile(ivf._sizes, 99):.0f}/{ivf._sizes.max()}")

    # ---- shared registration program ----------------------------------
    match_store = jax.jit(jax.vmap(
        loc._match_topk_store_impl, in_axes=(0, 0, 0, None, None)))

    def evaluate(tag, idx_all):
        """idx_all: (n_q, topk) candidate rows per query."""
        r1 = r5 = r20 = 0
        located = 0
        reg_on_pos = []
        mb = 8
        for i in range(0, n_q, mb):
            raw = idx_all[i:i + mb]
            valid = raw >= 0          # -1 = empty IVF filler, never a hit
            idx = np.where(valid, raw, 0)
            res = match_store(
                jnp.asarray(q_imgs[i:i + mb]), jnp.asarray(q_orgs[i:i + mb]),
                jnp.asarray(idx.astype(np.int32)),
                loc._kf_store, loc._kf_origins)
            succ = np.asarray(res.success) & valid
            for b in range(len(idx)):
                qidx = i + b
                pos = positives[qidx]
                hits = np.isin(idx[b], pos) & valid[b]
                r1 += bool(hits[:1].any())
                r5 += bool(hits[:5].any())
                r20 += bool(hits.any())
                lanes = np.nonzero(succ[b])[0]
                if len(lanes):
                    first = idx[b][lanes[0]]
                    ok = first in pos
                    located += bool(ok)
                    reg_on_pos.append(ok)
        log(f"{tag:18s} recall@1 {r1/n_q:.3f}  @5 {r5/n_q:.3f}  "
            f"@20 {r20/n_q:.3f}  located {located/n_q:.3f}")
        return r1 / n_q, r5 / n_q, r20 / n_q, located / n_q

    results = {}
    d2, idx = jax.device_get(search_flat(jnp.asarray(q_desc)))
    results["flat_exact"] = evaluate("flat exact fp32", np.asarray(idx))
    for nprobe in (16, 32, 64):
        # chunk queries: the probed gather is (Q, nprobe*cap, D) int8 —
        # 64 queries at nprobe=64/cap 1024 is ~540 MB, full 256 would be 4x
        idx = np.concatenate([
            ivf.query(q_desc[i:i + 64], k=topk, nprobe=nprobe)[1]
            for i in range(0, n_q, 64)])
        results[f"ivf_np{nprobe}"] = evaluate(
            f"IVF+int8 np={nprobe}", idx)

    print("backend, recall@1, recall@5, recall@20, located")
    for k, v in results.items():
        print(f"{k}, " + ", ".join(f"{x:.4f}" for x in v))


if __name__ == "__main__":
    main()
