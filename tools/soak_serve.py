"""Serving soak test: a sustained online SLAM session on the real chip
(round-3 VERDICT "do this" #5).

Drives the `gloc serve`-style online loop for N (default 5,000) steps on a
synthetic multi-lap course: every step extracts a keyframe (host-stats
serving path), runs SLAM-mode loop detection against the non-recent bank
(exclude-recent 30, loop_detector.cpp:62-81), registers any proposed
closure against the named keyframe (match_keyframe), and ingests the
keyframe into the bank + HBM bit-packed store. Bank and store both start
at 1,024 capacity so the run crosses several capacity doublings (each is
one expected recompile, amortized).

Watches exactly what a soak should: per-window p50/p95/max step latency,
XLA recompile events after warmup (counted exactly via the
jax_log_compiles hook), HBM store/bank growth, and loop-closure activity.
Pass/fail: p50/p95 stable across windows, zero compiles not attributable
to a capacity doubling after warmup.

Usage: python tools/soak_serve.py [n_steps]
"""

import logging
import os
import sys
import time

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("GLOC3D_COMPILE_CACHE", "/tmp/gloc3d_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gloc3d_tpu.config import PipelineConfig  # noqa: E402
from gloc3d_tpu.core.transforms import Rigid3  # noqa: E402
from gloc3d_tpu.models import build_model  # noqa: E402
from gloc3d_tpu.models.fold import fold_batch_norm  # noqa: E402
from gloc3d_tpu.pipeline import GlobalLocalizer, Keyframe  # noqa: E402


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


class CompileCounter(logging.Handler):
    """Counts XLA compilations via the jax_log_compiles channel."""

    def __init__(self):
        super().__init__(level=logging.WARNING)
        self.events = []

    def emit(self, record):
        msg = record.getMessage()
        if "Compiling" in msg or "compil" in msg.lower():
            self.events.append((time.time(), msg.split("\n")[0][:120]))


def make_world(seed=11, n_walls=700, extent=320.0):
    rng = np.random.RandomState(seed)
    walls = []
    for _ in range(n_walls):
        x0, y0 = rng.uniform(-extent, extent, 2)
        ang = rng.uniform(0, np.pi)
        ts = rng.uniform(0, rng.uniform(4, 14), 250)
        walls.append(np.stack([x0 + np.cos(ang) * ts,
                               y0 + np.sin(ang) * ts,
                               rng.uniform(0, 3.5, 250)], 1))
    return np.concatenate(walls).astype(np.float32)


def lap_pose(t):
    """Square-ish lap of ~1,000 steps around a 480×480 m course."""
    u = (t % 1000) / 1000.0 * 4.0
    leg, f = int(u), u - int(u)
    if leg == 0:
        return -240 + 480 * f, -240.0, 0.0
    if leg == 1:
        return 240.0, -240 + 480 * f, np.pi / 2
    if leg == 2:
        return 240 - 480 * f, 240.0, np.pi
    return -240.0, 240 - 480 * f, -np.pi / 2


def scan_of(world, x, y, yaw, seed, n_pts=16384, radius=35.0,
            ground=False):
    r = np.random.RandomState(seed)
    rel = world[:, :2] - np.array([x, y])
    pts = world[np.einsum("ij,ij->i", rel, rel) < radius * radius]
    c, s = np.cos(-yaw), np.sin(-yaw)
    px, py = pts[:, 0] - x, pts[:, 1] - y
    out = np.stack([c * px - s * py, s * px + c * py, pts[:, 2] - 1.73], 1)
    out = (out + r.normal(0, 0.03, out.shape)).astype(np.float32)
    k = min(len(out), n_pts)
    sel = r.choice(len(out), k, replace=len(out) < n_pts)
    out = out[sel]
    if ground:
        # aligned mode: a ground disk under the sensor plus an independent
        # per-scan ±2° roll/pitch tilt — what the device ground estimator
        # must undo before BEV projection (the reference's aligned serving,
        # global_localization.cpp:423-437).
        ng = 4096
        rad = radius * np.sqrt(r.uniform(0, 1, ng))
        th = r.uniform(0, 2 * np.pi, ng)
        disk = np.stack([rad * np.cos(th), rad * np.sin(th),
                         -1.73 + r.normal(0, 0.02, ng)], 1).astype(np.float32)
        out = np.concatenate([out, disk])
        roll, pitch = r.uniform(-0.035, 0.035, 2)
        cr, sr = np.cos(roll), np.sin(roll)
        cp, sp = np.cos(pitch), np.sin(pitch)
        rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]], np.float32)
        ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]], np.float32)
        out = out @ (ry @ rx).T
    return out


def train_on_course(cfg, base_model, params0, world, aligned, epochs=20):
    """Train the flagship model on the soak's own course (the A/B learning
    regime: lr 3e-4, SGD m=.9 wd=1e-3 clip=1, StepLR(5,.5), triplet margin
    sqrt(0.1), hardest-negative mining — main.py:139-158/630-645 semantics)
    so closure QUALITY is measurable (an untrained descriptor proposes
    junk; the round-4 soaks measured stability only). Caches the trained
    fold to /tmp so soak reruns skip the ~10 min train."""
    import pickle

    import optax

    from gloc3d_tpu.models.losses import training_triplet_loss
    from gloc3d_tpu.train.cluster import init_vlad_from_data

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ab_torch_flax import (
        LR_GAMMA, LR_STEP, MARGIN, MOMENTUM, N_NEG, WD, mine_batch, recalls,
    )

    cache = f"/tmp/soak_trained_{'aligned' if aligned else 'flat'}.pkl"
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            fparams = pickle.load(f)
        log(f"loaded trained fold from {cache}")
        return jax.tree_util.tree_map(jnp.asarray, fparams)

    n_pts = cfg.voxel.max_points
    n_db, n_q, B = 256, 128, 2
    rngT = np.random.RandomState(33)
    db_poses = np.array([lap_pose(t) for t in
                         np.linspace(0, 999, n_db)], np.float32)
    qsel = rngT.choice(n_db, n_q, replace=False)
    q_poses = db_poses[qsel].copy()
    q_poses[:, :2] += rngT.uniform(-6, 6, (n_q, 2))
    q_poses[:, 2] += rngT.uniform(-0.15, 0.15, n_q)

    def build(poses, seed0):
        pts = np.zeros((len(poses), n_pts, 4), np.float32)
        msk = np.zeros((len(poses), n_pts), np.float32)
        for j, (x, y, yaw) in enumerate(poses):
            sc = scan_of(world, x, y, yaw, seed0 + j, ground=aligned)
            pts[j, :len(sc), :3] = sc
            pts[j, :len(sc), 3] = np.random.RandomState(
                seed0 + j).uniform(0, 1, len(sc))
            msk[j, :len(sc)] = 1.0
        return pts, msk

    t0 = time.time()
    tr_db, tr_q = build(db_poses, 4_000_000), build(q_poses, 5_000_000)
    log(f"training scans built in {time.time()-t0:.0f} s")

    params0, _, _ = init_vlad_from_data(
        cfg, base_model, params0, tr_db[0][:64], tr_db[1][:64],
        jax.random.PRNGKey(2), num_images=64, per_image=100)
    tparams, tstats = params0["params"], params0["batch_stats"]
    steps_per_epoch = n_q // B
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
            out, upd = base_model.apply(
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
        return base_model.apply({"params": params, "batch_stats": stats},
                                pts, m)

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
        q_poses[:, None, :2] - db_poses[None, :, :2], axis=-1)
    pos_l = [np.nonzero(dmat[i] < 10.0)[0] for i in range(n_q)]
    neg_l = [np.nonzero(dmat[i] > 20.0)[0] for i in range(n_q)]
    mine_rng = np.random.RandomState(42)
    t0 = time.time()
    for epoch in range(epochs):
        cache_q, cache_db = cache_of(*tr_q), cache_of(*tr_db)
        losses = []
        order = np.random.RandomState(1000 + epoch).permutation(n_q)
        for i in range(0, n_q - B + 1, B):
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
        r = recalls(cache_of(*tr_db), cache_of(*tr_q),
                    db_poses[:, :2], q_poses[:, :2])
        log(f"train epoch {epoch}: loss={np.mean(losses):.4f} "
            f"r@1={r['r@1']:.3f} r@5={r['r@5']:.3f} "
            f"({(time.time()-t0)/(epoch+1):.0f} s/epoch)")

    fparams = {"params": fold_batch_norm(tparams, tstats)}
    with open(cache, "wb") as f:
        import pickle as pk
        pk.dump(jax.tree_util.tree_map(np.asarray, fparams), f)
    log(f"trained fold cached to {cache}")
    return fparams


def main():
    args = [a for a in sys.argv[1:]
            if a not in ("--aligned", "--train")]
    aligned = "--aligned" in sys.argv[1:]
    do_train = "--train" in sys.argv[1:]
    n_steps = int(args[0]) if args else 5000

    counter = CompileCounter()
    jax.config.update("jax_log_compiles", True)
    logging.getLogger("jax._src.interpreters.pxla").addHandler(counter)
    logging.getLogger("jax._src.dispatch").addHandler(counter)

    cfg = PipelineConfig.s2s().fast_match(fm=True)
    cfg = cfg.replace(
        model=cfg.model.replace(fold_bn=True),
        index=cfg.index.replace(capacity=1024, num_exclude_recent=30),
    )
    vc = cfg.voxel
    n_pts = vc.max_points

    base = build_model(cfg.model.replace(fold_bn=False), vc)
    pad0 = np.zeros((1, n_pts, 4), np.float32)
    m0 = np.zeros((1, n_pts), np.float32)
    m0[0, :16384] = 1.0
    params0 = jax.jit(base.init)(
        jax.random.PRNGKey(0), jnp.asarray(pad0), jnp.asarray(m0))
    world = make_world()
    if do_train:
        fparams = train_on_course(cfg, base, params0, world, aligned)
    else:
        fparams = {"params": fold_batch_norm(params0["params"],
                                             params0["batch_stats"])}
    model = build_model(cfg.model, vc)
    loc = GlobalLocalizer(cfg, model, fparams, host_stats=True,
                          device_keyframes=True, host_mirror=False,
                          align_ground=aligned)

    log(f"world {len(world)} pts; course 480x480 m, ~1000 steps/lap, "
        f"{n_steps} steps{' | ALIGNED serving path' if aligned else ''}"
        f"{' | TRAINED descriptors' if do_train else ''}")

    # ---- gate calibration: descriptor distances of unrelated pose pairs
    # set the loop gate (a model's distance scale is arbitrary). Pairs are
    # filtered by GROUND-TRUTH separation > 30 m: the lap wraps, so naive
    # cross pairs include spatially-adjacent poses (t≈0 vs t≈995) whose
    # small trained-descriptor distances drag the low percentile under the
    # true-revisit range and silently close the gate (measured: gate
    # 0.0746 vs true-pair d2 ≈ 0.09 → recall 0.011 before this fix).
    cal, cal_xy = [], []
    for i in range(64):
        x, y, yaw = lap_pose(i * 15.9)
        sc = scan_of(world, x, y, yaw, 90_000 + i, ground=aligned)
        pts = np.zeros((1, n_pts, 4), np.float32)
        msk = np.zeros((1, n_pts), np.float32)
        pts[0, :len(sc), :3] = sc
        msk[0, :len(sc)] = 1.0
        desc, _, _ = loc.extract(pts, msk)
        cal.append(np.asarray(desc)[0])
        cal_xy.append((x, y))
    cal = np.stack(cal)
    cal_xy = np.asarray(cal_xy)
    d2s = ((cal[:32, None] - cal[None, 32:]) ** 2).sum(-1)
    geo = np.linalg.norm(cal_xy[:32, None] - cal_xy[None, 32:], axis=-1)
    unrel = d2s[geo > 30.0]
    # POSITIVE pairs: 16 cal poses revisited with the soak's own pose noise
    # and a fresh scan seed — the distances the gate must ADMIT. The
    # trained embedding's positive band (d2 ~0.08-0.12) overlaps the
    # closest ~2 % of unrelated pairs, so a purely-unrelated-percentile
    # gate silently closes on true revisits (measured: recall 0.011); the
    # proposal gate instead opens to 1.5× the positive p95 and the
    # registration gate does the rejection (its measured false-accept rate
    # is ~0.2 % of proposals), matching loop_detector.h:103's fixed
    # trained-scale threshold role.
    pos = []
    for i in range(16):
        x, y, yaw = lap_pose(i * 61.7)
        r2 = np.random.RandomState(95_000 + i)
        x2 = x + r2.uniform(-1.5, 1.5)
        y2 = y + r2.uniform(-1.5, 1.5)
        yaw2 = yaw + r2.uniform(-0.15, 0.15)
        a = scan_of(world, x, y, yaw, 96_000 + i, ground=aligned)
        b = scan_of(world, x2, y2, yaw2, 97_000 + i, ground=aligned)
        ds = []
        for sc in (a, b):
            pts = np.zeros((1, n_pts, 4), np.float32)
            msk = np.zeros((1, n_pts), np.float32)
            pts[0, :len(sc), :3] = sc
            msk[0, :len(sc)] = 1.0
            d, _, _ = loc.extract(pts, msk)
            ds.append(np.asarray(d)[0])
        pos.append(((ds[0] - ds[1]) ** 2).sum())
    pos = np.asarray(pos)
    gate = float(max(np.percentile(unrel, 2.0),
                     1.5 * np.percentile(pos, 95)))
    loc.bank.cfg = loc.bank.cfg.replace(metric_dist_threshold=gate)
    log(f"loop gate calibrated: dist2 < {gate:.4f} (unrelated p2 "
        f"{np.percentile(unrel, 2.0):.4f} over {unrel.size} pairs >30 m; "
        f"positive p50/p95 {np.percentile(pos, 50):.4f}/"
        f"{np.percentile(pos, 95):.4f} over {len(pos)} revisit pairs)")

    lat = {"extract": [], "detect": [], "match": [], "add": [], "step": []}
    closures = tries = 0
    # closure QUALITY vs session ground truth (lap_pose + noise is the gt
    # trajectory): precision = accepted closures whose keyframe lies within
    # posDistThr=20 m; recall = revisit-opportunity steps (some non-recent
    # keyframe within 10 m) that produced an accepted true closure; pose
    # error of accepted closures vs the gt relative transform, with the
    # reference's 180° yaw-flip forgiveness (global_localization.cpp:270-335)
    gt_poses = np.zeros((n_steps, 3), np.float32)
    n_tp = n_fp = n_opp = n_opp_closed = 0
    terrs, yerrs = [], []
    window = max(n_steps // 10, 1)
    doubles = []
    t_start = time.time()
    warm_compiles = None

    for t in range(n_steps):
        x, y, yaw = lap_pose(t)
        # small pose noise: later laps revisit, not replay
        r = np.random.RandomState(t)
        x += r.uniform(-1.5, 1.5)
        y += r.uniform(-1.5, 1.5)
        yaw += r.uniform(-0.15, 0.15)
        sc = scan_of(world, x, y, yaw, t, ground=aligned)
        pts = np.zeros((1, n_pts, 4), np.float32)
        msk = np.zeros((1, n_pts), np.float32)
        pts[0, :len(sc), :3] = sc
        pts[0, :len(sc), 3] = r.uniform(0, 1, len(sc))
        msk[0, :len(sc)] = 1.0

        gt_poses[t] = (x, y, yaw)
        excl = cfg.index.num_exclude_recent
        if t > excl:
            past = gt_poses[: t - excl]
            is_opp = bool(
                (np.linalg.norm(past[:, :2] - [x, y], axis=1) < 10.0).any())
        else:
            is_opp = False
        n_opp += is_opp

        t0 = time.time()
        desc, bev, ground = loc.extract(pts, msk)
        qd = np.asarray(desc)          # sync point
        t1 = time.time()
        hit = loc.bank.detect_loop(qd)
        t2 = time.time()
        t3 = t2
        if hit is not None:
            tries += 1
            res = loc.match_keyframe(bev=bev, db_index=hit[0],
                                     ground=ground)
            closures += bool(res.success)
            if res.success:
                kx, ky, kyaw = gt_poses[hit[0]]
                tp = np.hypot(x - kx, y - ky) < 20.0
                n_tp += tp
                n_fp += not tp
                n_opp_closed += tp and is_opp
                if tp and res.match_xy_yaw is not None:
                    ck, sk = np.cos(-kyaw), np.sin(-kyaw)
                    gt_rel = (ck * (x - kx) - sk * (y - ky),
                              sk * (x - kx) + ck * (y - ky))
                    est = np.asarray(res.match_xy_yaw, np.float64)
                    terrs.append(float(np.hypot(est[0] - gt_rel[0],
                                                est[1] - gt_rel[1])))
                    dy_ = abs(np.arctan2(np.sin(est[2] - (yaw - kyaw)),
                                         np.cos(est[2] - (yaw - kyaw))))
                    yerrs.append(float(np.degrees(
                        min(dy_, abs(np.pi - dy_)))))
            t3 = time.time()
        cap0 = (loc.bank._capacity, loc._kf_cap)
        loc.bank.add(qd)
        loc._store_keyframes(bev.image, bev.origin_xy,
                             offset=len(loc.keyframes))
        if aligned:  # aligned 6-DoF composition needs the db ground frame
            g = Rigid3(np.asarray(ground.transform.rotation[0]),
                       np.asarray(ground.transform.translation[0]))
        else:
            g = None
        loc.keyframes.append(Keyframe(None, None, g, None))
        # relay caveat: block_until_ready does not block through axon —
        # a one-element fetch is the only true sync
        _ = np.asarray(loc._kf_origins[0])
        t4 = time.time()
        if (loc.bank._capacity, loc._kf_cap) != cap0:
            doubles.append((t, loc.bank._capacity, loc._kf_cap))
            log(f"  step {t}: capacity doubling -> bank "
                f"{loc.bank._capacity}, store {loc._kf_cap}")

        lat["extract"].append((t1 - t0) * 1e3)
        lat["detect"].append((t2 - t1) * 1e3)
        lat["match"].append((t3 - t2) * 1e3)
        lat["add"].append((t4 - t3) * 1e3)
        lat["step"].append((t4 - t0) * 1e3)

        if t == 99:
            warm_compiles = len(counter.events)
            log(f"warmup done at step 100: {warm_compiles} compiles so far")
        if (t + 1) % window == 0:
            w = np.array(lat["step"][-window:])
            log(f"steps {t + 1 - window}-{t}: step p50 "
                f"{np.percentile(w, 50):.1f} p95 {np.percentile(w, 95):.1f} "
                f"max {w.max():.1f} ms | extract p50 "
                f"{np.percentile(lat['extract'][-window:], 50):.1f} | "
                f"detect p50 {np.percentile(lat['detect'][-window:], 50):.1f}"
                f" | closures {closures}/{tries} | map {len(loc.keyframes)}")

    dt = time.time() - t_start
    post = [e for e in counter.events[warm_compiles or 0:]]
    hbm_gb = (loc._kf_store.size + loc.bank._bank.size
              * (1 if loc.bank._quantized else 4)) / 1e9
    steady = np.array(lat["step"][100:])
    log(f"DONE: {n_steps} steps in {dt:.0f} s ({n_steps / dt:.1f} steps/s "
        f"sustained, single CPU feeding one chip)")
    log(f"steady-state step latency p50 {np.percentile(steady, 50):.1f} "
        f"p95 {np.percentile(steady, 95):.1f} p99 "
        f"{np.percentile(steady, 99):.1f} max {steady.max():.1f} ms")
    first_half = steady[: len(steady) // 2]
    second_half = steady[len(steady) // 2:]
    log(f"drift check: p50 first half {np.percentile(first_half, 50):.1f} "
        f"vs second half {np.percentile(second_half, 50):.1f} ms; p95 "
        f"{np.percentile(first_half, 95):.1f} vs "
        f"{np.percentile(second_half, 95):.1f} ms")
    log(f"capacity doublings: {doubles}")
    log(f"compiles after warmup: {len(post)} "
        f"(doublings account for recompiles of the size-parameterized "
        f"programs)")
    for ts, msg in post[:20]:
        log(f"  +{ts - t_start:7.1f}s {msg}")
    log(f"closures {closures}/{tries} proposed; final map "
        f"{len(loc.keyframes)} keyframes, ~{hbm_gb:.2f} GB HBM "
        f"(store + bank)")
    if closures:
        prec = n_tp / max(n_tp + n_fp, 1)
        rec = n_opp_closed / max(n_opp, 1)
        log(f"closure QUALITY vs session gt: precision {prec:.3f} "
            f"({n_tp} true / {n_fp} false of {closures} accepted), "
            f"revisit recall {rec:.3f} ({n_opp_closed}/{n_opp} "
            f"opportunity steps closed)")
        if terrs:
            log(f"closure pose error (accepted true closures): trans "
                f"p50 {np.percentile(terrs, 50):.2f} p95 "
                f"{np.percentile(terrs, 95):.2f} max {max(terrs):.2f} m | "
                f"yaw (180°-forgiven) p50 {np.percentile(yerrs, 50):.2f} "
                f"p95 {np.percentile(yerrs, 95):.2f} deg")


if __name__ == "__main__":
    main()
