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


def main():
    args = [a for a in sys.argv[1:] if a != "--aligned"]
    aligned = "--aligned" in sys.argv[1:]
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
    fparams = {"params": fold_batch_norm(params0["params"],
                                         params0["batch_stats"])}
    model = build_model(cfg.model, vc)
    loc = GlobalLocalizer(cfg, model, fparams, host_stats=True,
                          device_keyframes=True, host_mirror=False,
                          align_ground=aligned)

    world = make_world()
    log(f"world {len(world)} pts; course 480x480 m, ~1000 steps/lap, "
        f"{n_steps} steps{' | ALIGNED serving path' if aligned else ''}")

    # ---- gate calibration: descriptor distances of 64 unrelated pose
    # pairs set the loop gate (an untrained model's scale is arbitrary)
    cal = []
    for i in range(64):
        x, y, yaw = lap_pose(i * 15.9)
        sc = scan_of(world, x, y, yaw, 90_000 + i, ground=aligned)
        pts = np.zeros((1, n_pts, 4), np.float32)
        msk = np.zeros((1, n_pts), np.float32)
        pts[0, :len(sc), :3] = sc
        msk[0, :len(sc)] = 1.0
        desc, _, _ = loc.extract(pts, msk)
        cal.append(np.asarray(desc)[0])
    cal = np.stack(cal)
    d2s = ((cal[:32, None] - cal[None, 32:]) ** 2).sum(-1)
    gate = float(np.percentile(d2s, 2.0))
    loc.bank.cfg = loc.bank.cfg.replace(metric_dist_threshold=gate)
    log(f"loop gate calibrated: dist2 < {gate:.4f}")

    lat = {"extract": [], "detect": [], "match": [], "add": [], "step": []}
    closures = tries = 0
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


if __name__ == "__main__":
    main()
