#!/usr/bin/env python
"""Equal-conditions A/B on the s2s flagship: reference torch PointPillar+
NetVLAD-FC vs the Flax DescriptorModel.

Companion to ab_torch_flax.py (i2i VGG study — which shows both frameworks
collapse identically under the reference's from-scratch i2i regime). The s2s
model has BatchNorm throughout and consumes raw geometry, so from-scratch
training works; this script trains BOTH frameworks from the SAME transplanted
initial weights on the SAME synthetic-world scans with the SAME
hyperparameters/mining and reports per-epoch recall curves.

The reference model is imported verbatim from /root/reference/model
(pointpillar.py, netvlad_fc.py, voxel.py) with two import shims:
torch_scatter (scatter_sum/scatter_mean via torch.scatter_add_ — the
official broadcast semantics) and pytorch3d (module placeholder; only
PoseLoss touches it, never executed here). Nothing is copied.

Procedure parity with main.py:
  - one concatenated forward per step: input = cat(q, pos, negs)
    (main.py:139-143) — BN batch statistics shared across the triplet, on
    both sides; fixed-size zero-padded batches keep XLA shapes static and
    torch sees the identical padded batch.
  - loss: TripletMarginLoss(margin=sqrt(0.1), p=2, 'sum')/nNeg
    (main.py:152-158).
  - optimizer SGD(momentum .9, wd 1e-3) + StepLR(5, .5) (main.py:630-645);
    lr0 = 1e-4 (the reference default; higher rates destabilize the
    untrained-BN regime on both frameworks).
  - mining/cluster-init/eval: shared with ab_torch_flax.py.

Run: python tools/ab_torch_flax_s2s.py [--epochs 15] [--out /tmp/ab_s2s]
"""

import argparse
import json
import os
import sys
import time
import types

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from ab_torch_flax import (  # noqa: E402
    MARGIN, LR_STEP, LR_GAMMA, WD, MOMENTUM, N_NEG, N_NEG_SAMPLE, BATCH_Q,
    NONTRIV_POS, NEG_DIST, make_world, build_split, kmeans, mine_batch,
    recalls,
)

REF = "/root/reference"
LR0 = float(__import__("os").environ.get("AB_LR", "1e-4"))  # reference default;
# 1e-3 is unstable here even clipped; AB_LR overrides for studies
K_CLUSTERS = 16
DIM = 128           # conv_out output channels (fixed by the architecture)
N_PTS = 4096
XB, YB, ZB = (-16.0, 16.0, 0.5), (-8.0, 8.0, 0.5), (-10.0, 10.0, 20.0)
if os.environ.get("AB_GRID") == "wide":
    # wider pillar window for the high-signal study: the 32×16 m default
    # (a CPU-torch feasibility shrink of the reference's 70×40 m,
    # gen_libtorch_pointpillar.py:25) caps r@1 — the descriptor sees too
    # little of each place. 48×24 m at the same 0.5 m pillar size; applied
    # identically to both frameworks.
    XB, YB = (-24.0, 24.0, 0.5), (-12.0, 12.0, 0.5)
    N_PTS = 6144


# ------------------------------------------------------------------ shims

def _install_shims():
    """Register torch_scatter / pytorch3d stand-ins so the reference model
    modules import. scatter_* reimplements the documented torch_scatter
    broadcast semantics with plain torch ops."""
    import torch

    def _broadcast(index, src, dim):
        if dim < 0:
            dim = src.dim() + dim
        if index.dim() == 1:
            for _ in range(0, dim):
                index = index.unsqueeze(0)
        for _ in range(index.dim(), src.dim()):
            index = index.unsqueeze(-1)
        return index.expand(src.size())

    def scatter_sum(src, index, dim=-1, dim_size=None):
        index = _broadcast(index, src, dim)
        if dim < 0:
            dim = src.dim() + dim
        size = list(src.size())
        size[dim] = int(dim_size)
        out = torch.zeros(size, dtype=src.dtype, device=src.device)
        return out.scatter_add_(dim, index.long(), src)

    def scatter_mean(src, index, dim=-1, dim_size=None):
        s = scatter_sum(src, index, dim, dim_size)
        cnt = scatter_sum(torch.ones_like(src), index, dim, dim_size)
        return s / cnt.clamp(min=1.0)

    ts = types.ModuleType("torch_scatter")
    ts.scatter_sum = scatter_sum
    ts.scatter_mean = scatter_mean
    ts.scatter_add = scatter_sum
    sys.modules.setdefault("torch_scatter", ts)

    p3d = types.ModuleType("pytorch3d")
    p3d_t = types.ModuleType("pytorch3d.transforms")
    p3d_rc = types.ModuleType("pytorch3d.transforms.rotation_conversions")
    p3d.transforms = p3d_t
    p3d_t.rotation_conversions = p3d_rc
    sys.modules.setdefault("pytorch3d", p3d)
    sys.modules.setdefault("pytorch3d.transforms", p3d_t)
    sys.modules.setdefault(
        "pytorch3d.transforms.rotation_conversions", p3d_rc)


def build_torch_model(seed):
    import torch
    import torch.nn as tnn

    # Zero-padded scans drive the untrained conv stack into the denormal
    # range, which costs ~4x on this CPU (measured 14.4 s -> 3.8 s for a
    # 24-sample forward). Flushing denormals matches XLA/TPU numerics
    # (neither supports denormals) so this makes the A/B *more* equal, not
    # less.
    torch.set_flush_denormal(True)

    _install_shims()
    sys.path.insert(0, REF)
    try:
        from model.pointpillar import PointPillar as RefPointPillar
        from model.netvlad_fc import NetVLAD as RefNetVLAD
    finally:
        sys.path.pop(0)

    torch.manual_seed(seed)

    class S2SVLAD(tnn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = RefPointPillar(
                DIM, list(XB), list(YB), list(ZB), vlad_mode=True)
            self.pool = RefNetVLAD(num_clusters=K_CLUSTERS, dim=DIM,
                                   vladv2=False)

        def forward(self, points, mask):
            return self.pool(self.encoder(points, mask))

    return S2SVLAD()


def build_flax_model():
    from gloc3d_tpu.config import ModelConfig, VoxelConfig
    from gloc3d_tpu.models import build_model

    mc = ModelConfig(encoder="pointpillar", encoder_dim=DIM,
                     num_clusters=K_CLUSTERS, compute_dtype="float32")
    vc = VoxelConfig(max_points=N_PTS, xbound=XB, ybound=YB, zbound=ZB)
    return build_model(mc, vc)


# ------------------------------------------------------- weight transplant

def transplant(tmodel):
    """Torch state → flax {params, batch_stats} (same math; OIHW→HWIO)."""
    import jax.numpy as jnp

    def conv(w):  # (O, I, kH, kW) → (kH, kW, I, O)
        return jnp.asarray(w.detach().numpy().transpose(2, 3, 1, 0))

    def bn(mod):
        return (
            {"scale": jnp.asarray(mod.weight.detach().numpy()),
             "bias": jnp.asarray(mod.bias.detach().numpy())},
            {"mean": jnp.asarray(mod.running_mean.detach().numpy()),
             "var": jnp.asarray(mod.running_var.detach().numpy())},
        )

    enc = tmodel.encoder
    params, stats = {}, {}

    # PointNet: Conv1d(14→64, k=1) + BN1d ≙ Dense + BN
    pnw = enc.pn.pointnet[0].weight.detach().numpy()  # (64, 14, 1)
    pn_bn_p, pn_bn_s = bn(enc.pn.pointnet[1])
    params["pn"] = {"Dense_0": {"kernel": jnp.asarray(pnw[:, :, 0].T)},
                    "BatchNorm_0": pn_bn_p}
    stats["pn"] = {"BatchNorm_0": pn_bn_s}

    def convbn(conv_mod, bn_mod):
        p, s = bn(bn_mod)
        return ({"Conv_0": {"kernel": conv(conv_mod.weight)},
                 "BatchNorm_0": p},
                {"BatchNorm_0": s})

    for name, nlayers in (("block1", 2), ("block2", 3), ("block3", 3)):
        blk = getattr(enc, name).layers
        params[name], stats[name] = {}, {}
        for i in range(nlayers):
            p, s = convbn(blk[3 * i], blk[3 * i + 1])
            params[name][f"ConvBNRelu_{i}"] = p
            stats[name][f"ConvBNRelu_{i}"] = s

    for name, ci in (("up1", 0), ("up2", 1), ("up3", 1)):
        seq = getattr(enc, name)
        params[name], stats[name] = convbn(seq[ci], seq[ci + 1])

    co = enc.conv_out
    params["conv_out_0"], stats["conv_out_0"] = convbn(co[0], co[1])
    params["conv_out_1"], stats["conv_out_1"] = convbn(co[3], co[4])

    pool = tmodel.pool
    pool_params = {
        "conv_weight": jnp.asarray(
            pool.conv.weight.detach().numpy()[:, :, 0, 0].T),
        "centroids": jnp.asarray(pool.centroids.detach().numpy()),
        "hidden1_weights": jnp.asarray(
            pool.hidden1_weights.detach().numpy()),
    }
    return ({"encoder": params, "pool": pool_params},
            {"encoder": stats})


# ------------------------------------------------------------------ data

def make_world_distinct(seed, extent=260.0, cell=16.0):
    """Dense place-distinctive world (the high-signal A/B world).

    The flat random-wall world (ab_torch_flax.make_world) averages ~0.4
    structures per 32×16 m voxel window (200 walls over 520² m²), so s2s
    scans are nearly empty and trained recall sits at chance (the round-4
    A/B caveat). Here every ``cell``-sized tile gets a unique ensemble of
    2-5 structures — towers, L-walls, arcs, crosses — with per-structure
    size, yaw and HEIGHT codes (PointPillar features are strongly
    z-sensitive), so every voxel window holds several uniquely shaped
    landmarks and places are separable by geometry, matching the regime
    the reference trains in on real KITTI (kitti_i2i.py:124-204 splits).
    """
    rng = np.random.RandomState(seed)
    pts = []

    def wall(x0, y0, ang, length, h, n=140):
        ts = rng.uniform(0, length, n)
        return np.stack([x0 + np.cos(ang) * ts, y0 + np.sin(ang) * ts,
                         rng.uniform(0, h, n)], 1)

    for cx in np.arange(-extent, extent, cell):
        for cy in np.arange(-extent, extent, cell):
            for _ in range(rng.randint(2, 6)):
                kind = rng.randint(4)
                x0 = cx + rng.uniform(2.0, cell - 2.0)
                y0 = cy + rng.uniform(2.0, cell - 2.0)
                h = rng.uniform(0.8, 8.0)
                if kind == 0:      # tower shell
                    r = rng.uniform(0.5, 2.5)
                    th = rng.uniform(0, 2 * np.pi, 160)
                    pts.append(np.stack(
                        [x0 + r * np.cos(th), y0 + r * np.sin(th),
                         rng.uniform(0, h, 160)], 1))
                elif kind == 1:    # L-wall
                    ang = rng.uniform(0, np.pi)
                    l1, l2 = rng.uniform(3, 9, 2)
                    pts.append(wall(x0, y0, ang, l1, h))
                    pts.append(wall(x0, y0, ang + np.pi / 2, l2, h))
                elif kind == 2:    # arc segment
                    r = rng.uniform(2.0, 6.0)
                    a0 = rng.uniform(0, 2 * np.pi)
                    th = a0 + rng.uniform(0, rng.uniform(1.0, 4.0), 160)
                    pts.append(np.stack(
                        [x0 + r * np.cos(th), y0 + r * np.sin(th),
                         rng.uniform(0, h, 160)], 1))
                else:              # cross
                    ang = rng.uniform(0, np.pi)
                    l = rng.uniform(4, 10)
                    pts.append(wall(x0 - l / 2 * np.cos(ang),
                                    y0 - l / 2 * np.sin(ang), ang, l, h))
                    ang2 = ang + np.pi / 2
                    pts.append(wall(x0 - l / 2 * np.cos(ang2),
                                    y0 - l / 2 * np.sin(ang2), ang2, l,
                                    rng.uniform(0.8, 8.0)))
    return np.concatenate(pts).astype(np.float32)


def make_scans(world, poses, seed0, n_pts=N_PTS):
    """Raw 4-dim padded scans + masks at the given (x, y, yaw) poses."""
    pts = np.zeros((len(poses), n_pts, 4), np.float32)
    masks = np.zeros((len(poses), n_pts), np.float32)
    for i, (x, y, yaw) in enumerate(poses):
        r = np.random.RandomState(seed0 + i)
        rel = world[:, :2] - np.array([x, y])
        sel = world[np.linalg.norm(rel, axis=1) < 20]
        c, s = np.cos(-yaw), np.sin(-yaw)
        px, py = sel[:, 0] - x, sel[:, 1] - y
        out = np.stack([c * px - s * py, s * px + c * py, sel[:, 2]], 1)
        out = out + r.normal(0, 0.03, out.shape)
        k = min(len(out), n_pts)
        j = r.choice(len(out), k, replace=len(out) < n_pts)
        pts[i, :k, :3] = out[j]
        pts[i, :k, 3] = r.uniform(0, 1, k)
        masks[i, :k] = 1.0
    return pts, masks


# ------------------------------------------------------------------ main

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--n-db", type=int, default=64)
    ap.add_argument("--n-q", type=int, default=32)
    ap.add_argument("--n-db-val", type=int, default=64)
    ap.add_argument("--n-q-val", type=int, default=32)
    ap.add_argument("--side", choices=["both", "torch", "flax"],
                    default="both",
                    help="run one framework only (shared state — data, "
                    "transplanted init, cluster init — is fully seeded, so "
                    "two single-side runs are identical to one --side both "
                    "run; lets the slow torch-CPU side run in the background "
                    "while the flax side runs on the TPU)")
    ap.add_argument("--out", default="/tmp/ab_s2s")
    ap.add_argument("--world", choices=["flat", "distinct"], default="flat",
                    help="flat = the round-3/4 random-wall world; distinct "
                    "= dense per-cell landmark world (high-signal regime)")
    ap.add_argument("--q-yaw", type=float, default=0.3,
                    help="query yaw jitter (rad) around the revisited db "
                    "pose; 0.05 = same-heading revisit (loop-closure "
                    "regime; the s2s encoder is yaw-variant by design — "
                    "the reference removes yaw in the BEV projection, "
                    "submap_3d.cpp:244-247, not in the s2s voxel grid)")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import torch
    import torch.nn as tnn

    import jax
    import jax.numpy as jnp
    import optax

    rng = np.random.RandomState(0)
    world = (make_world_distinct(7) if args.world == "distinct"
             else make_world(7))
    db_t, q_t = build_split(world, rng, args.n_db, args.n_q, (-220, -20),
                            q_yaw=args.q_yaw)
    db_v, q_v = build_split(world, rng, args.n_db_val, args.n_q_val,
                            (20, 220), q_yaw=args.q_yaw)

    print("building scans...", flush=True)
    data = {
        "db_t": make_scans(world, db_t, 100),
        "q_t": make_scans(world, q_t, 10_000),
        "db_v": make_scans(world, db_v, 20_000),
        "q_v": make_scans(world, q_v, 30_000),
    }

    tmodel = build_torch_model(seed=0)
    fmodel = build_flax_model()
    fparams, fstats = transplant(tmodel)

    # ---- init forward parity (eval mode: BN running stats, both fresh)
    x0, m0 = data["db_t"][0][:2], data["db_t"][1][:2]
    tmodel.eval()
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x0), torch.from_numpy(m0)).numpy()
    fwd = jax.jit(lambda p, s, x, m: fmodel.apply(
        {"params": p, "batch_stats": s}, x, m))
    got = np.asarray(fwd(fparams, fstats, jnp.asarray(x0), jnp.asarray(m0)))
    init_diff = float(np.abs(got - want).max())
    rel = init_diff / max(float(np.abs(want).max()), 1e-9)
    # absolute diffs are fp32-reassociation noise on the huge
    # voxel_point_count feature (padding pillar counts ~1e3) that eval-mode
    # BN (running var = 1) does not renormalize; relative is what matters.
    print(f"init forward parity: max|Δ| = {init_diff:.2e} (rel {rel:.2e})")
    assert rel < 2e-2, "transplanted models disagree at init"

    # ---- shared cluster init (reference cluster mode: L2-normalized
    # encoder positions sampled across the train db, main.py:354-401)
    with torch.no_grad():
        f = tmodel.encoder(torch.from_numpy(data["db_t"][0][:16]),
                           torch.from_numpy(data["db_t"][1][:16]))
    fl = f.detach().numpy().reshape(16, DIM, -1).transpose(0, 2, 1)
    descs = fl.reshape(-1, DIM)
    # empty grid regions produce all-zero feature vectors; keep them out of
    # k-means or a cluster can converge to exactly 0 and init_params'
    # centroid normalization (netvlad_fc.py:47) divides by zero.
    norms = np.linalg.norm(descs, axis=1, keepdims=True)
    descs = (descs / np.maximum(norms, 1e-12))[norms[:, 0] > 1e-6]
    descs = descs[rng.choice(len(descs), 4096, replace=False)]
    cents = kmeans(descs, K_CLUSTERS, iters=50)

    tmodel.pool.init_params(cents.copy(), descs.copy())
    from gloc3d_tpu.models import init_netvlad_params
    fparams = init_netvlad_params(fparams, cents, descs, vladv2=False,
                                  path=("pool",))

    # ---- gt positive/negative lists (shared)
    d = np.linalg.norm(q_t[:, None, :2] - db_t[None, :, :2], axis=-1)
    pos_l = [np.nonzero(d[i] < NONTRIV_POS)[0] for i in range(len(q_t))]
    neg_l = [np.nonzero(d[i] > NEG_DIST)[0] for i in range(len(q_t))]

    # ---- torch side
    topt = torch.optim.SGD(tmodel.parameters(), lr=LR0, momentum=MOMENTUM,
                           weight_decay=WD)
    tsched = torch.optim.lr_scheduler.StepLR(topt, LR_STEP, LR_GAMMA)
    tcrit = tnn.TripletMarginLoss(margin=MARGIN, p=2, reduction="sum")
    B = BATCH_Q

    def torch_step(pts_all, m_all, neg_mask):
        # pts_all: (B + B + B*N_NEG, N, 4) = [queries | positives | negs]
        tmodel.train()
        topt.zero_grad()
        out = tmodel(torch.from_numpy(pts_all), torch.from_numpy(m_all))
        xq, xp = out[:B], out[B:2 * B]
        xn = out[2 * B:].reshape(B, N_NEG, -1)
        loss = 0.0
        for b in range(B):
            for j in range(N_NEG):
                if neg_mask[b, j] > 0:
                    loss = loss + tcrit(xq[b:b+1], xp[b:b+1], xn[b, j:j+1])
        loss = loss / max(float(neg_mask.sum()), 1.0)
        loss.backward()
        # NOTE the reference never trains the s2s model (main.py wires only
        # i2i; s2s is export-only), so there is no upstream recipe to match;
        # gradient clipping (norm 1.0, both sides identically) stabilizes
        # the untrained-BN regime whose grad norms spike to ~100.
        tnn.utils.clip_grad_norm_(tmodel.parameters(), 1.0)
        topt.step()
        lv = float(loss.detach())
        if not np.isfinite(lv) and os.environ.get("AB_DEBUG"):
            print(f"NaN trap: out_nan={bool(torch.isnan(out).any())} "
                  f"out_absmax={float(out.abs().max()):.3e} "
                  f"mask_sum={float(neg_mask.sum())}", flush=True)
        return lv

    def torch_cache(pts, m, bs=8):
        tmodel.eval()
        outs = []
        with torch.no_grad():
            for i in range(0, len(pts), bs):
                outs.append(tmodel(torch.from_numpy(pts[i:i+bs]),
                                   torch.from_numpy(m[i:i+bs])).numpy())
        return np.concatenate(outs)

    # ---- flax side (identical optimizer chain; BN via mutable batch_stats)
    steps_per_epoch = max(len(q_t) // B, 1)
    lr_sched = optax.piecewise_constant_schedule(
        LR0, {e * steps_per_epoch: LR_GAMMA
              for e in range(LR_STEP, args.epochs + 1, LR_STEP)})
    fopt = optax.chain(
        optax.clip_by_global_norm(1.0),  # mirrors torch clip_grad_norm_
        optax.add_decayed_weights(WD),
        optax.trace(decay=MOMENTUM),
        optax.scale_by_schedule(lambda c: -lr_sched(c)),
    )
    fstate = fopt.init(fparams)
    from gloc3d_tpu.models.losses import training_triplet_loss

    @jax.jit
    def flax_step(params, stats, state, pts_all, m_all, neg_mask):
        def loss_fn(pp):
            out, upd = fmodel.apply(
                {"params": pp, "batch_stats": stats}, pts_all, m_all,
                train=True, mutable=["batch_stats"])
            xq, xp = out[:B], out[B:2 * B]
            xn = out[2 * B:].reshape(B, N_NEG, -1)
            return (training_triplet_loss(xq, xp, xn, neg_mask, MARGIN),
                    upd["batch_stats"])
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        upd, state = fopt.update(grads, state, params)
        params = optax.apply_updates(params, upd)
        return params, new_stats, state, loss

    @jax.jit
    def flax_fwd(params, stats, pts, m):
        return fmodel.apply({"params": params, "batch_stats": stats}, pts, m)

    fp = {"params": fparams, "stats": fstats, "state": fstate}

    def flax_cache(pts, m, bs=8):
        outs = []
        n = len(pts)
        pad = (-n) % bs
        if pad:
            pts = np.concatenate([pts, np.repeat(pts[-1:], pad, 0)])
            m = np.concatenate([m, np.repeat(m[-1:], pad, 0)])
        for i in range(0, len(pts), bs):
            outs.append(np.asarray(flax_fwd(
                fp["params"], fp["stats"],
                jnp.asarray(pts[i:i+bs]), jnp.asarray(m[i:i+bs]))))
        return np.concatenate(outs)[:n]

    def flax_step_adapter(pts_all, m_all, neg_mask):
        p, st, s, loss = flax_step(
            fp["params"], fp["stats"], fp["state"], jnp.asarray(pts_all),
            jnp.asarray(m_all), jnp.asarray(neg_mask))
        fp["params"], fp["stats"], fp["state"] = p, st, s
        return float(loss)

    # ---- shared training loop (padded, identical batches on both sides)
    order_per_epoch = [np.random.RandomState(1000 + e).permutation(len(q_t))
                       for e in range(args.epochs)]
    report = {"init_forward_max_abs_diff": init_diff,
              "config": {"k": K_CLUSTERS, "dim": DIM, "n_pts": N_PTS,
                         "grid": [XB, YB, ZB], "lr0": LR0, "margin": MARGIN,
                         "epochs": args.epochs, "n_db": args.n_db,
                         "n_q": args.n_q, "n_db_val": args.n_db_val,
                         "n_q_val": args.n_q_val, "side": args.side,
                         "world": args.world, "q_yaw": args.q_yaw},
              "torch": [], "flax": []}

    q_pts, q_m = data["q_t"]
    db_pts, db_m = data["db_t"]

    def dump(report):
        # incremental: a 6 h torch-CPU run must survive interruption
        suffix = "" if args.side == "both" else f"_{args.side}"
        out_path = os.path.join(args.out, f"report{suffix}.json")
        with open(out_path + ".tmp", "w") as f:
            json.dump(report, f, indent=1)
        os.replace(out_path + ".tmp", out_path)
        return out_path

    def run_side(name, cache_fn, step_fn, epoch_end,
                 save_ckpt=None, load_ckpt=None):
        t0 = time.time()
        curves = report[name]
        mine_rng = np.random.RandomState(42)
        start = 0
        if load_ckpt is not None:
            start = load_ckpt(mine_rng)
            if start:
                # restore the already-recorded curve so the resumed run's
                # report is identical to an uninterrupted one
                suffix = "" if args.side == "both" else f"_{args.side}"
                prev = os.path.join(args.out, f"report{suffix}.json")
                if os.path.exists(prev):
                    with open(prev) as f:
                        curves.extend(json.load(f)[name][:start])
                print(f"[{name}] resuming at epoch {start}", flush=True)
        for epoch in range(start, args.epochs):
            cache_q = cache_fn(q_pts, q_m)
            cache_db = cache_fn(db_pts, db_m)
            losses = []
            order = order_per_epoch[epoch]
            for i in range(0, len(order) - B + 1, B):
                pts_all = np.zeros((2 * B + B * N_NEG, N_PTS, 4), np.float32)
                m_all = np.zeros((2 * B + B * N_NEG, N_PTS), np.float32)
                neg_mask = np.zeros((B, N_NEG), np.float32)
                got_any = False
                for bi, qi in enumerate(order[i:i + B]):
                    m = mine_batch(cache_q, cache_db, qi, pos_l, neg_l,
                                   mine_rng)
                    if m is None:
                        continue
                    p_idx, n_idx = m
                    got_any = True
                    pts_all[bi], m_all[bi] = q_pts[qi], q_m[qi]
                    pts_all[B + bi], m_all[B + bi] = db_pts[p_idx], db_m[p_idx]
                    for j, ni in enumerate(n_idx):
                        pts_all[2 * B + bi * N_NEG + j] = db_pts[ni]
                        m_all[2 * B + bi * N_NEG + j] = db_m[ni]
                        neg_mask[bi, j] = 1.0
                if not got_any:
                    continue
                losses.append(step_fn(pts_all, m_all, neg_mask))
            db_f = cache_fn(*data["db_v"])
            q_f = cache_fn(*data["q_v"])
            r = recalls(db_f, q_f, db_v[:, :2], q_v[:, :2])
            r["epoch"] = epoch
            r["loss"] = float(np.mean(losses)) if losses else float("nan")
            r["feat_std"] = float(db_f.std(0).mean())
            curves.append(r)
            epoch_end()
            if save_ckpt is not None:
                save_ckpt(epoch, mine_rng)
            dump(report)
            print(f"[{name}] epoch {epoch}: loss={r['loss']:.4f} "
                  f"r@1={r['r@1']:.3f} r@5={r['r@5']:.3f} "
                  f"r@10={r['r@10']:.3f} std={r['feat_std']:.4f}",
                  flush=True)
        print(f"[{name}] total {time.time() - t0:.0f}s", flush=True)
        return curves

    if args.side in ("both", "torch"):
        # per-epoch checkpointing: a ~9 min/epoch CPU run must survive the
        # driver process dying (mine_rng state saved so the resumed draws
        # are identical to an uninterrupted run)
        ckpt = os.path.join(args.out, "torch_ckpt.pt")

        def save_torch(epoch, mine_rng):
            torch.save({"epoch": epoch, "model": tmodel.state_dict(),
                        "opt": topt.state_dict(),
                        "sched": tsched.state_dict(),
                        "mine_rng": mine_rng.get_state()}, ckpt + ".tmp")
            os.replace(ckpt + ".tmp", ckpt)

        def load_torch(mine_rng):
            if not os.path.exists(ckpt):
                return 0
            st = torch.load(ckpt, weights_only=False)
            tmodel.load_state_dict(st["model"])
            topt.load_state_dict(st["opt"])
            tsched.load_state_dict(st["sched"])
            mine_rng.set_state(st["mine_rng"])
            return st["epoch"] + 1

        report["torch"] = run_side(
            "torch", torch_cache, torch_step, tsched.step,
            save_ckpt=save_torch, load_ckpt=load_torch)
    if args.side in ("both", "flax"):
        report["flax"] = run_side(
            "flax", lambda p, m: flax_cache(p, m), flax_step_adapter,
            lambda: None)

    out_path = dump(report)
    print(f"wrote {out_path}")
    for name in ("torch", "flax"):
        if report[name]:
            print(f"final recalls  {name}:",
                  {k: v for k, v in report[name][-1].items()
                   if k.startswith("r@")})


if __name__ == "__main__":
    main()
