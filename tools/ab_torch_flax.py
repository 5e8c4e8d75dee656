#!/usr/bin/env python
"""Equal-conditions A/B: reference torch VGG+NetVLAD-FC vs the Flax model.

Addresses the recall-parity question without real datasets: both frameworks
train the SAME architecture from the SAME initial weights on the SAME
synthetic-world BEV images with the SAME hyperparameters and mining
procedure; only the framework differs. Per-epoch recall@{1,5,10,20} curves
for both sides are written to a JSON report.

Reference semantics reproduced here (cited):
  - model: VGG-style conv encoder (torchvision vgg16 features[:-2] topology,
    width-reduced for CPU-torch feasibility) + NetVLAD-FC imported verbatim
    from /root/reference/model/netvlad_fc.py.
  - cluster init: k-means centroids + init_params alpha fit
    (netvlad_fc.py:44-55, main.py:354-401) — same centroids fed to both.
  - mining: cache-refresh hard-negative mining (i2i_util.py:271-343):
    nontrivial positives < 10 m, negatives > 20 m, margin-violating negative
    selection, nNeg=10.
  - loss: TripletMarginLoss(margin=sqrt(0.1), p=2, reduction='sum')
    normalized by the batch negative count (main.py:139-158).
  - optimizer: SGD(momentum=0.9, weight_decay=1e-3) + StepLR(5, 0.5)
    (main.py:630-645).
  - eval: recall@{1,5,10,20} against radius-20 m UTM positives
    (main.py:276-352).

The torch side imports /root/reference/model/netvlad_fc.py at run time (the
same already-permitted pattern as tests/test_torch_parity.py); nothing is
copied. Run:  python tools/ab_torch_flax.py [--epochs 20] [--out /tmp/ab]
"""

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

REF = "/root/reference"

# width-reduced VGG topology: (channels, pool_before); ReLU after every conv
# except the last (features[:-2] drops the final ReLU+pool, main.py:531-541)
CFGS = ((16, False), (16, False), (32, True), (32, False),
        (64, True), (64, False))
K_CLUSTERS = 16
DIM = 64
IMG = 128
MARGIN = math.sqrt(0.1)
# lr: the reference's 1e-4 assumes a pretrained encoder; from scratch on
# synthetic BEV images 1e-3 is the trainable regime (1e-2 collapses the
# embedding on BOTH frameworks — measured; see RESULTS.md).
LR0, LR_STEP, LR_GAMMA = 1e-3, 5, 0.5
WD, MOMENTUM = 1e-3, 0.9
N_NEG, N_NEG_SAMPLE = 10, 64
BATCH_Q = 2
POS_DIST = 20.0      # posDistThr (kitti_i2i.py:171)
NONTRIV_POS = 10.0   # sqrt(nonTrivPosDistSqThr=100)
NEG_DIST = 20.0


# ---------------------------------------------------------------- data

def make_world(seed, n_walls=200, extent=260.0):
    rng = np.random.RandomState(seed)
    walls = []
    for _ in range(n_walls):
        x0, y0 = rng.uniform(-extent, extent, 2)
        ang = rng.uniform(0, np.pi)
        ts = rng.uniform(0, rng.uniform(4, 12), 200)
        walls.append(np.stack([x0 + np.cos(ang) * ts, y0 + np.sin(ang) * ts,
                               rng.uniform(0, 3, 200)], 1))
    return np.concatenate(walls).astype(np.float32)


def scan_at(world, x, y, yaw, seed, n_pts=4096):
    r = np.random.RandomState(seed)
    rel = world[:, :2] - np.array([x, y])
    pts = world[np.linalg.norm(rel, axis=1) < 35]
    c, s = np.cos(-yaw), np.sin(-yaw)
    px, py = pts[:, 0] - x, pts[:, 1] - y
    out = np.stack([c * px - s * py, s * px + c * py, pts[:, 2]], 1)
    out = out + r.normal(0, 0.03, out.shape)
    pad = np.zeros((n_pts, 3), np.float32)
    m = np.zeros(n_pts, np.float32)
    k = min(len(out), n_pts)
    sel = r.choice(len(out), k, replace=len(out) < n_pts)
    pad[:k] = out[sel]
    m[:k] = 1.0
    return pad, m


def build_split(world, rng, n_db, n_q, x_range, q_yaw=0.3):
    """db on a grid walk, queries near random db poses (<10 m, small yaw).

    ``q_yaw`` scales the query yaw jitter around the revisited db pose
    (default 0.3 rad preserves the round-3/4 splits draw-for-draw; the
    high-signal world uses a tighter same-heading revisit, the loop-closure
    regime where the yaw-variant s2s encoder can actually match places)."""
    xs = np.linspace(*x_range, n_db)
    ys = rng.uniform(-40, 40, n_db)
    yaw_db = rng.uniform(-0.3, 0.3, n_db)
    db = np.stack([xs, ys, yaw_db], 1)
    qi = rng.choice(n_db, n_q, replace=False)
    q = db[qi].copy()
    q[:, :2] += rng.uniform(-6, 6, (n_q, 2))
    q[:, 2] += q_yaw * rng.uniform(-1.0, 1.0, n_q)
    return db, q


def render_images(world, poses, seed0):
    """Scans → (N, IMG, IMG, 3) float32 BEV probability images in [0, 1]."""
    import jax
    import jax.numpy as jnp

    from gloc3d_tpu.config import BEVConfig
    from gloc3d_tpu.ops.bev import scan_to_bev

    cfg = BEVConfig(image_size=IMG, max_points=4096)

    @jax.jit
    def render(pts, m):
        return scan_to_bev(pts, m, cfg).image

    out = np.empty((len(poses), IMG, IMG, 3), np.float32)
    for i, (x, y, yaw) in enumerate(poses):
        pts, m = scan_at(world, x, y, yaw, seed0 + i)
        img = np.asarray(render(jnp.asarray(pts), jnp.asarray(m)))
        out[i] = img[..., None].repeat(3, -1)
    return out


# ---------------------------------------------------------------- models

def build_torch_model(seed):
    import torch
    import torch.nn as tnn

    sys.path.insert(0, REF)
    try:
        from model.netvlad_fc import NetVLAD as RefNetVLAD
    finally:
        sys.path.pop(0)

    torch.manual_seed(seed)
    layers = []
    in_ch = 3
    for i, (ch, pool) in enumerate(CFGS):
        if pool:
            layers.append(tnn.MaxPool2d(2, 2))
        layers.append(tnn.Conv2d(in_ch, ch, 3, padding=1))
        if i < len(CFGS) - 1:
            layers.append(tnn.ReLU(inplace=True))
        in_ch = ch

    class VGGVLAD(tnn.Module):  # main.py:519-618 composition
        def __init__(self):
            super().__init__()
            self.encoder = tnn.Sequential(*layers)
            self.pool = RefNetVLAD(num_clusters=K_CLUSTERS, dim=DIM,
                                   vladv2=False)

        def forward(self, x):
            return self.pool(self.encoder(x))

    return VGGVLAD()


def build_flax_model():
    import flax.linen as nn
    import jax.numpy as jnp

    from gloc3d_tpu.models import NetVLAD

    class SmallVGGVLAD(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i, (ch, pool) in enumerate(CFGS):
                if pool:
                    x = nn.max_pool(x, (2, 2), strides=(2, 2))
                x = nn.Conv(ch, (3, 3), padding="SAME",
                            dtype=jnp.float32, name=f"conv{i}")(x)
                if i < len(CFGS) - 1:
                    x = nn.relu(x)
            return NetVLAD(num_clusters=K_CLUSTERS, dim=DIM, use_fc=True,
                           vladv2=False, compute_dtype=jnp.float32,
                           name="pool")(x)

    return SmallVGGVLAD()


def transplant(tmodel):
    """Torch state → flax params dict (same math, OIHW→HWIO kernels)."""
    import jax.numpy as jnp

    params = {}
    convs = [m for m in tmodel.encoder if m.__class__.__name__ == "Conv2d"]
    for i, conv in enumerate(convs):
        params[f"conv{i}"] = {
            "kernel": jnp.asarray(
                conv.weight.detach().numpy().transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(conv.bias.detach().numpy()),
        }
    pool = tmodel.pool
    params["pool"] = {
        "conv_weight": jnp.asarray(
            pool.conv.weight.detach().numpy()[:, :, 0, 0].T),
        "centroids": jnp.asarray(pool.centroids.detach().numpy()),
        "hidden1_weights": jnp.asarray(
            pool.hidden1_weights.detach().numpy()),
    }
    return params


# ---------------------------------------------------------------- shared logic

def kmeans(descs, k, iters=100, seed=0):
    """faiss.Kmeans replacement (main.py:394-397): plain Lloyd's, numpy."""
    rng = np.random.RandomState(seed)
    cent = descs[rng.choice(len(descs), k, replace=False)].copy()
    for _ in range(iters):
        d = ((descs[:, None] - cent[None]) ** 2).sum(-1)
        a = d.argmin(1)
        for j in range(k):
            sel = descs[a == j]
            if len(sel):
                cent[j] = sel.mean(0)
    return cent.astype(np.float32)


def mine_batch(cache_q, cache_db, qi, pos_lists, neg_lists, rng):
    """i2i_util.py:271-343 semantics; returns (pos_idx, neg_idx list) or None."""
    pos = pos_lists[qi]
    if not len(pos):
        return None
    d_pos = np.linalg.norm(cache_db[pos] - cache_q[qi], axis=1)
    best = d_pos.argmin()
    p_idx, dp = pos[best], d_pos[best]
    negs = neg_lists[qi]
    sample = rng.choice(negs, min(N_NEG_SAMPLE, len(negs)), replace=False)
    d_neg = np.linalg.norm(cache_db[sample] - cache_q[qi], axis=1)
    order = d_neg.argsort()[: N_NEG * 10]
    viol = [sample[j] for j in order if d_neg[j] < dp + MARGIN]
    if not viol:
        return None
    return p_idx, viol[:N_NEG]


def recalls(db_feat, q_feat, utm_db, utm_q, ns=(1, 5, 10, 20)):
    d = ((q_feat[:, None] - db_feat[None]) ** 2).sum(-1)
    pred = d.argsort(1)[:, : max(ns)]
    gt_d = np.linalg.norm(utm_q[:, None] - utm_db[None], axis=-1)
    out = {}
    for n in ns:
        hit = 0
        for i in range(len(q_feat)):
            gt = np.nonzero(gt_d[i] <= POS_DIST)[0]
            hit += bool(len(np.intersect1d(pred[i, :n], gt)))
        out[f"r@{n}"] = hit / len(q_feat)
    return out


# ---------------------------------------------------------------- main

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--n-db", type=int, default=96)
    ap.add_argument("--n-q", type=int, default=48)
    ap.add_argument("--n-db-val", type=int, default=64)
    ap.add_argument("--n-q-val", type=int, default=32)
    ap.add_argument("--freeze-below", type=int, default=None,
                    help="freeze conv layers with index < N on BOTH sides "
                    "(the reference's pretrained-VGG regime freezes below "
                    "conv5 and trains conv5 + NetVLAD-FC, main.py:593-610; "
                    "with no downloadable weights the approximable variant "
                    "is a shared frozen RANDOM encoder + the same "
                    "trainable tail)")
    ap.add_argument("--lr", type=float, default=None,
                    help="override LR0 (the freeze regime uses the "
                    "reference's 1e-4, main.py:630)")
    ap.add_argument("--out", default="/tmp/ab_torch_flax")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    global LR0
    if args.lr is not None:
        LR0 = args.lr

    import torch
    import torch.nn as tnn

    import jax
    import jax.numpy as jnp
    import optax

    rng = np.random.RandomState(0)
    world = make_world(7)
    # train split on the west half of the world, val on the east half
    db_t, q_t = build_split(world, rng, args.n_db, args.n_q, (-220, -20))
    db_v, q_v = build_split(world, rng, args.n_db_val, args.n_q_val,
                            (20, 220))

    print("rendering BEV images...", flush=True)
    # inverted contrast (walls=1, free=0): an untrained encoder on the raw
    # 96%-white probability images produces collapsed descriptors (feature
    # std ~3e-4) on BOTH frameworks, freezing SGD; inversion makes the
    # activations sparse and training move. Applied identically to both.
    imgs = {
        "db_t": 1.0 - render_images(world, db_t, 100),
        "q_t": 1.0 - render_images(world, q_t, 10_000),
        "db_v": 1.0 - render_images(world, db_v, 20_000),
        "q_v": 1.0 - render_images(world, q_v, 30_000),
    }

    # ---- identical initialization
    tmodel = build_torch_model(seed=0)
    fmodel = build_flax_model()
    fparams = transplant(tmodel)

    x0 = imgs["db_t"][:2]
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x0.transpose(0, 3, 1, 2))).numpy()
    fwd = jax.jit(lambda p, x: fmodel.apply({"params": p}, x))
    got = np.asarray(fwd(fparams, jnp.asarray(x0)))
    init_diff = float(np.abs(got - want).max())
    print(f"init forward parity: max|Δ| = {init_diff:.2e}")
    assert init_diff < 1e-3, "transplanted models disagree at init"

    # ---- shared cluster init (same centroids to both sides)
    def enc_feats_torch(x):
        with torch.no_grad():
            f = tmodel.encoder(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        return f.numpy()

    samp = enc_feats_torch(imgs["db_t"][:32])  # (B, C, H, W)
    descs = samp.transpose(0, 2, 3, 1).reshape(-1, DIM)
    descs = descs[rng.choice(len(descs), 4096, replace=False)]
    cents = kmeans(descs, K_CLUSTERS, iters=50)

    tmodel.pool.init_params(cents.copy(), descs.copy())
    from gloc3d_tpu.models import init_netvlad_params
    fparams = init_netvlad_params(fparams, cents, descs,
                                  vladv2=False, path=("pool",))
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x0.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(fwd(fparams, jnp.asarray(x0)))
    clus_diff = float(np.abs(got - want).max())
    print(f"post-cluster-init parity: max|Δ| = {clus_diff:.2e}")

    # ---- ground-truth positive / negative index lists (shared)
    def gt_lists(utm_q, utm_db):
        d = np.linalg.norm(utm_q[:, None] - utm_db[None], axis=-1)
        pos = [np.nonzero(d[i] < NONTRIV_POS)[0] for i in range(len(utm_q))]
        neg = [np.nonzero(d[i] > NEG_DIST)[0] for i in range(len(utm_q))]
        return pos, neg

    pos_l, neg_l = gt_lists(q_t[:, :2], db_t[:, :2])

    # ---- freeze regime (main.py:593-610: requires_grad=False below conv5;
    # torch SGD skips grad-less params entirely, so the flax side masks the
    # FINAL updates to zero for the same params — both sides hold frozen
    # weights exactly constant)
    frozen = ({f"conv{i}" for i in range(args.freeze_below)}
              if args.freeze_below else set())
    if frozen:
        convs_t = [m for m in tmodel.encoder
                   if m.__class__.__name__ == "Conv2d"]
        for i, conv in enumerate(convs_t):
            if i < args.freeze_below:
                for p in conv.parameters():
                    p.requires_grad_(False)
        print(f"freeze regime: conv0..conv{args.freeze_below - 1} frozen, "
              f"training conv{args.freeze_below}+ and NetVLAD-FC at lr "
              f"{LR0}", flush=True)

    # ---- torch training step
    topt = torch.optim.SGD(
        [p for p in tmodel.parameters() if p.requires_grad],
        lr=LR0, momentum=MOMENTUM, weight_decay=WD)
    tsched = torch.optim.lr_scheduler.StepLR(topt, LR_STEP, LR_GAMMA)
    tcrit = tnn.TripletMarginLoss(margin=MARGIN, p=2, reduction="sum")

    def torch_step(q, p, negs_flat, counts):
        tmodel.train()
        topt.zero_grad()
        xq = tmodel(torch.from_numpy(q.transpose(0, 3, 1, 2)))
        xp = tmodel(torch.from_numpy(p.transpose(0, 3, 1, 2)))
        xn = tmodel(torch.from_numpy(negs_flat.transpose(0, 3, 1, 2)))
        loss = 0.0
        off = 0
        for b, c in enumerate(counts):
            for j in range(c):
                loss = loss + tcrit(xq[b:b+1], xp[b:b+1], xn[off+j:off+j+1])
            off += c
        loss = loss / max(sum(counts), 1)
        loss.backward()
        topt.step()
        return float(loss.detach())

    def torch_cache(x, bs=16):
        tmodel.eval()
        outs = []
        with torch.no_grad():
            for i in range(0, len(x), bs):
                outs.append(
                    tmodel(torch.from_numpy(
                        x[i:i+bs].transpose(0, 3, 1, 2))).numpy())
        return np.concatenate(outs)

    # ---- flax training step (identical optimizer chain: torch SGD =
    # grad + wd·w → momentum trace → −lr)
    steps_per_epoch = max(len(q_t) // BATCH_Q, 1)
    lr_sched = optax.piecewise_constant_schedule(
        LR0, {e * steps_per_epoch: LR_GAMMA
              for e in range(LR_STEP, args.epochs + 1, LR_STEP)})
    fopt = optax.chain(
        optax.add_decayed_weights(WD),
        optax.trace(decay=MOMENTUM),
        optax.scale_by_schedule(lambda c: -lr_sched(c)),
    )
    fstate = fopt.init(fparams)

    from gloc3d_tpu.models.losses import training_triplet_loss

    @jax.jit
    def flax_step(params, state, q, p, negs, neg_mask):
        """Static shapes: q/p (B,...), negs (B, N_NEG, ...), mask (B, N_NEG).

        training_triplet_loss computes Σ_valid max(‖q−p‖−‖q−n‖+margin, 0),
        the same masked sum as the per-triplet TripletMarginLoss loop
        (main.py:152-158); normalized by the valid-neg count like main.py.
        """
        def loss_fn(pp):
            xq = fmodel.apply({"params": pp}, q)
            xp = fmodel.apply({"params": pp}, p)
            b, nn_, = negs.shape[:2]
            xn = fmodel.apply(
                {"params": pp}, negs.reshape((b * nn_,) + negs.shape[2:])
            ).reshape(b, nn_, -1)
            # training_triplet_loss already normalizes by the valid-neg count
            return training_triplet_loss(xq, xp, xn, neg_mask, MARGIN)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, state = fopt.update(grads, state, params)
        if frozen:  # zero the frozen layers' final updates (= torch skip)
            upd = {k: (jax.tree_util.tree_map(jnp.zeros_like, v)
                       if k in frozen else v)
                   for k, v in upd.items()}
        params = optax.apply_updates(params, upd)
        return params, state, loss

    @jax.jit
    def flax_fwd_batch(params, x):
        return fmodel.apply({"params": params}, x)

    def flax_cache(params, x, bs=16):
        outs = []
        n = len(x)
        pad = (-n) % bs
        xp = np.concatenate([x, np.repeat(x[-1:], pad, 0)]) if pad else x
        for i in range(0, len(xp), bs):
            outs.append(np.asarray(flax_fwd_batch(params, jnp.asarray(xp[i:i+bs]))))
        return np.concatenate(outs)[:n]

    # ---- training loops (same schedule of query batches; mining is
    # framework-specific because it uses each side's own feature cache)
    report = {"init_forward_max_abs_diff": init_diff,
              "post_cluster_init_max_abs_diff": clus_diff,
              "config": {"cfgs": list(CFGS), "k": K_CLUSTERS, "dim": DIM,
                         "img": IMG, "lr0": LR0, "margin": MARGIN,
                         "epochs": args.epochs,
                         "n_db": args.n_db, "n_q": args.n_q,
                         "n_db_val": args.n_db_val, "n_q_val": args.n_q_val,
                         "freeze_below": args.freeze_below},
              "torch": [], "flax": []}

    order_per_epoch = [np.random.RandomState(1000 + e).permutation(len(q_t))
                       for e in range(args.epochs)]

    def run_side(name, cache_fn, step_fn):
        t0 = time.time()
        curves = []
        mine_rng = np.random.RandomState(42)
        for epoch in range(args.epochs):
            cache_q = cache_fn(imgs["q_t"])
            cache_db = cache_fn(imgs["db_t"])
            order = order_per_epoch[epoch]
            losses = []
            for i in range(0, len(order) - BATCH_Q + 1, BATCH_Q):
                qs, ps, ns, counts = [], [], [], []
                for qi in order[i:i + BATCH_Q]:
                    m = mine_batch(cache_q, cache_db, qi, pos_l, neg_l,
                                   mine_rng)
                    if m is None:
                        continue
                    p_idx, n_idx = m
                    qs.append(qi)
                    ps.append(p_idx)
                    ns.extend(n_idx)
                    counts.append(len(n_idx))
                if not qs:
                    continue
                q_im = imgs["q_t"][qs]
                p_im = imgs["db_t"][ps]
                n_im = imgs["db_t"][ns]
                losses.append(step_fn(q_im, p_im, n_im, counts))
            db_f = cache_fn(imgs["db_v"])
            q_f = cache_fn(imgs["q_v"])
            r = recalls(db_f, q_f, db_v[:, :2], q_v[:, :2])
            r["epoch"] = epoch
            r["loss"] = float(np.mean(losses)) if losses else float("nan")
            r["feat_std"] = float(db_f.std(0).mean())  # collapse monitor
            curves.append(r)
            print(f"[{name}] epoch {epoch}: loss={r['loss']:.4f} "
                  f"r@1={r['r@1']:.3f} r@5={r['r@5']:.3f} "
                  f"r@10={r['r@10']:.3f}", flush=True)
        print(f"[{name}] total {time.time() - t0:.0f}s")
        return curves

    # torch side: counts vary per batch → plain torch_step signature
    report["torch"] = run_side("torch", torch_cache, torch_step)

    # flax side: pad to static (BATCH_Q, N_NEG) shapes so the jitted step
    # compiles exactly once; padded rows carry a zero neg_mask.
    fp = {"params": fparams, "state": fstate}

    def flax_step_adapter(q_im, p_im, n_im, counts):
        b = BATCH_Q
        q = np.zeros((b,) + q_im.shape[1:], np.float32)
        p = np.zeros_like(q)
        negs = np.zeros((b, N_NEG) + q_im.shape[1:], np.float32)
        mask = np.zeros((b, N_NEG), np.float32)
        off = 0
        for i, c in enumerate(counts):
            q[i], p[i] = q_im[i], p_im[i]
            negs[i, :c] = n_im[off:off + c]
            mask[i, :c] = 1.0
            off += c
        pr, st, loss = flax_step(fp["params"], fp["state"], jnp.asarray(q),
                                 jnp.asarray(p), jnp.asarray(negs),
                                 jnp.asarray(mask))
        fp["params"], fp["state"] = pr, st
        return float(loss)

    report["flax"] = run_side(
        "flax", lambda x: flax_cache(fp["params"], x), flax_step_adapter)

    out_path = os.path.join(args.out, "report.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out_path}")

    tb = report["torch"][-1]
    fb = report["flax"][-1]
    print("final recalls  torch:", {k: v for k, v in tb.items() if k.startswith("r@")})
    print("final recalls  flax :", {k: v for k, v in fb.items() if k.startswith("r@")})


if __name__ == "__main__":
    main()
