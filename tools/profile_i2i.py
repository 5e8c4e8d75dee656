"""Per-block device-time profile of the i2i VGG16 forward (real TPU).

The i2i detect path (VGG16+NetVLAD-FC on 768² BEV probability images,
reference main.py:531-541) measures 4.6 ms B=1 / 3.5 ms/query B=8 — about
40 % MFU against the 361 GFLOP conv stack. This attributes the gap before
optimizing: each VGG block (and the VLAD pool) is timed in isolation with
marginal in-jit chaining, plus two formulation variants for the
low-channel-count early convs (the MXU pads 3→128 / 64→128 output lanes,
so conv0/block1 are the suspected under-utilizers):

  conv0_direct — 3→64 conv as lowered by XLA
  conv0_im2col — conv_general_dilated_patches (27 ch) + 1×1 conv
  block1_direct / block1_b4 — 64-ch block at B=1 vs B=4 (spatial-M packing)

Usage: python tools/profile_i2i.py  (TPU; one process)
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
from gloc3d_tpu.models import build_model


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


def conv(x, k, b):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16)
    return jax.nn.relu(y + b)


def pool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def main():
    rng = np.random.RandomState(0)

    def kb(ci, co):
        k = jnp.asarray(rng.randn(3, 3, ci, co).astype(np.float32) * 0.05,
                        jnp.bfloat16)
        b = jnp.asarray(rng.randn(co).astype(np.float32) * 0.05, jnp.bfloat16)
        return k, b

    x0 = jnp.asarray((rng.rand(1, 768, 768, 3) > 0.01).astype(np.float32))
    gflop = {}

    # ---- conv0 variants -------------------------------------------------
    k0, b0 = kb(3, 64)

    def conv0_direct(x, k, b, c):
        y = conv((x + c * 1e-30).astype(jnp.bfloat16), k, b)
        return y.astype(jnp.float32).sum() * 1e-9

    log(f"conv0 direct (3->64, 768^2):   "
        f"{marginal(conv0_direct, x0, k0, b0):.3f} ms  (2.0 GFLOP)")

    k0m = k0.reshape(27, 64)

    def conv0_im2col(x, km, b, c):
        p = jax.lax.conv_general_dilated_patches(
            (x + c * 1e-30).astype(jnp.bfloat16), (3, 3), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = jax.nn.relu(
            jax.lax.dot_general(p, km, (((3,), (0,)), ((), ())),
                                preferred_element_type=jnp.bfloat16) + b)
        return y.astype(jnp.float32).sum() * 1e-9

    log(f"conv0 im2col (patches+matmul): "
        f"{marginal(conv0_im2col, x0, k0m, b0):.3f} ms")

    # ---- per-block direct timings ---------------------------------------
    blocks = [
        ("block1 (2x64, 768^2)", 768, [(64, 64), (64, 64)], 89.1),
        ("block2 (128, 384^2)", 384, [(64, 128), (128, 128)], 65.2),
        ("block3 (256, 192^2)", 192, [(128, 256), (256, 256), (256, 256)],
         108.7),
        ("block4 (512, 96^2)", 96, [(256, 512), (512, 512), (512, 512)],
         108.7),
        ("block5 (512, 48^2)", 48, [(512, 512), (512, 512), (512, 512)],
         32.6),
    ]
    for name, s, chans, gf in blocks:
        ci0 = chans[0][0]
        xs = jnp.asarray(rng.randn(1, s, s, ci0).astype(np.float32),
                         jnp.bfloat16)
        kbs = [kb(ci, co) for ci, co in chans]

        def block(x, *kbflat):
            *kbf, cc = kbflat  # trailing chain scalar arrives positionally
            y = x * (1.0 + cc * 1e-30).astype(x.dtype)
            for i in range(0, len(kbf), 2):
                y = conv(y, kbf[i], kbf[i + 1])
            return y.astype(jnp.float32).sum() * 1e-9

        flat = [t for pair in kbs for t in pair]
        ms = marginal(block, xs, *flat)
        eff = gf / ms / 197.0 * 100.0 if ms > 0 else 0.0
        log(f"{name}: {ms:.3f} ms  ({gf:.0f} GFLOP, {eff:.0f}% peak)")
        gflop[name] = (ms, gf)

        if s == 768:  # block1 at B=4: does spatial batching lift 64-ch use?
            xs4 = jnp.concatenate([xs] * 4, axis=0)
            ms4 = marginal(block, xs4, *flat)
            log(f"block1 B=4: {ms4:.3f} ms = {ms4/4:.3f} ms/img "
                f"({gf*4/ms4/197.0*100:.0f}% peak)")

    # ---- pools (all four, bandwidth) ------------------------------------
    xp = jnp.asarray(rng.randn(1, 768, 768, 64).astype(np.float32),
                     jnp.bfloat16)

    def pools(x, c):
        y = pool(x * (1.0 + c * 1e-30).astype(x.dtype))   # 384, 64ch
        y = pool(jnp.tile(y, (1, 1, 1, 2)))               # 192, 128ch
        y = pool(jnp.tile(y, (1, 1, 1, 2)))               # 96, 256ch
        y = pool(jnp.tile(y, (1, 1, 1, 2)))               # 48, 512ch
        return y.astype(jnp.float32).sum() * 1e-9

    log(f"4 maxpools (with tiles):       {marginal(pools, xp):.3f} ms")

    # ---- full model (B=1), for cross-checking the sum -------------------
    cfg = PipelineConfig.i2i()
    model = build_model(cfg.model, cfg.voxel)
    params = jax.jit(model.init)(jax.random.PRNGKey(1), x0)

    def fwd(p, x, c):
        d = model.apply(p, x + c * 1e-30)
        return d.sum() * 1e-6

    log(f"full i2i forward (B=1):        {marginal(fwd, params, x0):.3f} ms")

    # encoder only vs pool attribution
    def enc(p, x, c):
        f = model.apply(p, x + c * 1e-30, method=model.encode)
        return f.sum() * 1e-9

    log(f"encoder only (13 convs):       {marginal(enc, params, x0):.3f} ms")


if __name__ == "__main__":
    main()
