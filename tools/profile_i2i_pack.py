"""Width-pair-packed block1 formulation: verify + profile (TPU).

profile_i2i.py attributed half the i2i forward (2.03 of 4.06 ms) to block1 —
the two 64-channel 3×3 convs at 768² run at 22% of bf16 peak because 64
channels half-fills the MXU's 128 lanes on both the input and output side.

The packed formulation stores adjacent COLUMN PAIRS in the channel dim:
(B, 768, 768, 64) → (B, 768, 384, 128). A canonical 3×3 conv over 64
channels becomes a 3×3 conv over 128 packed channels whose kernel taps are
a sparse rearrangement of the canonical kernel (output half b ∈ {0, 1} at
packed column j reconstructs original column 2j+b from original columns
2j+b-1 .. 2j+b+1, which live in packed columns j-1..j+1). That doubles the
MACs (half the packed-kernel taps are structural zeros) but fills all 128
lanes — a win whenever direct utilization is below ~45%.

conv0 (3→64) emits the packed layout directly (6 packed input channels),
and pool1's width-max is a free max over channel halves, so the packed
segment runs conv0 → conv1 → conv2 → pool1 without ever materializing the
half-empty 64-channel layout.

Usage: python tools/profile_i2i_pack.py   (TPU; one process)
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


def marginal(fn, *args, n1=10, n2=40, reps=5):
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


def conv(x, k, b=None):
    y = jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16)
    if b is not None:
        y = y + b.astype(y.dtype)
    return jax.nn.relu(y)


# ---------------------------------------------------------------------------
# packing transforms (pure kernel rearrangements; see gloc3d_tpu/models/vgg)
# ---------------------------------------------------------------------------

def pack_kernel_cc(k):
    """(3, 3, C, O) canonical → (3, 3, 2C, 2O) width-pair-packed kernel.

    Packed output half b at packed col j = original col 2j+b, built from
    original cols 2j+b-1+kw (kw ∈ 0..2). Original col m lives in packed col
    m // 2, half m % 2. Relative to packed col j the tap for original col
    2j+d (d = b-1+kw ∈ {-1..2}) sits at packed offset (d >> 1 when d>=0 else
    -1), i.e. packed kw' = 1 + (d // 2), input half = d % 2.
    """
    kh, kw, c, o = k.shape
    kp = np.zeros((kh, 3, 2 * c, 2 * o), k.dtype)
    for b in range(2):
        for t in range(kw):
            d = b - 1 + t            # original column offset from 2j
            pj = 1 + (d // 2)        # packed kernel column (floor div: -1→0)
            half = d % 2
            kp[:, pj, half * c:(half + 1) * c, b * o:(b + 1) * o] = k[:, t]
    return kp


def pack_bias(b):
    return np.concatenate([b, b])


def pack_img(x):
    """(B, H, W, C) → (B, H, W/2, 2C): column pairs into channels."""
    bsz, h, w, c = x.shape
    return x.reshape(bsz, h, w // 2, 2 * c)


def unpack_img(x):
    bsz, h, wp, c2 = x.shape
    return x.reshape(bsz, h, wp * 2, c2 // 2)


def pool1_packed(x):
    """2×2/2 max-pool of the UNPACKED image, computed on the packed layout:
    width-max = max of channel halves; height-max = row-pair max. Output is
    the canonical (B, H/2, W/2, C) layout (64 ch: fine from here on — block2+
    run at 128+ channels)."""
    bsz, h, wp, c2 = x.shape
    c = c2 // 2
    x = jnp.maximum(x[..., :c], x[..., c:])          # width pairs
    x = x.reshape(bsz, h // 2, 2, wp, c).max(axis=2)  # height pairs
    return x


def main():
    rng = np.random.RandomState(0)

    def kb(ci, co, scale=0.05):
        k = rng.randn(3, 3, ci, co).astype(np.float32) * scale
        b = rng.randn(co).astype(np.float32) * scale
        return k, b

    k0, b0 = kb(3, 64)
    k1, b1 = kb(64, 64)
    k2, b2 = kb(64, 64)
    x0 = (rng.rand(1, 768, 768, 3) > 0.01).astype(np.float32)

    # ---- numerical check (fp32 on a small image) -------------------------
    xs = x0[:, :64, :64].astype(np.float32)

    def seg_direct(x, k0, b0, k1, b1, k2, b2):
        y = conv(x.astype(jnp.bfloat16), k0, b0)
        y = conv(y, k1, b1)
        y = conv(y, k2, b2)
        # pool1
        return jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

    def seg_packed(xp, k0p, b0p, k1p, b1p, k2p, b2p):
        y = conv(xp.astype(jnp.bfloat16), k0p, b0p)
        y = conv(y, k1p, b1p)
        y = conv(y, k2p, b2p)
        return pool1_packed(y)

    args_p = [jnp.asarray(a) for a in
              (pack_img(xs), pack_kernel_cc(k0), pack_bias(b0),
               pack_kernel_cc(k1), pack_bias(b1),
               pack_kernel_cc(k2), pack_bias(b2))]
    args_d = [jnp.asarray(a) for a in (xs, k0, b0, k1, b1, k2, b2)]
    rd = np.asarray(jax.jit(seg_direct)(*args_d), np.float32)
    rp = np.asarray(jax.jit(seg_packed)(*args_p), np.float32)
    err = np.abs(rd - rp).max() / (np.abs(rd).max() + 1e-9)
    log(f"packed segment vs direct (64² check): rel err {err:.2e}")
    assert err < 2e-2, "packed formulation mismatch"  # bf16 tap-order noise

    # ---- timings at full size --------------------------------------------
    x0d = jnp.asarray(x0)
    x0p = jnp.asarray(pack_img(x0))
    kd = [jnp.asarray(a, jnp.bfloat16) for a in (k0, b0, k1, b1, k2, b2)]
    kp = [jnp.asarray(a, jnp.bfloat16) for a in
          (pack_kernel_cc(k0), pack_bias(b0), pack_kernel_cc(k1),
           pack_bias(b1), pack_kernel_cc(k2), pack_bias(b2))]

    def t_direct(x, k0, b0, k1, b1, k2, b2, c):
        y = seg_direct(x + c * 1e-30, k0, b0, k1, b1, k2, b2)
        return y.astype(jnp.float32).sum() * 1e-9

    def t_packed(x, k0, b0, k1, b1, k2, b2, c):
        y = seg_packed(x + c * 1e-30, k0, b0, k1, b1, k2, b2)
        return y.astype(jnp.float32).sum() * 1e-9

    ms_d = marginal(t_direct, x0d, *kd)
    log(f"segment direct  (conv0+block1+pool1, 768²): {ms_d:.3f} ms "
        f"(91 GFLOP)")
    ms_p = marginal(t_packed, x0p, *kp)
    log(f"segment packed  (128-lane, 2x MACs):        {ms_p:.3f} ms "
        f"(180 GFLOP)  -> {ms_d/ms_p:.2f}x")

    # packed conv1 alone (the pure 64-ch conv comparison)
    y64 = jnp.asarray(rng.randn(1, 768, 768, 64).astype(np.float32),
                      jnp.bfloat16)
    y64p = jnp.asarray(pack_img(np.asarray(y64, np.float32)), jnp.bfloat16)

    def t_c1d(x, k, b, c):
        return conv((x + c * 1e-30).astype(jnp.bfloat16), k, b).astype(
            jnp.float32).sum() * 1e-9

    ms1d = marginal(t_c1d, y64, kd[2], kd[3])
    ms1p = marginal(t_c1d, y64p, kp[2], kp[3])
    log(f"conv 64ch direct: {ms1d:.3f} ms (44.5 GF, "
        f"{44.5/ms1d/197:.0%} peak) | packed: {ms1p:.3f} ms (89 GF, "
        f"{89.1/ms1p/197:.0%} peak) -> {ms1d/ms1p:.2f}x")


if __name__ == "__main__":
    main()
