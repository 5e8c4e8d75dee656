"""Map-scale descriptor-bank query latency: fp32 vs int8 (real TPU).

The flat-bank query is HBM-bandwidth-bound at map scale (the (N, D) read
dominates); int8 codes cut the traffic 4× and run the scoring matmul at the
MXU's doubled int8 rate. This measures the ms/query for both storage modes
at 1M rows (the "million-scan map" scale PARITY.md claims), with the same
marginal in-jit chaining as bench.py.

Usage: python tools/bench_bank.py [--n 1000000] [--dims 128,512]
"""

import argparse
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

from gloc3d_tpu.ops.topk import l2_topk, l2_topk_int8, quantize_rows


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def marginal(fn, *args, n1=6, n2=18, reps=3):
    def chain(n):
        @jax.jit
        def run(*a):
            def body(_, c):
                return fn(*a, c)

            # non-foldable chain coupling: scale by (1 + c·1e-30) so XLA
            # cannot hoist the body out of the loop
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--dims", default="128,512")
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--ivf", action="store_true",
                    help="also bench the IVF index (fp32 vs int8 cells)")
    ap.add_argument("--recall", action="store_true",
                    help="IVF recall-vs-nprobe sweep against exact flat "
                         "search (D=128 int8, 100 queries)")
    args = ap.parse_args()

    for d in (int(x) for x in args.dims.split(",")):
        rng = np.random.RandomState(0)
        bank = rng.randn(args.n, d).astype(np.float32)
        bank /= np.linalg.norm(bank, axis=1, keepdims=True)
        q = bank[123:124] + 0.02 * rng.randn(1, d).astype(np.float32)

        bank_d = jnp.asarray(bank)
        codes, scales, bsq = jax.jit(quantize_rows)(bank_d)
        codes, scales, bsq = (jnp.asarray(np.asarray(codes)),
                              jnp.asarray(np.asarray(scales)),
                              jnp.asarray(np.asarray(bsq)))
        q_d = jnp.asarray(q)

        def run32(qq, b, c):
            d2, idx = l2_topk(qq * (1.0 + c * 1e-30), b, args.k)
            return d2.sum() * 1e-6 + idx[0, 0] * 1e-9

        def run8(qq, bq, sc, bs, c):
            d2, idx = l2_topk_int8(
                qq * (1.0 + c * 1e-30), bq, sc, bs, args.k)
            return d2.sum() * 1e-6 + idx[0, 0] * 1e-9

        # correctness: both must return row 123 at rank 1
        jr32 = jax.jit(lambda qq, b: l2_topk(qq, b, args.k))
        jr8 = jax.jit(lambda qq, bq, sc, bs: l2_topk_int8(qq, bq, sc, bs,
                                                          args.k))
        _, i32 = jr32(q_d, bank_d)
        _, i8 = jr8(q_d, codes, scales, bsq)
        assert int(np.asarray(i32)[0, 0]) == 123, np.asarray(i32)[0]
        assert int(np.asarray(i8)[0, 0]) == 123, np.asarray(i8)[0]
        ov = len(set(np.asarray(i32)[0]) & set(np.asarray(i8)[0]))
        log(f"D={d}: rank-1 exact both; top-{args.k} overlap {ov}/{args.k}")

        ms32 = marginal(run32, q_d, bank_d)
        ms8 = marginal(run8, q_d, codes, scales, bsq)
        gb32 = args.n * d * 4 / 1e9
        gb8 = args.n * d / 1e9
        log(f"D={d} N={args.n}: fp32 {ms32:.2f} ms/query "
            f"({gb32/ms32*1000:.0f} GB/s), int8 {ms8:.2f} ms/query "
            f"({gb8/ms8*1000:.0f} GB/s), speedup {ms32/max(ms8,1e-9):.2f}x")

        if not args.ivf:
            continue

        # ---- IVF at the same scale: fp32 vs int8 cells -----------------
        from gloc3d_tpu.index.ivf import IVFBank, _ivf_query, _ivf_query_int8

        cells, cap, nprobe = 1024, 2048, 32
        for quant in ("none", "int8"):
            ivf = IVFBank(dim=d, num_cells=cells, cell_capacity=cap,
                          nprobe=nprobe, quantize=quant)
            t0 = time.time()
            ivf.train(bank[:65536], key=jax.random.PRNGKey(0), iters=10)
            t1 = time.time()
            ivf.add(bank)
            log(f"  IVF[{quant}] D={d}: train {t1-t0:.1f}s, "
                f"ingest {time.time()-t1:.1f}s, max cell "
                f"{int(ivf._sizes.max())}/{ivf.cell_capacity}")
            d2i, idxi = ivf.query(q, k=args.k)
            hit = int(idxi[0, 0]) == 123
            log(f"  IVF[{quant}] rank-1 {'exact' if hit else 'MISS'} "
                f"(nprobe={nprobe}/{cells})")
            # big tensors must be ARGUMENTS of the timed jit: a closure
            # constant embeds the GB-scale cells in the HLO and the relay's
            # remote-compile POST rejects it (HTTP 413)
            ids_d = jnp.asarray(ivf._ids.astype(np.int32))
            lim = jnp.int32(2**31 - 1)
            if quant == "int8":
                def runi(cc, ss, bb, ii, qq, c):
                    d2_, _ = _ivf_query_int8(
                        ivf.centroids, cc, ss, bb, ii,
                        qq * (1.0 + c * 1e-30), args.k, nprobe, lim)
                    return d2_.sum() * 1e-6

                ms = marginal(runi, jnp.asarray(ivf._cells),
                              jnp.asarray(ivf._scales),
                              jnp.asarray(ivf._bsq), ids_d, q_d)
            else:
                def runf(cc, bb, ii, qq, c):
                    d2_, _ = _ivf_query(
                        ivf.centroids, cc, bb, ii,
                        qq * (1.0 + c * 1e-30), args.k, nprobe, lim)
                    return d2_.sum() * 1e-6

                ms = marginal(runf, jnp.asarray(ivf._cells),
                              jnp.asarray(ivf._bsq), ids_d, q_d)
            log(f"  IVF[{quant}] D={d} N={args.n}: {ms:.2f} ms/query "
                f"(nprobe {nprobe} × cap {ivf.cell_capacity})")

            if not (args.recall and d == 128 and quant == "int8"):
                continue
            # ---- recall vs nprobe against exact flat search ------------
            # On an i.i.d.-gaussian bank the top-k set is degenerate (all
            # neighbors are near-ties at distance ~sqrt(2)), so overlap
            # says nothing about the index. Real descriptor banks are
            # CLUSTERED (revisited places); measure on a mixture bank
            # where the top-k are genuine near-duplicates.
            n_ctr = 4096
            ctrs = rng.randn(n_ctr, d).astype(np.float32)
            ctrs /= np.linalg.norm(ctrs, axis=1, keepdims=True)
            cb = (ctrs[rng.randint(0, n_ctr, args.n)]
                  + 0.12 * rng.randn(args.n, d).astype(np.float32))
            cb /= np.linalg.norm(cb, axis=1, keepdims=True)
            ivf_c = IVFBank(dim=d, num_cells=cells, cell_capacity=cap,
                            nprobe=nprobe, quantize="int8")
            ivf_c.train(cb[:65536], key=jax.random.PRNGKey(0), iters=10)
            ivf_c.add(cb)
            nq = 100
            qs = cb[rng.randint(0, args.n, nq)] + \
                0.05 * rng.randn(nq, d).astype(np.float32)
            cb_d = jnp.asarray(cb)
            _, idxx = jax.jit(lambda a, b: l2_topk(a, b, args.k))(
                jnp.asarray(qs), cb_d)
            idxx = np.asarray(idxx)
            for np_ in (4, 8, 16, 32, 64):
                _, idxi = ivf_c.query(qs, k=args.k, nprobe=np_)
                r1 = float(np.mean(idxi[:, 0] == idxx[:, 0]))
                ov = float(np.mean([
                    len(set(idxi[i]) & set(idxx[i])) / args.k
                    for i in range(nq)]))
                log(f"  IVF[int8] clustered bank, nprobe={np_:>2}: "
                    f"recall@1 {r1:.2f}, top-{args.k} overlap {ov:.2f} "
                    f"vs exact flat")


if __name__ == "__main__":
    main()
