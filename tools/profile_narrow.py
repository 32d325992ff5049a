#!/usr/bin/env python3
"""Measure the per-block top-m narrowed exact selection (VERDICT r3 item 8).

Two measurements at the FiQA bench shape (B=6656, R=57,640, k=50):

1. Selection-only: block_topk_from_max vs block_topk_narrow over a
   materialized (B, R) score matrix + precomputed block maxima (isolates
   the 18.2 ms final-top-k + 8.9 ms gather stages the narrowing targets).
2. End-to-end device step: fused_search_packed (pallas int8 head, exact)
   with narrow_m in {0, 4, 8, 16} — the committed target is
   device_step_ms < 30 with bit-identical packed output.

Usage: python tools/profile_narrow.py [--docs 57638] [--batch 6656]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, reps=6):
    out = fn()
    np.asarray(out).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    np.asarray(out).ravel()[:1]
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=57_638)
    ap.add_argument("--vocab", type=int, default=100_000)
    ap.add_argument("--batch", type=int, default=6656)
    ap.add_argument("--topk", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from osr_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from osr_tpu.index.builder import SparseIndexBuilder
    from osr_tpu.ops import bm25 as ops
    from osr_tpu.ops.topk import block_topk_from_max, block_topk_narrow
    from osr_tpu.testing import SyntheticDataGenerator

    dev = jax.devices()[0]
    B, K = args.batch, args.topk
    print(f"# device: {dev}  B={B} k={K}", flush=True)

    # ---- 1. selection-only ------------------------------------------------
    R = args.docs
    T = -(-R // 128)
    rng = np.random.default_rng(0)
    hs_np = rng.standard_normal((B, T * 128), dtype=np.float32) * 5.0
    hs_np[:, R:] = -np.inf
    bmax_np = hs_np.reshape(B, T, 128).max(axis=2)
    hs = jax.device_put(hs_np[:, :R], dev)
    bmax = jax.device_put(bmax_np, dev)
    jax.block_until_ready([hs, bmax])

    t_full = timeit(lambda: block_topk_from_max(hs, bmax, k=K)[0])
    print(f"selection full-width (k*128 cand): {t_full*1e3:7.2f} ms", flush=True)
    for m in (4, 8, 16):
        t_n = timeit(lambda: block_topk_narrow(hs, bmax, k=K, block_m=m)[0])
        fv, fr = block_topk_from_max(hs, bmax, k=K)
        nv, nr = block_topk_narrow(hs, bmax, k=K, block_m=m)
        ident = bool(
            np.array_equal(np.asarray(fv), np.asarray(nv))
            and np.array_equal(np.asarray(fr), np.asarray(nr))
        )
        print(
            f"selection narrow m={m:2d} (k*{m} cand): {t_n*1e3:7.2f} ms"
            f"  bit-identical={ident}",
            flush=True,
        )

    # ---- 2. end-to-end fused device step (pallas int8 head) ---------------
    corpus = SyntheticDataGenerator(seed=42).zipf_corpus(
        args.docs, args.vocab, avg_len=130, word_prefix="t", min_len=5
    )
    index = SparseIndexBuilder(method="bm25").build(corpus)
    lay = index.layout
    F = lay.head_terms
    from osr_tpu.ops.pallas.head import TILE_R_BM

    head_np, valid_np = lay.head, lay.valid
    pad_r = (-head_np.shape[0]) % TILE_R_BM
    if pad_r:
        head_np = np.pad(head_np, ((0, pad_r), (0, 0)))
        valid_np = np.pad(valid_np, (0, pad_r))
    rngq = np.random.default_rng(1)
    Q = 16
    # Unique ids per row: scatter_query_head's unique-indices contract —
    # duplicates make the scatter program-dependent and would break the
    # cross-program bit-identity comparison below.
    ids = np.stack(
        [rngq.choice(F, size=Q, replace=False) for _ in range(B)]
    ).astype(np.int32)
    w = rngq.random((B, Q)).astype(np.float32)
    head = jax.device_put(head_np, dev)
    scales = jax.device_put(lay.head_scales, dev)
    valid = jax.device_put(valid_np, dev)
    packed = jax.device_put(ops.pack_query_batch(ids, w), dev)
    empty = jax.device_put(np.zeros(0, np.int32), dev)
    jax.block_until_ready([head, scales, valid, packed, empty])
    backend = "pallas" if dev.platform == "tpu" else "xla"
    print(f"# R={head.shape[0]} F={F} head={lay.head_dtype} backend={backend}")

    base = None
    for m in (0, 4, 8, 16):
        def step(m=m):
            return ops.fused_search_packed(
                packed, empty, empty, head, scales, valid,
                head_terms=F, k=K, head_backend=backend, narrow_m=m,
            )[0]

        t = timeit(step)
        out = np.asarray(step())
        if base is None:
            base = out
            ident = True
        else:
            ident = bool(np.array_equal(out, base))
        print(
            f"fused exact step narrow_m={m:2d}: {t*1e3:7.2f} ms"
            f"  bit-identical={ident}",
            flush=True,
        )

    # ---- 3. extraction-kernel step (score matrix never in HBM) ------------
    interp = dev.platform != "tpu"
    for m in (4, 8, 16):
        def stepx(m=m):
            return ops.fused_search_extract(
                packed, head, scales, valid,
                head_terms=F, k=K, narrow_m=m, interpret=interp,
            )

        t = timeit(stepx)
        out = np.asarray(stepx())
        flag = float(out[0, -1])
        # Result-identical up to non-positive entries and tie ORDER
        # (extract mirrors the block-pruned path's block-rank tie order;
        # when R/128 <= 2k the baseline program is plain lax.top_k with
        # row-order ties). Compare positive (score, row) sets per query
        # after canonical (-score, row) sorting.
        kk = (out.shape[1] - 1) // 2

        def canon(s, r):
            order = np.lexsort((r, -s), axis=1)
            return (
                np.take_along_axis(s, order, axis=1),
                np.take_along_axis(r, order, axis=1),
            )

        bs, br = canon(base[:, :kk], base[:, kk:])
        xs, xr = canon(out[:, :kk], out[:, kk : 2 * kk])
        pos = bs > 0
        # Docs tied exactly AT the k-th value are interchangeable in any
        # exact top-k (membership among equal scores is arbitrary):
        # require identical positive scores, and identical rows strictly
        # above the boundary value.
        above = pos & (bs > bs[:, kk - 1 : kk])
        ident = bool(
            np.array_equal(xs[pos], bs[pos])
            and np.array_equal(xr[above], br[above])
        )
        print(
            f"fused EXTRACT step m={m:2d}: {t*1e3:7.2f} ms"
            f"  flag={flag:.0f}  positive-set-identical={ident}",
            flush=True,
        )


if __name__ == "__main__":
    main()
