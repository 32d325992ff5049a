#!/usr/bin/env python3
"""Decompose the Pallas-blockmax exact device step into stages on the real
TPU: which of (matmul+score write, blockmax top-k, block gather, final
top-k) actually costs what at FiQA scale. Informs the round-3 fused-top-k
kernel design (VERDICT r2 item 1).

Usage: python tools/profile_fused.py [--docs 57638] [--batch 6656]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, reps=4):
    np.asarray(jax_tree_leaf(fn()))  # compile/warm + fetch
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn()
    np.asarray(jax_tree_leaf(out))
    return (time.perf_counter() - t0) / reps


def jax_tree_leaf(x):
    while isinstance(x, (tuple, list)):
        x = x[0]
    return x


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=57_638)
    ap.add_argument("--batch", type=int, default=6656)
    ap.add_argument("--topk", type=int, default=50)
    ap.add_argument("--f", type=int, default=2048)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/osr_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from osr_tpu.ops.pallas.head import (
        BLOCK_COLS,
        TILE_R_BM,
        head_scores_blockmax_pallas,
    )

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    rng = np.random.RandomState(0)
    r = ((args.docs + TILE_R_BM - 1) // TILE_R_BM) * TILE_R_BM
    b = ((args.batch + 127) // 128) * 128
    f = args.f
    k = args.topk
    g = r // BLOCK_COLS

    head = jax.device_put(
        rng.randint(-127, 128, size=(r, f), dtype=np.int8), dev
    )
    # ~11 nonzero head terms per query, bf16-ish weights
    q = np.zeros((b, f), dtype=np.float32)
    for i in range(b):
        idx = rng.choice(f, size=11, replace=False)
        q[i, idx] = rng.rand(11) * 4
    q = jax.device_put(q.astype(jnp.bfloat16).astype(np.float32), dev).astype(
        jnp.bfloat16
    )
    valid = jax.device_put(
        np.ones((1, r), dtype=np.float32), dev
    )

    # Stage A: fused matmul + blockmax kernel (writes (B,R) f32 + (G,B)).
    @jax.jit
    def stage_a(q, head, valid):
        hs, bmax = head_scores_blockmax_pallas(q, head, valid)
        return hs[:1, :8], bmax[:1, :8]

    # Stage B: A + top-k over block maxima.
    @jax.jit
    def stage_b(q, head, valid):
        hs, bmax = head_scores_blockmax_pallas(q, head, valid)
        nb = min(k, g)
        top_max, top_blocks = lax.top_k(bmax.T, nb)  # (B, nb)
        return hs[:1, :8], top_blocks[:1, :8]

    # Stage C: B + contiguous block gather.
    @jax.jit
    def stage_c(q, head, valid):
        hs, bmax = head_scores_blockmax_pallas(q, head, valid)
        nb = min(k, g)
        _, top_blocks = lax.top_k(bmax.T, nb)
        xr = hs.reshape(b, g, BLOCK_COLS)
        cand = jnp.take_along_axis(xr, top_blocks[:, :, None], axis=1)
        return cand[:1, :1, :8]

    # Stage D: full current path (C + final top-k).
    @jax.jit
    def stage_d(q, head, valid):
        hs, bmax = head_scores_blockmax_pallas(q, head, valid)
        nb = min(k, g)
        _, top_blocks = lax.top_k(bmax.T, nb)
        xr = hs.reshape(b, g, BLOCK_COLS)
        cand = jnp.take_along_axis(xr, top_blocks[:, :, None], axis=1)
        vals, pos = lax.top_k(cand.reshape(b, nb * BLOCK_COLS), k)
        blk = jnp.take_along_axis(top_blocks, pos // BLOCK_COLS, axis=1)
        rows = blk * BLOCK_COLS + pos % BLOCK_COLS
        return vals, rows

    # Stage E: plain lax.top_k over the full matrix (XLA ceiling).
    @jax.jit
    def stage_e(q, head, valid):
        hs, _ = head_scores_blockmax_pallas(q, head, valid)
        return lax.top_k(hs, k)

    for name, fn in [
        ("A matmul+blockmax (scores written)", stage_a),
        ("B + topk(bmax)", stage_b),
        ("C + block gather", stage_c),
        ("D + final topk (current path)", stage_d),
        ("E matmul + plain lax.top_k", stage_e),
    ]:
        t = timeit(lambda fn=fn: fn(q, head, valid), reps=args.reps)
        print(f"{name:44s} {t * 1e3:8.1f} ms")


if __name__ == "__main__":
    main()
