#!/usr/bin/env python3
"""Device-stage microbenchmark: scatter / head matmul / top-k / transfers
at a given batch size, on the real TPU. Informs DEVELOPMENT.md's roofline
table.

Usage: python tools/profile_device.py [--docs 57638] [--batch 6656]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, fetch, reps=4):
    fn()  # compile/warm
    fetch()
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    fetch(out)
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
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/osr_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from osr_tpu.index.builder import SparseIndexBuilder
    from osr_tpu.ops import bm25 as ops
    from osr_tpu.testing import SyntheticDataGenerator

    dev = jax.devices()[0]
    B = args.batch
    print(f"# device: {dev}  B={B}", file=sys.stderr)

    corpus = SyntheticDataGenerator(seed=42).zipf_corpus(
        args.docs, args.vocab, avg_len=130, word_prefix="t", min_len=5
    )
    index = SparseIndexBuilder(method="bm25").build(corpus)
    lay = index.layout
    R, F = lay.head.shape
    print(f"# R={R} F={F} head_dtype={lay.head_dtype}", file=sys.stderr)

    rng = np.random.default_rng(0)
    Q = 16
    ids = rng.integers(0, F, size=(B, Q)).astype(np.int32)
    w = rng.random((B, Q)).astype(np.float32)

    head = jax.device_put(lay.head, dev)
    scales = jax.device_put(lay.head_scales, dev)
    valid = jax.device_put(lay.valid, dev)
    packed = jax.device_put(ops.pack_query_batch(ids, w), dev)
    empty = jax.device_put(np.zeros(0, np.int32), dev)
    jax.block_until_ready([head, scales, valid, packed, empty])

    # 1. full fused step (exact)
    def full():
        return ops.fused_search_packed(
            packed, empty, empty, head, scales, valid,
            head_terms=F, k=args.topk, topk_mode="exact",
        )[0]

    t_full = timeit(full, lambda *a: np.asarray(a[0] if a else full()))
    print(f"fused exact total: {t_full * 1e3:9.2f} ms")

    # 1b. approx
    def full_approx():
        return ops.fused_search_packed(
            packed, empty, empty, head, scales, valid,
            head_terms=F, k=args.topk, topk_mode="approx",
        )[0]

    t_fa = timeit(full_approx, lambda *a: np.asarray(a[0] if a else full_approx()))
    print(f"fused approx total: {t_fa * 1e3:8.2f} ms")

    # 1c. bisect: same math as the fused program but scalar-reduced output
    # (isolates dispatch/download overhead from compute).
    @jax.jit
    def fused_scalar(qp):
        idsd = qp[..., 0]
        wd = lax.bitcast_convert_type(qp[..., 1], jnp.float32)
        qhead = ops.scatter_query_head(idsd, wd, head_terms=F)
        hs = ops.head_scores(head, scales, qhead)
        hs = jnp.where(valid[None, :], hs, ops.NEG_INF)
        s, r_ = lax.top_k(hs, args.topk)
        return s[:, 0].sum() + r_[:, 0].sum()

    t_fs = timeit(lambda: fused_scalar(packed), lambda *a: np.asarray(a[0] if a else fused_scalar(packed)))
    print(f"scatter+mm+mask+topk (scalar out): {t_fs * 1e3:6.2f} ms")

    # 1d. + full (B, 2k) packed output (adds the download/pack cost)
    @jax.jit
    def fused_packed_out(qp):
        idsd = qp[..., 0]
        wd = lax.bitcast_convert_type(qp[..., 1], jnp.float32)
        qhead = ops.scatter_query_head(idsd, wd, head_terms=F)
        hs = ops.head_scores(head, scales, qhead)
        hs = jnp.where(valid[None, :], hs, ops.NEG_IF if False else ops.NEG_INF)
        s, r_ = lax.top_k(hs, args.topk)
        return jnp.concatenate([s, r_.astype(jnp.float32)], axis=1)

    t_fp = timeit(lambda: fused_packed_out(packed), lambda *a: np.asarray(a[0] if a else fused_packed_out(packed)))
    print(f"  + packed (B,2k) output: {t_fp * 1e3:6.2f} ms")

    # 2. scatter+matmul only (sum output to avoid moving (R,B))
    @jax.jit
    def mm_only(qp):
        idsd = qp[..., 0]
        wd = lax.bitcast_convert_type(qp[..., 1], jnp.float32)
        qhead = ops.scatter_query_head(idsd, wd, head_terms=F)
        hs = ops.head_scores(head, scales, qhead)  # (B, R)
        hs = jnp.where(valid[None, :], hs, ops.NEG_INF)
        return jnp.sum(jnp.where(jnp.isfinite(hs), hs, 0.0))

    t_mm = timeit(lambda: mm_only(packed), lambda *a: np.asarray(a[0] if a else mm_only(packed)))
    print(f"scatter+matmul+mask(+reduce): {t_mm * 1e3:6.2f} ms")

    # 3. top_k alone on a materialized (B, R) matrix
    hs_mat = jax.device_put(
        rng.standard_normal((B, R), dtype=np.float32), dev
    )
    jax.block_until_ready(hs_mat)

    @jax.jit
    def tk(x):
        s, r = lax.top_k(x, args.topk)
        return s[:, 0].sum() + r[:, 0].sum()

    t_tk = timeit(lambda: tk(hs_mat), lambda *a: np.asarray(a[0] if a else tk(hs_mat)))
    print(f"lax.top_k({B}x{R}, k={args.topk}) alone: {t_tk * 1e3:6.2f} ms")

    @jax.jit
    def tk_bf16(x):
        s, r = lax.top_k(x.astype(jnp.bfloat16), args.topk)
        return s[:, 0].astype(jnp.float32).sum() + r[:, 0].sum()

    t_tkb = timeit(lambda: tk_bf16(hs_mat), lambda *a: np.asarray(a[0] if a else tk_bf16(hs_mat)))
    print(f"top_k bf16: {t_tkb * 1e3:6.2f} ms")

    @jax.jit
    def amk(x):
        s, r = lax.approx_max_k(x, args.topk, recall_target=0.95)
        return s[:, 0].sum() + r[:, 0].sum()

    t_am = timeit(lambda: amk(hs_mat), lambda *a: np.asarray(a[0] if a else amk(hs_mat)))
    print(f"approx_max_k: {t_am * 1e3:6.2f} ms")

    # transfer costs
    t0 = time.perf_counter()
    for _ in range(3):
        p = jax.device_put(ops.pack_query_batch(ids, w), dev)
        jax.block_until_ready(p)
    print(f"query upload ({packed.nbytes/2**20:.1f} MB): {(time.perf_counter()-t0)/3*1e3:6.2f} ms")

    out = full()
    t0 = time.perf_counter()
    for _ in range(3):
        np.asarray(out)
    print(f"result download ({out.nbytes/2**20:.1f} MB): {(time.perf_counter()-t0)/3*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
