#!/usr/bin/env python3
"""Component-level timing of the fused sparse search step on real TPU.

Times each stage of the ops/bm25.py pipeline in isolation (own jit, own
dispatch) and the fused step, then prints a roofline-style table: measured
time vs the HBM bytes each stage must touch. Guides optimization (VERDICT
round-1 item 2: "profile the fused search step and publish roofline
numbers").

Usage: python tools/profile_search.py [--docs 57638] [--batch 1024]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, n=5, **kw):
    import jax

    out = fn(*args, **kw)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=57_638)
    ap.add_argument("--vocab", type=int, default=100_000)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--queries", type=int, default=6648)
    ap.add_argument("--topk", type=int, default=50)
    ap.add_argument("--head-dtype", default=None, help="engine head dtype")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/osr_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax import lax

    from osr_tpu.index.builder import SparseIndexBuilder
    from osr_tpu.retrieval.engine import SparseSearchEngine
    from osr_tpu.testing import SyntheticDataGenerator
    from osr_tpu.ops import bm25 as ops

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    corpus = SyntheticDataGenerator(seed=42).zipf_corpus(
        args.docs, args.vocab, avg_len=130, word_prefix="t", min_len=5
    )
    queries = SyntheticDataGenerator(seed=6).queries(
        args.queries, args.vocab, avg_terms=11, word_prefix="t", min_terms=2
    )
    t0 = time.perf_counter()
    index = SparseIndexBuilder(method="bm25").build(corpus)
    print(f"# build: {time.perf_counter()-t0:.2f}s", file=sys.stderr)
    print(f"# stats: {index.stats()}", file=sys.stderr)

    kw = {} if args.head_dtype is None else {"head_dtype": args.head_dtype}
    engine = SparseSearchEngine(
        index, device=dev, batch_sizes=(args.batch,), cache_queries=False,
        **kw,
    )
    d = engine._dev
    B = args.batch
    texts = [t for _, t in list(queries.items())[:B]]
    tids_np, wts_np = engine.encode_queries(texts)
    tids = jax.device_put(jnp.asarray(tids_np), dev)
    wts = jax.device_put(jnp.asarray(wts_np), dev)
    V1 = engine._vocab_rows
    R = index.layout.num_rows
    F = index.layout.head_terms

    rows = []

    def add(name, secs, mbytes, note=""):
        rows.append((name, secs * 1e3, mbytes, mbytes / 1024 / secs, note))

    # 1. query scatter
    t, qw = timeit(
        lambda a, b: ops.build_query_matrix(a, b, vocab_rows=V1), tids, wts
    )
    qw_mb = V1 * B * qw.dtype.itemsize / 2**20
    add("scatter qw", t, qw_mb, f"(V+1,B)={V1}x{B} {qw.dtype}")

    # 2. head matmul alone
    head_fn = jax.jit(lambda hw, q: ops._head_scores(hw, q))
    t, _ = timeit(head_fn, d.head_weights, qw)
    head_mb = (
        d.head_weights.size * d.head_weights.dtype.itemsize + R * B * 4
    ) / 2**20
    add("head matmul", t, head_mb, f"(R,F)=({R},{F}) {d.head_weights.dtype}")

    # 3. all tail buckets
    def tail_fn(qwm, t_ids, t_w):
        qb = qwm.astype(jnp.bfloat16)
        outs = []
        for (off, cr), ti, w in zip(d.tail_meta, t_ids, t_w):
            outs.append(ops._ell_rows_scores(qb, ti, w, chunk_rows=cr))
        return outs

    tail_jit = jax.jit(tail_fn)
    t, _ = timeit(tail_jit, qw, d.tail_term_ids, d.tail_weights)
    tail_bytes = sum(
        ti.size * ti.dtype.itemsize + w.size * w.dtype.itemsize
        for ti, w in zip(d.tail_term_ids, d.tail_weights)
    )
    gather_bytes = sum(ti.size * B * 2 for ti in d.tail_term_ids)
    add(
        "tail gathers",
        t,
        (tail_bytes + gather_bytes) / 2**20,
        f"slots={sum(ti.size for ti in d.tail_term_ids)} +bf16 gather out",
    )

    # 4. full scoring (scatter+head+tail)
    score_fn = lambda a, b: ops.hybrid_scores(
        a, b, d.head_weights, d.tail_term_ids, d.tail_weights,
        vocab_rows=V1, tail_meta=d.tail_meta,
    )
    t, scores = timeit(score_fn, tids, wts)
    add("scores fused", t, (R * B * 4) / 2**20, "scatter+head+tail")

    # 5. top-k variants on the (R, B) score matrix
    valid = d.valid
    kk = args.topk

    exact = jax.jit(
        lambda s: lax.top_k(jnp.where(valid[:, None], s, -jnp.inf).T, kk)
    )
    t, _ = timeit(exact, scores)
    add("topk exact", t, R * B * 4 / 2**20, "lax.top_k over R")

    from osr_tpu.ops.topk import fast_topk_columns

    fast = jax.jit(lambda s: fast_topk_columns(s, valid, k=kk))
    t, _ = timeit(fast, scores)
    add("topk fast", t, R * B * 6 / 2**20, "bf16 coarse + rerank")

    # 6. the real fused dispatch
    for mode in ("exact", "fast"):
        full = lambda a, b: ops.hybrid_score_topk(
            a, b, d.head_weights, d.tail_term_ids, d.tail_weights,
            d.valid, d.doc_map, vocab_rows=V1, k=kk,
            tail_meta=d.tail_meta, topk_mode=mode,
        )
        t, _ = timeit(full, tids, wts)
        add(f"FULL ({mode})", t, 0, f"B={B} -> {B/t:.0f} qps")

    print(
        f"\n{'stage':<16}{'ms':>9}{'~MB':>10}{'GB/s':>9}  note"
    )
    for name, ms, mb, gbs, note in rows:
        print(f"{name:<16}{ms:9.2f}{mb:10.0f}{gbs:9.0f}  {note}")


if __name__ == "__main__":
    main()
