#!/usr/bin/env python3
"""Per-stage profiling of the v2 search pipeline on real TPU.

Times every host and device stage of the engine (steady-state, pipelined
fetch-forced timing — `jax.block_until_ready` under-reports through the
remote-TPU tunnel) and prints the breakdown behind DEVELOPMENT.md's
roofline analysis.

Usage: python tools/profile_search.py [--docs 57638] [--batch 1024]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=57_638)
    ap.add_argument("--vocab", type=int, default=100_000)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--topk", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/osr_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from osr_tpu.index.builder import SparseIndexBuilder
    from osr_tpu.index.postings import (
        cand_head_scores_host, merge_host, merge_tau_slack,
    )
    from osr_tpu.ops import bm25 as ops
    from osr_tpu.retrieval.engine import SparseSearchEngine
    from osr_tpu.testing import SyntheticDataGenerator

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)
    B = args.batch

    corpus = SyntheticDataGenerator(seed=42).zipf_corpus(
        args.docs, args.vocab, avg_len=130, word_prefix="t", min_len=5
    )
    queries = SyntheticDataGenerator(seed=6).queries(
        6 * B, args.vocab, avg_terms=11, word_prefix="t", min_terms=2
    )
    t0 = time.perf_counter()
    index = SparseIndexBuilder(method="bm25").build(corpus)
    print(f"# build: {time.perf_counter() - t0:.2f}s", file=sys.stderr)
    print(f"# stats: {index.stats()}", file=sys.stderr)

    engine = SparseSearchEngine(
        index, device=dev, batch_sizes=(B,), cache_queries=False
    )
    print(f"# merge_backend: {engine.merge_backend}", file=sys.stderr)
    texts = [t for _, t in queries.items()]
    layout = index.layout

    # Warm compile.
    enc0 = engine.encode_queries(texts[:B])
    h0 = engine.search_encoded_device(enc0, args.topk)
    engine.finish_batch(h0, args.topk)

    # --- serial host stages -------------------------------------------
    import collections

    t = collections.defaultdict(float)
    n = 5
    handles = []
    for i in range(n):
        lo = i * B
        t0 = time.perf_counter()
        enc = engine.encode_queries(texts[lo : lo + B])
        t["host encode"] += time.perf_counter() - t0
        t0 = time.perf_counter()
        cand = engine._tail_candidates(enc, B)
        t["host tail candidates"] += time.perf_counter() - t0
        t0 = time.perf_counter()
        ch = cand_head_scores_host(
            layout.head,
            layout.head_dtype,
            layout.head_scales,
            cand,
            enc.head_flat_ids,
            enc.head_flat_counts,
            enc.head_ptr,
            head_t=engine._head_t,
        )
        t["host cand head-dot"] += time.perf_counter() - t0
        handles.append((enc, cand, ch))

    # --- device steady state (pipelined, fetch-forced) -----------------
    d = engine._dev
    packs = [
        jnp.asarray(ops.pack_query_batch(e.head_ids, e.head_weights))
        for e, _, _ in handles
    ]
    jax.block_until_ready(packs)

    def run(qp):
        return ops.fused_search_packed(
            qp,
            d.empty_i32,
            d.empty_i32,
            d.head,
            d.head_scales,
            d.valid,
            head_terms=layout.head_terms,
            k=args.topk,
            topk_mode=engine.topk_mode,
        )

    for qp in packs:
        o = run(qp)
        np.asarray(o[0]).ravel()[:1]
    t0 = time.perf_counter()
    reps = 4
    for _ in range(reps):
        for qp in packs:
            last = run(qp)
    np.asarray(last[0]).ravel()[:1]
    t["device fused (scatter+mm+mask+topk)"] = (
        (time.perf_counter() - t0) / reps
    )

    # --- host merge -----------------------------------------------------
    outs = [run(qp) for qp in packs]
    fetched = [
        ops.unpack_topk(np.asarray(o[0])) for o in outs
    ]
    t0 = time.perf_counter()
    for (hs, hr), (enc, cand, ch) in zip(fetched, handles):
        merge_host(
            hs, hr, cand, ch, layout.num_rows, args.topk,
            tau_slack=merge_tau_slack(
                engine._slack_per_term, enc.head_flat_ids,
                enc.head_flat_counts, enc.head_ptr,
            ),
        )
    t["host merge"] = time.perf_counter() - t0

    print(f"\nper-batch stage costs (B={B}, n={n}):")
    for name, secs in t.items():
        per = secs / n if name.startswith("host") else secs / n
        print(f"  {name:<38}{per * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
