#!/usr/bin/env python3
"""B=1 latency decomposition on the real TPU (VERDICT r2 item 6).

Splits one single-query search into its stages — host encode, query
upload, device execute, result download, host merge — to show where the
~30 ms p50 lives (DEVELOPMENT.md attributes it to the remote-TPU
tunnel's fixed per-transfer cost; this measures it).

Usage: python tools/profile_latency.py [--docs 57638] [--batch 1]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def pct(xs, p):
    return float(np.percentile(xs, p))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=57_638)
    ap.add_argument("--vocab", type=int, default=100_000)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--topk", type=int, default=50)
    ap.add_argument("--iters", type=int, default=40)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/osr_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from osr_tpu.index.builder import SparseIndexBuilder
    from osr_tpu.retrieval.engine import SparseSearchEngine
    from osr_tpu.testing import SyntheticDataGenerator

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    gen = SyntheticDataGenerator(seed=42)
    corpus = gen.zipf_corpus(
        args.docs, args.vocab, avg_len=130, word_prefix="t", min_len=5
    )
    queries = list(
        gen.queries(
            200, args.vocab, avg_terms=11, word_prefix="t", min_terms=2
        ).values()
    )
    index = SparseIndexBuilder(method="bm25").build(corpus)
    engine = SparseSearchEngine(
        index,
        device=dev,
        batch_sizes=(args.batch,),
        cache_queries=False,
        topk_mode="exact",
    )
    engine.search({"warm": queries[0]}, top_k=args.topk)  # compile

    from osr_tpu.ops.bm25 import pack_query_batch

    stages = {
        "encode_ms": [],
        "tail_ms": [],
        "upload_ms": [],
        "execute+download_ms": [],
        "download_only_ms": [],
        "merge_ms": [],
        "end_to_end_ms": [],
    }
    d = engine._dev
    for i in range(args.iters):
        text = queries[i % len(queries)]
        t_all = time.perf_counter()

        t0 = time.perf_counter()
        enc = engine.encode_queries([text])
        packed_np = pack_query_batch(enc.head_ids, enc.head_weights)
        stages["encode_ms"].append((time.perf_counter() - t0) * 1e3)

        t0 = time.perf_counter()
        cand = engine._tail_candidates(enc, enc.head_ids.shape[0])
        stages["tail_ms"].append((time.perf_counter() - t0) * 1e3)

        t0 = time.perf_counter()
        packed_dev = jax.device_put(packed_np, dev)
        packed_dev.block_until_ready()
        stages["upload_ms"].append((time.perf_counter() - t0) * 1e3)

        from osr_tpu.ops.bm25 import fused_search_packed

        t0 = time.perf_counter()
        out, _ = fused_search_packed(
            packed_dev,
            d.empty_i32,
            d.empty_i32,
            d.head,
            d.head_scales,
            d.valid,
            head_terms=engine.index.layout.head_terms,
            k=args.topk,
            topk_mode=engine.topk_mode,
            head_backend=engine.head_backend,
        )
        out_np = np.asarray(out)  # execute + download, wall clock
        stages["execute+download_ms"].append(
            (time.perf_counter() - t0) * 1e3
        )

        # Download alone: re-fetch the already-computed buffer.
        t0 = time.perf_counter()
        np.asarray(out)
        stages["download_only_ms"].append((time.perf_counter() - t0) * 1e3)

        from osr_tpu.index.postings import (
            cand_head_scores_host, merge_host, merge_tau_slack,
        )
        from osr_tpu.ops.bm25 import unpack_topk

        t0 = time.perf_counter()
        cand_head = cand_head_scores_host(
            index.layout.head,
            index.layout.head_dtype,
            index.layout.head_scales,
            cand,
            enc.head_flat_ids,
            enc.head_flat_counts,
            enc.head_ptr,
            head_t=engine._head_t,
        )
        hs, hr = unpack_topk(out_np)
        slack = merge_tau_slack(
            engine._slack_per_term, enc.head_flat_ids,
            enc.head_flat_counts, enc.head_ptr,
        )
        merge_host(
            hs, hr, cand, cand_head, index.layout.num_rows, args.topk,
            tau_slack=slack,
        )
        stages["merge_ms"].append((time.perf_counter() - t0) * 1e3)
        stages["end_to_end_ms"].append((time.perf_counter() - t_all) * 1e3)

    # Engine-path end-to-end (the number bench.py reports).
    lats = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        engine.search({"q": queries[i % len(queries)]}, top_k=args.topk)
        lats.append((time.perf_counter() - t0) * 1e3)

    print(f"# B={args.batch} stage decomposition (p50 / p95 over "
          f"{args.iters} iters):")
    for name, xs in stages.items():
        print(f"{name:22s} {pct(xs, 50):7.2f} / {pct(xs, 95):7.2f} ms")
    print(f"{'engine search() e2e':22s} {pct(lats, 50):7.2f} / "
          f"{pct(lats, 95):7.2f} ms")


if __name__ == "__main__":
    main()
