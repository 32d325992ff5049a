#!/usr/bin/env python3
"""Throughput vs batch size at FiQA scale, on the real TPU.

The amortized-QPS headline uses one whole-query-set batch; production
serving picks a batch from a latency budget. This measures the curve
(and the per-query latency at each point) so the trade is documented:
through the remote tunnel the fixed per-dispatch cost dominates small
batches; on a PCIe host the curve shifts left. Appends one JSON line per
batch size to bench_results/batch_curve.jsonl.

Usage: python tools/bench_batch_curve.py [--batches 8,128,512,2048,6656]
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=57_638)
    ap.add_argument("--vocab", type=int, default=100_000)
    ap.add_argument("--batches", default="8,128,512,2048,6656")
    ap.add_argument("--topk", type=int, default=50)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument(
        "--out",
        default=str(
            Path(__file__).parents[1] / "bench_results" / "batch_curve.jsonl"
        ),
    )
    args = ap.parse_args()
    batches = [int(x) for x in args.batches.split(",")]

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/osr_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from osr_tpu.index.builder import SparseIndexBuilder
    from osr_tpu.retrieval.engine import SparseSearchEngine
    from osr_tpu.testing import SyntheticDataGenerator

    dev = jax.devices()[0]
    gen = SyntheticDataGenerator(seed=42)
    corpus = gen.zipf_corpus(
        args.docs, args.vocab, avg_len=130, word_prefix="t", min_len=5
    )
    queries = gen.queries(
        6648, args.vocab, avg_terms=11, word_prefix="t", min_terms=2
    )
    index = SparseIndexBuilder(method="bm25").build(corpus)

    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    for b in batches:
        engine = SparseSearchEngine(
            index,
            device=dev,
            batch_sizes=(b,),
            cache_queries=False,
            topk_mode="exact",
        )
        n = max((2000 // b) * b, b)  # a few dispatches per pass
        sub = dict(list(queries.items())[:n])
        engine.search(sub, top_k=args.topk)  # compile + warm
        qps = []
        for _ in range(args.passes):
            t0 = time.perf_counter()
            engine.search(sub, top_k=args.topk)
            qps.append(round(n / (time.perf_counter() - t0), 1))
        row = {
            "batch": b,
            "num_docs": args.docs,
            "qps_median": float(np.median(qps)),
            "qps_passes": qps,
            "ms_per_query": round(1000.0 / float(np.median(qps)), 3),
            "queries_timed": n,
            "top_k": args.topk,
            "device": str(dev),
        }
        with open(out_path, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
