#!/usr/bin/env python3
"""Sharded engine on the REAL TPU chip (VERDICT r3 item 6).

All prior sharded-engine evidence ran on the virtual CPU mesh with
``pallas_interpret=True`` (bench_results/sharded_cpu.jsonl,
MULTICHIP_r03.json). This run validates the shard_map program on real
hardware: a 1-device TPU mesh executes the full sharded search step —
Mosaic (non-interpret) head kernel, local block-pruned top-k, the
all-gather merge and psum candidate reassembly (degenerate but compiled
collectives) — and the results are compared query-by-query against the
flat single-device engine at FiQA scale, recording the shard_map
program's QPS overhead.

Appends a JSON line to bench_results/sharded_tpu.jsonl.

Usage:  python tools/bench_sharded_tpu.py [--docs 57638] [--passes 5]
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=57_638)
    ap.add_argument("--vocab", type=int, default=100_000)
    ap.add_argument("--queries", type=int, default=2048)
    ap.add_argument("--topk", type=int, default=50)
    ap.add_argument("--passes", type=int, default=5)
    ap.add_argument("--head-dtype", default="int8")
    ap.add_argument("--narrow-m", type=int, default=0)
    ap.add_argument(
        "--narrow-backend",
        default="xla",
        choices=("xla", "extract"),
        help="'extract' = per-shard Mosaic top-m extraction + host-side "
        "candidate head scores (sharded_search_extract)",
    )
    ap.add_argument(
        "--out",
        default=str(
            Path(__file__).parents[1] / "bench_results" / "sharded_tpu.jsonl"
        ),
    )
    args = ap.parse_args()

    import jax

    from osr_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    dev = jax.devices()[0]
    assert dev.platform == "tpu", f"need the real chip, got {dev}"

    from osr_tpu.index.builder import SparseIndexBuilder
    from osr_tpu.parallel.mesh import make_mesh
    from osr_tpu.parallel.sharded import ShardedSparseSearchEngine
    from osr_tpu.retrieval.engine import SparseSearchEngine
    from osr_tpu.testing import SyntheticDataGenerator

    gen = SyntheticDataGenerator(seed=42)
    corpus = gen.zipf_corpus(
        args.docs, args.vocab, avg_len=130, word_prefix="t", min_len=5
    )
    queries = gen.queries(
        args.queries, args.vocab, avg_terms=11, word_prefix="t", min_terms=2
    )
    t0 = time.perf_counter()
    index = SparseIndexBuilder(
        method="bm25", head_dtype=args.head_dtype
    ).build(corpus)
    build_s = time.perf_counter() - t0
    del corpus
    print(f"# built in {build_s:.1f}s: {index.stats()}", file=sys.stderr)

    mesh = make_mesh(1)  # the one real chip: mesh (q=1, d=1)
    t0 = time.perf_counter()
    sharded = ShardedSparseSearchEngine(
        index,
        mesh,
        batch_sizes=(args.queries,),
        cache_queries=False,
        narrow_m=args.narrow_m,
        narrow_backend=args.narrow_backend,
    )
    res_sharded = sharded.search(queries, top_k=args.topk)
    warm_sharded_s = time.perf_counter() - t0

    def qps_of(engine):
        passes = []
        for _ in range(args.passes):
            t0 = time.perf_counter()
            engine.search(queries, top_k=args.topk)
            passes.append(
                round(len(queries) / (time.perf_counter() - t0), 1)
            )
        return sorted(passes)[len(passes) // 2], passes

    qps_sharded, passes_sharded = qps_of(sharded)

    flat = SparseSearchEngine(
        index,
        device=dev,
        batch_sizes=(args.queries,),
        cache_queries=False,
    )
    res_flat = flat.search(queries, top_k=args.topk)
    qps_flat, passes_flat = qps_of(flat)

    # Mismatch criterion (same as bench_sharded_cpu.py): substantive
    # ranking differences only — a doc unique to one engine outscoring
    # the other's k-th kept score beyond tolerance, or a shared doc's
    # scores disagreeing. Equal-score boundary tie swaps don't count
    # (both engines break exact ties arbitrarily, like any top-k).
    tol = 1e-4
    mismatches = 0
    for qid in queries:
        a, b = res_sharded[qid], res_flat[qid]
        amin = min(a.values(), default=0.0)
        bmin = min(b.values(), default=0.0)
        bad = any(
            a[d] > bmin + tol * max(1.0, abs(bmin))
            for d in set(a) - set(b)
        ) or any(
            b[d] > amin + tol * max(1.0, abs(amin))
            for d in set(b) - set(a)
        ) or any(
            abs(a[d] - b[d]) > tol * max(1.0, abs(b[d]))
            for d in set(a) & set(b)
        )
        mismatches += bool(bad)

    row = {
        "num_docs": args.docs,
        "head_dtype": args.head_dtype,
        "devices": 1,
        "mesh": dict(mesh.shape),
        "head_backend": sharded.head_backend,
        "narrow_m": args.narrow_m,
        "narrow_backend": args.narrow_backend,
        "pallas_interpret": False,
        "build_s": round(build_s, 2),
        "warmup_s_sharded": round(warm_sharded_s, 1),
        "qps_sharded": qps_sharded,
        "qps_sharded_passes": passes_sharded,
        "qps_flat": qps_flat,
        "qps_flat_passes": passes_flat,
        "shard_map_overhead_pct": round(
            100.0 * (1.0 - qps_sharded / qps_flat), 1
        ),
        "num_queries": args.queries,
        "top_k": args.topk,
        "mismatched_queries_vs_flat": mismatches,
        "device": str(dev),
    }
    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    with open(out_path, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row))
    assert mismatches == 0, f"{mismatches} queries differ from flat engine"


if __name__ == "__main__":
    main()
