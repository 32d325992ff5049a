#!/usr/bin/env python3
"""Sharded-engine scale demonstration on an 8-virtual-device CPU mesh
(VERDICT round-1 item 6, second half): build a few-hundred-thousand-doc
index, shard its rows over the ``d`` axis (queries over ``q``), run the
full shard_map search step, and verify the results equal the single-device
engine on a query sample. Appends a JSON line to
bench_results/sharded_cpu.jsonl.

This is a CORRECTNESS-AT-SCALE run (virtual CPU devices share one core, so
QPS is not meaningful); the real-chip throughput evidence is
bench_results/scaling.jsonl.

Usage:  python tools/bench_sharded_cpu.py [--docs 200000]
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--topk", type=int, default=50)
    ap.add_argument("--devices", type=int, default=8)
    # All head dtypes match the single-device engine exactly: the host
    # candidate scorer applies the device matmul's bf16 query-weight
    # rounding (osr_tpu/index/postings.py:cand_head_scores_host), so the
    # two head-score arithmetics agree. Measured 200k docs / 8 devices:
    # 0/256 mismatched queries for f32 AND int8 (sharded_cpu.jsonl; the
    # first int8 row predates the numeric unification and shows the 241
    # boundary swaps that motivated it).
    ap.add_argument("--head-dtype", default="int8", choices=["f32", "bf16", "int8", "int4"])
    ap.add_argument("--narrow-m", type=int, default=0)
    ap.add_argument(
        "--narrow-backend",
        default="xla",
        choices=("xla", "extract"),
        help="'extract' = per-shard Mosaic top-m extraction (interpret "
        "mode on the CPU mesh) + host-side candidate head scores",
    )
    ap.add_argument(
        "--out",
        default=str(
            Path(__file__).parents[1] / "bench_results" / "sharded_cpu.jsonl"
        ),
    )
    args = ap.parse_args()

    import jax

    # The TPU-tunnel sitecustomize forces jax_platforms by config (overrides
    # env vars); switch back to virtual CPU before the backend initializes.
    try:
        if "axon" in (jax.config.jax_platforms or ""):
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_num_cpu_devices", args.devices)
    except Exception:
        pass
    assert len(jax.devices()) >= args.devices, jax.devices()

    from osr_tpu.index.builder import SparseIndexBuilder
    from osr_tpu.parallel.mesh import make_mesh
    from osr_tpu.parallel.sharded import ShardedSparseSearchEngine
    from osr_tpu.retrieval.engine import SparseSearchEngine
    from osr_tpu.testing import SyntheticDataGenerator

    vocab = min(4 * args.docs, 400_000)
    gen = SyntheticDataGenerator(seed=42)
    t0 = time.perf_counter()
    corpus = gen.zipf_corpus(
        args.docs, vocab, avg_len=130, word_prefix="t", min_len=5
    )
    queries = gen.queries(
        args.queries, vocab, avg_terms=11, word_prefix="t", min_terms=2
    )
    print(f"# generated in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    index = SparseIndexBuilder(
        method="bm25", head_dtype=args.head_dtype
    ).build(corpus)
    build_s = time.perf_counter() - t0
    del corpus
    print(f"# built in {build_s:.1f}s: {index.stats()}", file=sys.stderr)

    mesh = make_mesh(args.devices, query_parallel=2)
    t0 = time.perf_counter()
    sharded = ShardedSparseSearchEngine(
        index,
        mesh,
        batch_sizes=(args.queries,),
        narrow_m=args.narrow_m,
        narrow_backend=args.narrow_backend,
        **(
            {"head_backend": "pallas", "pallas_interpret": True}
            if args.narrow_backend == "extract"
            else {}
        ),
    )
    shard_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    res_sharded = sharded.search(queries, top_k=args.topk)
    sharded_search_s = time.perf_counter() - t0

    single = SparseSearchEngine(
        index,
        device=jax.devices()[0],
        batch_sizes=(args.queries,),
        cache_queries=False,
    )
    res_single = single.search(queries, top_k=args.topk)

    # Exactness: a query counts as mismatched only if a document unique to
    # one engine outscores the other engine's k-th kept score by more than
    # tol — i.e. a SUBSTANTIVE ranking difference, not an equal-score tie
    # swap at the boundary (both engines break exact ties arbitrarily,
    # like any top-k).
    tol = 1e-4
    mismatches = 0
    for qid in queries:
        a, b = res_sharded[qid], res_single[qid]
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
        "vocab_size": index.vocab_size,
        "head_dtype": args.head_dtype,
        "narrow_m": args.narrow_m,
        "narrow_backend": args.narrow_backend,
        "devices": args.devices,
        "mesh": dict(mesh.shape),
        "rows_per_shard": sharded.r_padded // mesh.shape["d"],
        "build_s": round(build_s, 2),
        "shard_upload_s": round(shard_s, 2),
        "sharded_search_s": round(sharded_search_s, 2),
        "num_queries": args.queries,
        "top_k": args.topk,
        "mismatched_queries_vs_single_device": mismatches,
        "platform": "cpu-virtual",
    }
    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    with open(out_path, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row))
    assert mismatches == 0, f"{mismatches} queries differ from single-device"


if __name__ == "__main__":
    main()
