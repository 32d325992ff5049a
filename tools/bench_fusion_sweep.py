#!/usr/bin/env python3
"""Fusion ablation: sweep hybrid weights/modes WITHOUT rebuilding.

The reference ships exactly one hybrid operating point (reference
rag_system/configs/ms_marco_paper_results.yaml: sparse 0.3 + dense 0.7,
weighted). Fusion in osr_tpu is applied at search time, so a full
weight/mode sweep costs one index build + one encoder pass total
(HybridRetriever.set_fusion). This measures, on the at-scale real-prose
dataset (same harvest as tools/bench_quality_at_scale.py):

  - each leg alone (BM25, hashing-encoder dense)
  - weighted fusion at sparse_weight in {0.3, 0.5, 0.7, 0.9}
  - RRF at unit weights and at sparse-favoring 2:1

and writes bench_results/fusion_sweep.json.

Usage: python tools/bench_fusion_sweep.py [--query-mode noisy]
       [--max-chunks N] [--num-queries N] [--cpu]
"""

import argparse
import importlib.util
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-chunks", type=int, default=100_000)
    ap.add_argument("--num-queries", type=int, default=512)
    ap.add_argument("--query-mode", default="noisy",
                    choices=("quote", "sample", "noisy"))
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--top-k", type=int, default=100)
    ap.add_argument("--encoder", default="hashing_idf",
                    choices=("hashing", "hashing_idf"),
                    help="dense leg encoder (idf variant measured far "
                    "stronger on real prose)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    spec = importlib.util.spec_from_file_location(
        "bqas", Path(__file__).parent / "bench_quality_at_scale.py"
    )
    bqas = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bqas)

    from osr_tpu.benchmarks.quality import (
        extract_query_text,
        load_corpus,
        load_qrels,
        load_queries,
    )
    from osr_tpu.metrics.ir import evaluate_retrieval
    from osr_tpu.retrieval.registry import RetrieverRegistry

    t0 = time.perf_counter()
    chunks = bqas.harvest_chunks(args.max_chunks)
    print(f"# harvested {len(chunks)} chunks in "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)

    with tempfile.TemporaryDirectory() as td:
        ds = Path(td) / "prose_sweep"
        n_queries, _ = bqas.build_dataset(
            ds, chunks, args.num_queries, mode=args.query_mode
        )
        corpus = load_corpus(ds)
        qrels = load_qrels(ds)
        queries = {
            qid: extract_query_text(q)
            for qid, q in load_queries(ds).items()
            if not qrels or qid in qrels
        }

        retr = RetrieverRegistry.create(
            {
                "type": "hybrid",
                "params": {
                    "encoder": args.encoder,
                    "cache_matrices": False,
                    "cache_dir": None,
                },
            }
        )
        t0 = time.perf_counter()
        retr.build_index_from_corpus(corpus)
        build_s = time.perf_counter() - t0

        def graded_search(searcher, label, extra):
            """Quality from the first (compile-warming) pass; QPS from a
            second, warm pass — the same warm-steady-state convention as
            benchmarks/quality.py (r4 weak #3: cold one-pass QPS columns
            contradicted the engines' real throughput)."""
            results = searcher(queries, top_k=args.top_k)
            if hasattr(retr, "clear_cache"):
                retr.clear_cache()
            t0 = time.perf_counter()
            searcher(queries, top_k=args.top_k)
            qps = len(queries) / (time.perf_counter() - t0)
            if hasattr(retr, "clear_cache"):
                retr.clear_cache()
            m = evaluate_retrieval(results, qrels, k_values=(10, 100))
            row = {"config": label, **extra, "qps_warm": round(qps, 1),
                   **{k: round(v, 4) for k, v in m.items()}}
            print(json.dumps(row), file=sys.stderr)
            return row

        rows = []
        # Legs alone (same engines the fusion draws from — no rebuild).
        rows.append(graded_search(retr.sparse.search, "sparse_only", {}))
        rows.append(graded_search(retr.dense.search, "dense_only", {}))
        for sw in (0.3, 0.5, 0.7, 0.9):
            retr.set_fusion(sparse_weight=sw, dense_weight=1.0 - sw,
                            fusion="weighted")
            rows.append(graded_search(retr.search, "weighted",
                                      {"sparse_weight": sw,
                                       "dense_weight": round(1.0 - sw, 2)}))
        for sw, dw, rk in ((1.0, 1.0, 20.0), (1.0, 1.0, 60.0),
                           (1.0, 1.0, 100.0), (2.0, 1.0, 20.0),
                           (2.0, 1.0, 60.0), (2.0, 1.0, 100.0),
                           (3.0, 1.0, 60.0)):
            retr.set_fusion(sparse_weight=sw, dense_weight=dw,
                            fusion="rrf", rrf_k=rk)
            rows.append(graded_search(retr.search, "rrf",
                                      {"sparse_weight": sw,
                                       "dense_weight": dw, "rrf_k": rk}))

    import jax

    run = {
        "dataset": "at-scale real-prose harvest (see "
        "tools/bench_quality_at_scale.py)",
        "encoder": args.encoder,
        "query_mode": args.query_mode,
        "num_docs": len(chunks),
        "num_queries": n_queries,
        "top_k": args.top_k,
        "build_s": round(build_s, 2),
        "device": str(jax.devices()[0]),
        "sweep": rows,
    }
    path = (Path(__file__).resolve().parent.parent
            / "bench_results" / "fusion_sweep.json")
    # One section per dense-leg encoder; migrate the flat v1 layout.
    existing = {}
    if path.exists():
        existing = json.loads(path.read_text())
        if "sweep" in existing:
            existing = {existing.get("encoder", "hashing"): existing}
    existing[args.encoder] = run
    path.write_text(json.dumps(existing, indent=1))
    print(json.dumps({"wrote": str(path), "encoder": args.encoder,
                      "n_rows": len(rows)}))


if __name__ == "__main__":
    main()
