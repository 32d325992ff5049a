#!/usr/bin/env python3
"""Corpus-size scaling benchmark on the real TPU (VERDICT round-1 item 6;
reference analogue: tests/large_corpus_test.py, benchmark_efficiency.py:
101-134).

Runs one corpus size per invocation (pass --docs); appends a JSON line to
bench_results/scaling.jsonl (a COMMITTED file — measured evidence) with
build time, index memory, head auto-sizing, QPS and per-query latency —
the data behind the per-chip capacity model in DEVELOPMENT.md.

Usage: python tools/bench_scaling.py --docs 1000000 --vocab 400000
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
    ap.add_argument("--docs", type=int, required=True)
    ap.add_argument("--vocab", type=int, default=None)
    ap.add_argument("--queries", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--topk", type=int, default=50)
    ap.add_argument(
        "--out", default=str(Path(__file__).parents[1] / "bench_results" / "scaling.jsonl")
    )
    ap.add_argument(
        "--save-index", help="build, dump raw index arrays to DIR, exit"
    )
    ap.add_argument(
        "--load-index", help="skip generation/build; load raw index from DIR"
    )
    ap.add_argument(
        "--head-cap",
        type=int,
        default=None,
        help="head-width cap (with an 8 GiB budget): trades memory for "
        "host-tail work — see DEVELOPMENT.md head-width knob",
    )
    ap.add_argument(
        "--head-dtype",
        default="int8",
        choices=("int8", "int4", "bf16", "f32"),
        help="head quantization (int4 halves head HBM; see test_int4.py)",
    )
    ap.add_argument(
        "--note",
        default=None,
        help="free-text label recorded in the output row (e.g. "
        "'cold-compile-cache' / 'warm-compile-cache')",
    )
    ap.add_argument(
        "--head-budget-gib",
        type=float,
        default=8.0,
        help="head byte budget used with --head-cap (the 5M F=4096 int4 "
        "row needs ~10.3 GiB of head HBM; see DEVELOPMENT.md)",
    )
    ap.add_argument(
        "--score-chunk-rows",
        type=int,
        default=None,
        help="override the engine's auto score-chunking (None = auto by "
        "its 6 GiB budget; needed >5M docs where head + one auto-sized "
        "chunk crosses the 16 GB HBM line — see DEVELOPMENT.md)",
    )
    ap.add_argument(
        "--narrow-m",
        type=int,
        default=0,
        help="per-block top-m narrowed exact selection (0 = full width); "
        "applies per score chunk too — see ops/topk.py:block_topk_narrow",
    )
    ap.add_argument(
        "--narrow-backend",
        default="xla",
        choices=("xla", "extract"),
        help="'extract' = Mosaic per-block top-m extraction kernel "
        "(score matrix never reaches HBM; non-chunked path only)",
    )
    ap.add_argument(
        "--cpu",
        action="store_true",
        help="force the CPU backend (smoke tests; also avoids hanging on "
        "an unreachable remote-TPU tunnel)",
    )
    args = ap.parse_args()
    vocab = args.vocab or min(4 * args.docs, 400_000)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from osr_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from osr_tpu.index.builder import SparseIndexBuilder
    from osr_tpu.retrieval.engine import SparseSearchEngine
    from osr_tpu.testing import SyntheticDataGenerator

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    gen = SyntheticDataGenerator(seed=42)
    queries = gen.queries(
        args.queries, vocab, avg_terms=11, word_prefix="t", min_terms=2
    )

    if args.load_index:
        import json as _json

        from osr_tpu.index.builder import SparseIndex
        from osr_tpu.index.layout import HybridLayout

        d = Path(args.load_index)
        meta = _json.loads((d / "meta.json").read_text())
        terms = _json.loads((d / "vocab.json").read_text())
        ld = lambda n: np.load(d / f"{n}.npy", allow_pickle=False)
        layout = HybridLayout(
            head_terms=meta["head_terms"],
            head=ld("head"),
            head_scales=(
                ld("head_scales")
                if meta["head_dtype"] in ("int8", "int4")
                else None
            ),
            post_ptr=ld("post_ptr"),
            post_rows=ld("post_rows"),
            post_weights=ld("post_weights"),
            valid=ld("valid"),
            num_docs=meta["num_docs"],
            vocab_size=meta["vocab_size"],
            head_dtype=meta["head_dtype"],
        )
        index = SparseIndex(
            method="bm25",
            vocabulary={t: i for i, t in enumerate(terms)},
            doc_ids=[str(i) for i in range(meta["num_docs"])],
            layout=layout,
            idf=ld("idf"),
            doc_lengths=ld("doc_lengths"),
            avgdl=meta["avgdl"],
            k1=1.2,
            b=0.75,
        )
        build_s = meta["build_s"]
        print(f"# loaded index from {d}", file=sys.stderr)
    else:
        t0 = time.perf_counter()
        corpus = gen.zipf_corpus(
            args.docs, vocab, avg_len=130, word_prefix="t", min_len=5
        )
        print(
            f"# generated in {time.perf_counter() - t0:.1f}s",
            file=sys.stderr,
        )
        t0 = time.perf_counter()
        bkw = {"head_dtype": args.head_dtype}
        if args.head_cap:
            bkw.update(
                head_cap=args.head_cap,
                head_budget_bytes=int(args.head_budget_gib * (1 << 30)),
            )
        index = SparseIndexBuilder(method="bm25", **bkw).build(corpus)
        build_s = time.perf_counter() - t0
        print(f"# built in {build_s:.1f}s", file=sys.stderr)
        del corpus

    if args.save_index:
        import json as _json

        d = Path(args.save_index)
        d.mkdir(parents=True, exist_ok=True)
        lay = index.layout
        np.save(d / "head.npy", lay.head, allow_pickle=False)
        if lay.head_scales is not None:
            np.save(d / "head_scales.npy", lay.head_scales, allow_pickle=False)
        np.save(d / "post_ptr.npy", lay.post_ptr, allow_pickle=False)
        np.save(d / "post_rows.npy", lay.post_rows, allow_pickle=False)
        np.save(d / "post_weights.npy", lay.post_weights, allow_pickle=False)
        np.save(d / "valid.npy", lay.valid, allow_pickle=False)
        np.save(d / "idf.npy", index.idf, allow_pickle=False)
        np.save(d / "doc_lengths.npy", index.doc_lengths, allow_pickle=False)
        terms = [""] * index.vocab_size
        for t, i in index.vocabulary.items():
            terms[i] = t
        (d / "vocab.json").write_text(_json.dumps(terms))
        (d / "meta.json").write_text(
            _json.dumps(
                {
                    "head_terms": lay.head_terms,
                    "head_dtype": lay.head_dtype,
                    "num_docs": lay.num_docs,
                    "vocab_size": lay.vocab_size,
                    "avgdl": index.avgdl,
                    "build_s": build_s,
                }
            )
        )
        print(f"# index saved to {d}", file=sys.stderr)
        return

    stats = index.stats()
    print(f"# stats: {stats}", file=sys.stderr)

    t0 = time.perf_counter()
    engine = SparseSearchEngine(
        index,
        device=dev,
        batch_sizes=(args.batch,),
        cache_queries=False,
        topk_mode="exact",
        score_chunk_rows=args.score_chunk_rows,
        narrow_m=args.narrow_m,
        narrow_backend=args.narrow_backend,
    )
    # Index upload, separated from compile: engine construction enqueues
    # the device_put of the head (+ chunks); blocking here isolates the
    # tunnel-transfer term of "warmup" from the compile term below.
    import jax as _jax

    d_idx = engine._dev
    _jax.block_until_ready(
        [c for pair in (d_idx.chunks or []) for c in pair]
        if d_idx.chunks is not None
        else [d_idx.head, d_idx.valid]
    )
    upload_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = engine.search(queries, top_k=args.topk)
    warm_s = time.perf_counter() - t0
    qps = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        res = engine.search(queries, top_k=args.topk)
        qps = max(qps, len(queries) / (time.perf_counter() - t0))

    row = {
        "num_docs": args.docs,
        "vocab_size": stats["vocab_size"],
        "head_terms": stats["head_terms"],
        "head_dtype": stats["head_dtype"],
        "head_mb": round(stats["head_mb"], 1),
        "postings_mb": round(stats["postings_mb"], 1),
        "index_memory_mb": round(stats["memory_mb"], 1),
        "max_tail_df": stats["max_tail_df"],
        "tail_nnz": stats["tail_nnz"],
        "build_s": round(build_s, 2),
        "upload_s": round(upload_s, 1),
        "warmup_s": round(warm_s, 1),
        "qps_exact": round(qps, 1),
        "ms_per_query": round(1000.0 / qps, 3) if qps else None,
        "num_queries": args.queries,
        "batch": args.batch,
        "top_k": args.topk,
        "nonempty": sum(1 for r in res.values() if r),
        "score_chunks": engine.stats().get("score_chunks", 0),
        "device": str(dev),
    }
    if args.note:
        row["note"] = args.note
    if args.narrow_m:
        row["narrow_m"] = args.narrow_m
        row["narrow_backend"] = args.narrow_backend
    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    with open(out_path, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row))


if __name__ == "__main__":
    main()
