#!/usr/bin/env python3
"""Head-dtype ranking quality at corpus scale, on the real chip.

tests/test_int4.py proves the int4 head's ranking agreement at toy scale
(800 docs); this measures it where it matters — the scaling-benchmark
corpus shape (250k docs, 400k vocab, same Zipf statistics as
bench_results/scaling.jsonl) — by building the SAME corpus with f32,
int8 and int4 heads at a PINNED head width (so only the quantization
changes, not the head/tail split) and comparing rankings query-by-query
against the exact f32 head:

- overlap@10 / overlap@50: mean fraction of the f32 top-k retrieved
- score MAE on the f32 top-50 (absolute, and relative to the top-1)

Appends one JSON line per dtype to bench_results/int4_quality.jsonl.
Reference analogue: the quantization retrieval-impact suite
(reference tests/embedding_quantizations.py:398-462) applied to the
sparse head instead of dense embeddings.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

NUM_DOCS = 250_000
VOCAB = 400_000
NUM_QUERIES = 2_048
HEAD_TERMS = 2_048
TOP_K = 50


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/osr_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from osr_tpu.index.builder import SparseIndexBuilder
    from osr_tpu.retrieval.engine import SparseSearchEngine
    from osr_tpu.testing import SyntheticDataGenerator

    gen = SyntheticDataGenerator(seed=42)
    corpus = gen.zipf_corpus(
        NUM_DOCS, VOCAB, avg_len=130, word_prefix="t", min_len=5
    )
    queries = gen.queries(
        NUM_QUERIES, VOCAB, avg_terms=11, word_prefix="t", min_terms=2
    )

    results = {}
    rows = []
    for dtype in ("f32", "int8", "int4"):
        t0 = time.perf_counter()
        index = SparseIndexBuilder(
            method="bm25", head_terms=HEAD_TERMS, head_dtype=dtype
        ).build(corpus)
        build_s = time.perf_counter() - t0
        engine = SparseSearchEngine(
            index,
            batch_sizes=(NUM_QUERIES,),
            cache_queries=False,
            topk_mode="exact",
        )
        res = engine.search(queries, top_k=TOP_K)
        results[dtype] = {
            qid: list(r.items()) for qid, r in res.items()
        }
        del engine, index
        print(f"# {dtype}: built {build_s:.1f}s, searched", file=sys.stderr)

    truth = results["f32"]
    out = (
        Path(__file__).resolve().parent.parent
        / "bench_results/int4_quality.jsonl"
    )
    with out.open("a") as f:
        for dtype in ("int8", "int4"):
            o10, o50, maes, rel = [], [], [], []
            for qid, t_items in truth.items():
                if not t_items:
                    continue
                t_ids = [d for d, _ in t_items]
                t_scores = dict(t_items)
                got = dict(results[dtype].get(qid, []))
                o10.append(
                    len(set(t_ids[:10]) & set(list(got)[:10])) / 10.0
                )
                o50.append(
                    len(set(t_ids) & set(got)) / float(len(t_ids))
                )
                common = [d for d in t_ids if d in got]
                if common and t_items:
                    err = np.mean(
                        [abs(got[d] - t_scores[d]) for d in common]
                    )
                    maes.append(err)
                    top1 = abs(t_items[0][1]) or 1.0
                    rel.append(err / top1)
            row = {
                "metric": "head_dtype_ranking_quality",
                "head_dtype": dtype,
                "vs": "f32 exact head (same corpus, same head width)",
                "num_docs": NUM_DOCS,
                "vocab_size": VOCAB,
                "head_terms": HEAD_TERMS,
                "num_queries": len(o10),
                "top_k": TOP_K,
                "overlap_at_10": round(float(np.mean(o10)), 4),
                "overlap_at_50": round(float(np.mean(o50)), 4),
                "score_mae_on_f32_top50": round(float(np.mean(maes)), 5),
                "score_mae_rel_top1": round(float(np.mean(rel)), 5),
                "device": str(jax.devices()[0]),
            }
            rows.append(row)
            f.write(json.dumps(row) + "\n")
            print(json.dumps(row))


if __name__ == "__main__":
    main()
