#!/usr/bin/env python3
"""Per-stage host/device timing at corpus scale, from a saved index.

Times each pipeline stage of one batch independently (encode, tail walk,
candidate head-dot, device step incl. fetch, merge) plus the pipelined
end-to-end search — the data that decides where pruning/parallelism pays
at the 1M-doc scale (VERDICT r2 items 2 and 5).

Usage:
  python tools/bench_scaling.py --docs 1000000 --save-index /tmp/idx1m
  python tools/profile_stages_1m.py --load-index /tmp/idx1m --batch 2048
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--load-index", required=True)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--queries", type=int, default=2048)
    ap.add_argument("--topk", type=int, default=50)
    ap.add_argument("--vocab", type=int, default=400_000)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/osr_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import json as _json
    from pathlib import Path

    from osr_tpu.index.builder import SparseIndex
    from osr_tpu.index.layout import HybridLayout
    from osr_tpu.retrieval.engine import SparseSearchEngine
    from osr_tpu.testing import SyntheticDataGenerator

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
    print(f"# loaded: {index.num_docs} docs, F={layout.head_terms}",
          file=sys.stderr)

    gen = SyntheticDataGenerator(seed=42)
    queries = gen.queries(
        args.queries, args.vocab, avg_terms=11, word_prefix="t", min_terms=2
    )
    texts = list(queries.values())[: args.batch]

    engine = SparseSearchEngine(
        index,
        batch_sizes=(args.batch,),
        cache_queries=False,
        topk_mode="exact",
    )
    print(f"# chunks: {engine.stats().get('score_chunks', 0)}",
          file=sys.stderr)
    engine.search(dict(list(queries.items())[: args.batch]), top_k=args.topk)

    from osr_tpu.index.postings import (
        cand_head_scores_host, merge_host, merge_tau_slack,
    )
    from osr_tpu.ops.bm25 import unpack_topk

    def t(f):
        t0 = time.perf_counter()
        out = f()
        return out, (time.perf_counter() - t0) * 1e3

    stats = {}
    enc, stats["encode_ms"] = t(lambda: engine.encode_queries(texts))
    cand, stats["tail_walk_ms"] = t(
        lambda: engine._tail_candidates(enc, enc.head_ids.shape[0])
    )
    stats["cand_total"] = cand.total
    stats["cand_per_query"] = round(cand.total / len(texts), 1)
    cand_head, stats["cand_head_dot_ms"] = t(
        lambda: cand_head_scores_host(
            # The engine's HOST head view (int4 heads are pre-unpacked
            # to the int8 values the device sees).
            engine._host_head, engine._host_head_dtype,
            layout.head_scales, cand,
            enc.head_flat_ids, enc.head_flat_counts, enc.head_ptr,
            head_t=engine._head_t,
        )
    )
    handle, stats["dispatch_ms"] = t(
        lambda: engine.search_encoded_device(enc, args.topk)
    )
    # note: dispatch includes the host stages above internally (fresh
    # compute) — fetch isolates device+tunnel wait.
    packed_np, stats["device_fetch_ms"] = t(
        lambda: np.asarray(handle[1][0])
    )
    hs, hr = unpack_topk(packed_np)
    _, stats["merge_ms"] = t(
        lambda: merge_host(
            hs, hr, cand, cand_head, layout.num_rows, args.topk,
            tau_slack=merge_tau_slack(
                engine._slack_per_term, enc.head_flat_ids,
                enc.head_flat_counts, enc.head_ptr,
            ),
        )
    )

    sub = dict(list(queries.items())[: args.batch])
    best = float("inf")
    for _ in range(2):
        _, ms = t(lambda: engine.search(sub, top_k=args.topk))
        best = min(best, ms)
    stats["search_e2e_ms"] = round(best, 1)
    stats["qps"] = round(len(sub) / best * 1e3, 1)
    for k, v in stats.items():
        if isinstance(v, float):
            stats[k] = round(v, 1)
    print(stats)


if __name__ == "__main__":
    main()
