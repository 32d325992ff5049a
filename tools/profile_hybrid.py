#!/usr/bin/env python3
"""Per-stage decomposition of one hybrid (sparse+dense) search batch.

VERDICT r4 weak #1: hybrid fusion runs at ~1.0-1.6k QPS while its legs do
14.7k (sparse) and 10.5k (dense) — ~5x unexplained. This tool times every
stage of the hybrid fast path (registry.HybridRetriever.search) separately
at FiQA shape so the slow term has a name:

  embed         dense query embedding (host, vectorized murmur hash)
  d_dispatch    dense device-step enqueue (async)
  s_encode      sparse tokenize+pad (host)
  s_dispatch    sparse device enqueue + host candidate prework
                (tail postings walk + candidate head scores + tau slack)
  s_fetch       sparse packed top-depth device->host transfer
  s_merge       exact host merge (head top-depth + tail candidates)
  d_collect     dense packed top-depth fetch
  fuse          array fusion (normalize/rrf + dup collapse + top-k)
  assemble      result-dict assembly for the final k
  sparse_dev    sparse device program wall (isolated, blocked)
  dense_dev     dense device program wall (isolated, blocked)

Prints one JSON line; appends to bench_results/hybrid_stages.jsonl.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

NUM_DOCS = 57_638
VOCAB = 100_000
TOP_K = 50
DEPTH = 100
BATCH = 512
REPS = 8


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fusion", choices=("weighted", "rrf"), default="rrf")
    ap.add_argument("--depth", type=int, default=DEPTH)
    args = ap.parse_args()

    from osr_tpu.retrieval.fusion import (
        fuse_topk_arrays,
        fused_rows_to_results,
    )
    from osr_tpu.retrieval.registry import RetrieverRegistry
    from osr_tpu.testing import SyntheticDataGenerator
    from osr_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    corpus = SyntheticDataGenerator(seed=42).zipf_corpus(
        NUM_DOCS, VOCAB, avg_len=130, word_prefix="t", min_len=5
    )
    queries = SyntheticDataGenerator(seed=6).queries(
        BATCH * 2, VOCAB, avg_terms=11, word_prefix="t", min_terms=2
    )
    retr = RetrieverRegistry.create(
        {
            "type": "hybrid",
            "params": {
                "sparse_weight": 0.3,
                "dense_weight": 0.7,
                "fusion_depth": args.depth,
                "fusion": args.fusion,
                "cache_dir": None,
            },
        }
    )
    retr.build_index_from_corpus(corpus)
    sp, de = retr.sparse.engine, retr.dense.engine
    qitems = list(queries.items())[:BATCH]
    texts = [t for _, t in qitems]
    qids = [q for q, _ in qitems]
    depth = args.depth

    # Warm all compiled programs once.
    retr.search(dict(qitems), top_k=TOP_K)

    acc = {}

    def tick(name, t0):
        acc[name] = acc.get(name, 0.0) + (time.perf_counter() - t0)

    doc_ids = sp._doc_ids_object()
    for _ in range(REPS):
        t0 = time.perf_counter()
        vecs = retr.dense.embed_queries(texts)
        tick("embed", t0)
        t0 = time.perf_counter()
        d_handle = de.dispatch_vectors(vecs, depth)
        tick("d_dispatch", t0)
        t0 = time.perf_counter()
        enc = sp.encode_queries(texts)
        tick("s_encode", t0)
        t0 = time.perf_counter()
        s_handle = sp.search_encoded_device(enc, depth)
        tick("s_dispatch", t0)
        # Fetch split out of finish_batch: time the device->host copy of
        # the packed result alone, then hand the fetched array back in.
        import numpy as np

        cand, (packed, cand_head_dev), cand_head, tau_slack = s_handle
        t0 = time.perf_counter()
        packed_np = np.asarray(packed)
        tick("s_fetch", t0)
        from osr_tpu.ops.bm25 import unpack_topk
        from osr_tpu.index.postings import merge_host

        t0 = time.perf_counter()
        head_s, head_r = unpack_topk(packed_np)
        s_scores, s_ids = merge_host(
            head_s, head_r, cand, cand_head,
            sp.index.layout.num_rows, depth, tau_slack=tau_slack,
        )
        tick("s_merge", t0)
        t0 = time.perf_counter()
        d_scores, d_ids = de.collect_vectors(d_handle)
        tick("d_collect", t0)
        t0 = time.perf_counter()
        f_sc, f_ids = fuse_topk_arrays(
            s_scores[:BATCH], s_ids[:BATCH], d_scores, d_ids,
            0.3, 0.7, TOP_K, mode=args.fusion,
        )
        tick("fuse", t0)
        t0 = time.perf_counter()
        fused_rows_to_results(qids, f_sc, f_ids, doc_ids)
        tick("assemble", t0)

    # Isolated device-program walls (enqueue + block, warm).
    import jax

    for _ in range(REPS):
        t0 = time.perf_counter()
        h = sp.search_encoded_device(sp.encode_queries(texts), depth)
        jax.block_until_ready(h[1][0])
        tick("sparse_dev_total", t0)
        t0 = time.perf_counter()
        hd = de.dispatch_vectors(vecs, depth)
        jax.block_until_ready(hd[1])
        tick("dense_dev_total", t0)

    row = {
        "metric": "hybrid_stage_decomposition",
        "fusion": args.fusion,
        "batch": BATCH,
        "depth": depth,
        "top_k": TOP_K,
        "num_docs": NUM_DOCS,
        "ms_per_batch": {
            k: round(v / REPS * 1e3, 2) for k, v in acc.items()
        },
        "host_serial_ms": round(
            sum(
                v
                for k, v in acc.items()
                if k not in ("sparse_dev_total", "dense_dev_total")
            )
            / REPS
            * 1e3,
            2,
        ),
        "device": str(jax.devices()[0]),
    }
    out = (
        Path(__file__).resolve().parent.parent
        / "bench_results/hybrid_stages.jsonl"
    )
    with out.open("a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row, indent=2))


if __name__ == "__main__":
    main()
