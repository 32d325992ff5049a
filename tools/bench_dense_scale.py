#!/usr/bin/env python3
"""Dense retrieval at corpus scale: int8 vs int4, memory + QPS.

Mirrors the sparse scaling table for the dense engine (the reference
has no dense-at-scale numbers at all — its int8 path was 0.19x fp32,
BASELINE.md). Embeddings are quantized on the HOST (ops/quantize.py
NumPy twins) and shipped via ``DenseSearchEngine.from_quantized`` so
only packed bytes cross the tunnel: at 1M x 768 that is 0.77 GB (int8)
or 0.38 GB (int4) instead of 3 GB of fp32.

The similarity matrix is (B, N) f32 on device, so the batch size bounds
HBM: B=1024 at 1M docs is 4 GiB of scores + the packed corpus. Appends
JSON lines to bench_results/dense_scaling.jsonl.

Usage: python tools/bench_dense_scale.py [--docs 1000000] [--batch 1024]
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--topk", type=int, default=50)
    ap.add_argument("--passes", type=int, default=5)
    ap.add_argument(
        "--modes", default="symmetric,int4",
        help="comma list of quantization modes to measure",
    )
    ap.add_argument("--backend", default="pallas", choices=("pallas", "xla"))
    ap.add_argument(
        "--score-chunk-rows",
        type=int,
        default=None,
        help="row-chunked scoring: bounds the (B, N) f32 similarity "
        "matrix on device (from_quantized score_chunk_rows)",
    )
    ap.add_argument(
        "--out",
        default=str(
            Path(__file__).parents[1]
            / "bench_results"
            / "dense_scaling.jsonl"
        ),
    )
    ap.add_argument(
        "--cpu",
        action="store_true",
        help="force the CPU platform (config-level: the TPU-tunnel "
        "sitecustomize overrides JAX_PLATFORMS env vars)",
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from osr_tpu.ops import quantize as qz
    from osr_tpu.retrieval.engine import DenseSearchEngine
    from osr_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    # Clustered unit-norm embeddings, generated in chunks to bound the
    # transient fp32 working set (final matrix is docs x dim fp32 in host
    # RAM — 3 GB at 1M x 768; the device only ever sees packed bytes).
    from osr_tpu.index.dense import synthetic_corpus_embeddings

    t0 = time.perf_counter()
    chunk = 250_000
    parts = [
        synthetic_corpus_embeddings(
            min(chunk, args.docs - i), dim=args.dim, seed=42 + i // chunk
        )
        for i in range(0, args.docs, chunk)
    ]
    emb = np.concatenate(parts) if len(parts) > 1 else parts[0]
    del parts
    gen_s = time.perf_counter() - t0
    print(f"# generated {emb.shape} in {gen_s:.1f}s", file=sys.stderr)
    queries = emb[: args.batch].copy()
    doc_ids = [str(i) for i in range(args.docs)]

    out_path = Path(args.out)
    for mode in args.modes.split(","):
        t0 = time.perf_counter()
        if mode == "symmetric":
            rows, scales = qz.quantize_symmetric_np(emb)
        elif mode == "int4":
            rows, scales = qz.quantize_symmetric_int4_np(emb)
        else:
            raise SystemExit(f"unsupported mode {mode}")
        quant_s = time.perf_counter() - t0
        packed_mb = (rows.nbytes + scales.nbytes) / 2**20

        t0 = time.perf_counter()
        eng = DenseSearchEngine.from_quantized(
            doc_ids, rows, scales, quantization=mode, device=dev,
            backend=args.backend, score_chunk_rows=args.score_chunk_rows,
        )
        upload_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        s, i = eng.search_vectors(queries, top_k=args.topk)
        warmup_s = time.perf_counter() - t0
        assert s.shape == (args.batch, args.topk)
        qps_passes = []
        for _ in range(args.passes):
            t0 = time.perf_counter()
            eng.search_vectors(queries, top_k=args.topk)
            qps_passes.append(
                round(args.batch / (time.perf_counter() - t0), 1)
            )
        row = {
            "metric": "dense_qps_at_scale",
            "num_docs": args.docs,
            "dim": args.dim,
            "quantization": mode,
            "backend": args.backend,
            "batch": args.batch,
            "score_chunk_rows": args.score_chunk_rows,
            "top_k": args.topk,
            "packed_corpus_mb": round(packed_mb, 1),
            "host_quantize_s": round(quant_s, 2),
            "upload_s": round(upload_s, 2),
            "warmup_s": round(warmup_s, 2),
            "qps": float(np.median(qps_passes)),
            "qps_passes": qps_passes,
            "device": str(dev),
        }
        print(json.dumps(row))
        with open(out_path, "a") as fh:
            fh.write(json.dumps(row) + "\n")
        del eng, rows


if __name__ == "__main__":
    main()
