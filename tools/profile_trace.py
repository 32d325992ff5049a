#!/usr/bin/env python3
"""Capture a jax.profiler trace of the fused search step.

Produces a TensorBoard-compatible trace directory (xplane protos) covering
N steady-state search batches — per-op device timings, HBM traffic and
fusion boundaries, complementing the wall-clock bisection in
tools/profile_device.py / DEVELOPMENT.md. View with
``tensorboard --logdir <out>`` or xprof.

The remote-TPU tunnel used in this environment may not export device
traces; the tool still captures host-side TraceMe spans in that case and
says so. Reference analogue: the reference only suggests cProfile
(reference README.md:557-566); this is the TPU-native equivalent.

Usage: python tools/profile_trace.py [--docs 57638] [--batch 2048]
       [--out /tmp/osr_tpu_trace]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=57_638)
    ap.add_argument("--vocab", type=int, default=100_000)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--topk", type=int, default=50)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--out", default="/tmp/osr_tpu_trace")
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
    queries = gen.queries(
        args.batch, args.vocab, avg_terms=11, word_prefix="t", min_terms=2
    )
    index = SparseIndexBuilder(method="bm25").build(corpus)
    engine = SparseSearchEngine(
        index, device=dev, batch_sizes=(args.batch,), cache_queries=False
    )
    engine.search(queries, top_k=args.topk)  # compile + warm

    os.makedirs(args.out, exist_ok=True)
    try:
        with jax.profiler.trace(args.out):
            for i in range(args.passes):
                with jax.profiler.TraceAnnotation(f"search_pass_{i}"):
                    t0 = time.perf_counter()
                    engine.search(queries, top_k=args.topk)
                    dt = time.perf_counter() - t0
                print(
                    f"# pass {i}: {args.batch / dt:.0f} QPS", file=sys.stderr
                )
    except Exception as e:  # pragma: no cover - platform dependent
        print(f"# trace capture failed on this platform: {e}", file=sys.stderr)
        sys.exit(1)

    captured = []
    for root, _dirs, files in os.walk(args.out):
        captured += [os.path.join(root, f) for f in files]
    print(f"# wrote {len(captured)} trace files under {args.out}")
    for f in captured[:8]:
        print(f"#   {f}")
    if not any("xplane" in f for f in captured):
        print(
            "# note: no device xplane captured (remote-tunnel platform); "
            "host TraceMe spans only"
        )


if __name__ == "__main__":
    main()
