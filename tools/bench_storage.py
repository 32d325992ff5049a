#!/usr/bin/env python3
"""Doc-store benchmarks + same-host reference-reader anchor.

Runs osr_tpu's StorageSuite (build/random/sequential/cold-start) on
synthetic and real-prose corpora, and runs the REFERENCE's own
``MemoryMappedCorpus`` reader (/root/reference/tests/memory_mapping.py)
in-process over the same synthetic documents so the committed numbers
compare the two stores on the same machine (the reference's committed
861k docs/s sequential was Apple-M1 over its own tiny synthetic docs —
BASELINE.md). Writes bench_results/storage_real_text.json.

Usage: python tools/bench_storage.py [--docs 2000] [--ref-docs 20000]
"""

import argparse
import importlib.util
import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_suite(text_source: str, num_docs: int) -> dict:
    from osr_tpu.benchmarks.suites import StorageSuite

    suite = StorageSuite(num_docs=num_docs, text_source=text_source)
    suite.setup()
    try:
        out = {}
        for r in suite.run():
            out[r.name] = {
                "passed": bool(r.passed),
                **{k: round(float(v), 4) for k, v in r.metrics.items()},
            }
        return out
    finally:
        suite.cleanup()


def run_reference_anchor(num_docs: int) -> dict:
    """The reference's MemoryMappedCorpus on THIS host, same doc family."""
    path = Path("/root/reference/tests/memory_mapping.py")
    if not path.exists():
        return {"error": "reference not mounted"}
    spec = importlib.util.spec_from_file_location("ref_mm", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)

    from osr_tpu.storage.doc_store import DocumentStore
    from osr_tpu.testing import SyntheticDataGenerator

    gen = SyntheticDataGenerator(seed=42)
    corpus = gen.zipf_corpus(
        num_docs, 50_000, avg_len=130, word_prefix="t", min_len=5
    )
    docs = [
        {"_id": k, "text": v["text"], "title": ""} for k, v in corpus.items()
    ]
    out = {"num_docs": num_docs}
    with tempfile.TemporaryDirectory() as td:
        bp = Path(td) / "corpus.bin"
        t0 = time.perf_counter()
        mod.BinaryCorpusBuilder().build_binary_corpus(docs, bp)
        out["ref_build_docs_per_s"] = round(
            len(docs) / (time.perf_counter() - t0), 1
        )
        r = mod.MemoryMappedCorpus(bp)
        r.get_batch(0, 10)  # warmup
        n = len(docs) // 100 * 100
        t0 = time.perf_counter()
        for i in range(0, n, 100):
            r.get_batch(i, 100)
        out["ref_sequential_docs_per_s"] = round(
            n / (time.perf_counter() - t0), 1
        )

        # osr_tpu over the IDENTICAL documents (apples-to-apples).
        sp = Path(td) / "corpus.osrd"
        t0 = time.perf_counter()
        store = DocumentStore.build_from_corpus(corpus, sp)
        out["osr_build_docs_per_s"] = round(
            len(corpus) / (time.perf_counter() - t0), 1
        )
        t0 = time.perf_counter()
        cnt = sum(1 for _ in store.iter_documents())
        out["osr_sequential_docs_per_s"] = round(
            cnt / (time.perf_counter() - t0), 1
        )
        keys = list(corpus)
        import random

        random.seed(1)
        ids = [keys[random.randrange(len(keys))] for _ in range(5000)]
        store.cache.clear()
        t0 = time.perf_counter()
        got = store.get_documents(ids, num_workers=1)
        out["osr_random_reads_per_s"] = round(
            len(ids) / (time.perf_counter() - t0), 1
        )
        assert all(d is not None for d in got)
        out["osr_vs_ref_sequential"] = round(
            out["osr_sequential_docs_per_s"]
            / out["ref_sequential_docs_per_s"],
            2,
        )
        store.close()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2000)
    ap.add_argument("--ref-docs", type=int, default=20_000)
    ap.add_argument(
        "--out",
        default=str(
            Path(__file__).parents[1]
            / "bench_results"
            / "storage_real_text.json"
        ),
    )
    args = ap.parse_args()

    import jax

    if jax.config.jax_platforms and "axon" in jax.config.jax_platforms:
        jax.config.update("jax_platforms", "cpu")  # host-only benchmark

    result = {
        "synthetic": run_suite("synthetic", args.docs),
        "real": run_suite("real", args.docs),
        "same_host_anchor": run_reference_anchor(args.ref_docs),
        "note": (
            "same_host_anchor runs the reference's MemoryMappedCorpus "
            "reader in-process over the identical synthetic corpus as "
            "osr_tpu's DocumentStore (v2 binary payloads); the "
            "reference's committed 861k docs/s sequential (BASELINE.md) "
            "was Apple-M1 over its own ~100-byte synthetic docs."
        ),
    }
    Path(args.out).write_text(json.dumps(result, indent=1))
    print(json.dumps(result["same_host_anchor"], indent=1))


if __name__ == "__main__":
    main()
