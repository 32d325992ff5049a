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


def run_codec_comparison(num_docs: int) -> dict:
    """zlib vs zstd vs dict-trained zstd on the SAME real-prose docs."""
    import random

    from osr_tpu.benchmarks.suites import real_prose_paragraphs
    from osr_tpu.storage.doc_store import DocumentStore
    from osr_tpu.storage.documents import Document

    import numpy as np

    paras = real_prose_paragraphs()
    if not paras:
        return {"error": "no real prose available"}
    rng = np.random.RandomState(42)
    docs = [
        Document(
            id=f"d{i}",
            text="\n\n".join(
                paras[j]
                for j in rng.randint(0, len(paras), int(rng.randint(1, 5)))
            ),
            title=f"Title {i}",
        )
        for i in range(num_docs)
    ]
    random.seed(1)
    read_ids = [f"d{random.randrange(num_docs)}" for _ in range(5000)]

    def measure(store_kwargs, train_dict=False):
        with tempfile.TemporaryDirectory() as td:
            sp = Path(td) / "c.osrd"
            t0 = time.perf_counter()
            store = DocumentStore(sp, create=True, **store_kwargs)
            store.add_documents(docs)
            build_s = time.perf_counter() - t0
            if train_dict:
                t0 = time.perf_counter()
                store.optimize(train_dict=True)
                opt_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            cnt = sum(1 for _ in store.iter_documents())
            scan_s = time.perf_counter() - t0
            store.cache.clear()
            store.cache.max_items = 0
            t0 = time.perf_counter()
            for i in read_ids:
                store.get_document(i)
            rnd_s = time.perf_counter() - t0
            stats = store.get_stats()
            out = {
                "build_docs_per_s": round(len(docs) / build_s, 1),
                "sequential_docs_per_s": round(cnt / scan_s, 1),
                "random_reads_per_s": round(len(read_ids) / rnd_s, 1),
                "compression_ratio": round(stats["compression_ratio"], 3),
                "file_mb": round(stats["file_bytes"] / 2**20, 2),
            }
            if train_dict:
                out["optimize_s"] = round(opt_s, 2)
            store.close()
            return out

    out = {
        "num_docs": num_docs,
        "zlib_l1_default": measure({}),
        "zstd_l1": measure({"codec": "zstd"}),
        "zstd_l3": measure({"codec": "zstd", "compress_level": 3}),
        "zstd_dict_l3": measure(
            {"codec": "zstd", "compress_level": 3}, train_dict=True
        ),
        "note": (
            "identical real-prose documents; zstd_dict rows ingest at "
            "level 3 then optimize(train_dict=True) — the dictionary "
            "persists in the v3 footer. The resampled corpus reuses "
            "paragraphs across documents, which the dictionary captures "
            "(realistic for boilerplate-heavy corpora but flattering); "
            "the *_unique_text rows use every paragraph at most once "
            "and are the honest lower bound."
        ),
    }

    # Unique-text corpus: each chunk appears exactly once, so the
    # dictionary can only learn sub-record patterns, not whole repeats.
    # Harvested from broader offline prose (site-packages + stdlib docs)
    # because real_prose_paragraphs()'s reference-repo pool is small.
    seen = set()
    chunks = []
    roots = (
        Path("/opt/venv/lib/python3.12/site-packages"),
        Path("/usr/lib/python3.12"),
        Path("/root/reference"),
    )
    for root in roots:
        if len(chunks) >= num_docs or not root.exists():
            break
        for p in sorted(root.rglob("*.md")) + sorted(root.rglob("*.rst")):
            try:
                words = p.read_text(encoding="utf-8").split()
            except (UnicodeDecodeError, OSError):
                continue
            for s in range(0, max(len(words) - 60, 0) + 1, 120):
                w = " ".join(words[s : s + 120])
                if len(w) < 300 or w in seen:
                    continue
                seen.add(w)
                chunks.append(w)
                if len(chunks) >= num_docs:
                    break
            if len(chunks) >= num_docs:
                break
    uniq = [
        Document(id=f"u{i}", text=t, title="") for i, t in enumerate(chunks)
    ]
    saved_docs, saved_ids = docs, read_ids
    try:
        docs = uniq
        num_docs_u = len(uniq)
        random.seed(1)
        read_ids = [f"u{random.randrange(num_docs_u)}" for _ in range(5000)]
        out["num_docs_unique_text"] = num_docs_u
        out["zlib_l1_unique_text"] = measure({})
        out["zstd_dict_l3_unique_text"] = measure(
            {"codec": "zstd", "compress_level": 3}, train_dict=True
        )
    finally:
        docs, read_ids = saved_docs, saved_ids
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
        "codec_comparison": run_codec_comparison(args.docs),
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
