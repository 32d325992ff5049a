"""Concurrency stress tests for shared host-side state.

The reference relies on locks around its caches (reference
retrieval.py:123, memory_index.py:43 — SURVEY.md §5.2 notes it ships no
race tests); these stress tests hammer the same structures from many
threads and assert consistency.
"""

import threading

import numpy as np

from osr_tpu.index.builder import SparseIndexBuilder
from osr_tpu.retrieval.engine import SparseSearchEngine
from osr_tpu.storage.doc_store import DocumentStore, LRUCache
from osr_tpu.storage.documents import Document

from tests.reference_impl import zipf_corpus, zipf_queries


def _run_threads(fn, n_threads=8, iterations=50):
    errors = []

    def worker(tid):
        try:
            for i in range(iterations):
                fn(tid, i)
        except Exception as e:  # pragma: no cover - failure reporting
            errors.append(e)

    threads = [
        threading.Thread(target=worker, args=(t,)) for t in range(n_threads)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors


def test_lru_cache_thread_safety():
    cache = LRUCache(max_items=64, max_bytes=1 << 20)

    def op(tid, i):
        key = f"k{(tid * 7 + i) % 100}"
        doc = cache.get(key)
        if doc is not None:
            assert doc.id == key
        cache.put(key, Document(id=key, text="x" * (i % 50 + 1)))

    _run_threads(op)
    assert len(cache) <= 64
    stats = cache.stats()
    assert 0.0 <= stats["hit_rate"] <= 1.0


def test_doc_store_concurrent_reads(tmp_path):
    store = DocumentStore(tmp_path / "s.osrd", create=True, cache_items=16)
    store.add_documents(
        [Document(id=f"d{i}", text=f"text {i} " * 20) for i in range(100)]
    )

    def op(tid, i):
        doc_id = f"d{(tid * 13 + i) % 100}"
        doc = store.get_document(doc_id)
        assert doc is not None and doc.id == doc_id
        assert doc.text.startswith(f"text {doc_id[1:]} ")

    _run_threads(op)
    store.close()


def test_engine_query_cache_concurrent_search():
    corpus = zipf_corpus(num_docs=100, vocab_size=300, avg_len=25)
    queries = list(zipf_queries(20, 300, 4).values())
    index = SparseIndexBuilder().build(corpus)
    engine = SparseSearchEngine(index, query_cache_limit=10)
    baseline = {q: engine.search({"q": q}, top_k=5)["q"] for q in queries}
    engine.clear_cache()

    def op(tid, i):
        q = queries[(tid + i) % len(queries)]
        res = engine.search({"q": q}, top_k=5)["q"]
        assert res == baseline[q]

    _run_threads(op, n_threads=6, iterations=20)
