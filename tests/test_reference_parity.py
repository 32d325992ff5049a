"""Head-to-head parity against the REFERENCE implementation, in-process.

Imports the reference's ``OptimizedRetriever`` from /root/reference
(rag_system/pipeline/evaluate_rag_pipeline.py:162-479 — numba is absent in
this environment, so its NumPy fallback scoring path :377-402 runs), builds
it on the identical synthetic corpus, and asserts ranking + score parity
with the TPU engine. This is the strongest quality-parity evidence
available without network/datasets: the two systems score the same corpus
with their own tokenizers, IDF and saturation code.
"""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

from osr_tpu.index.builder import SparseIndexBuilder
from osr_tpu.retrieval.engine import SparseSearchEngine

from tests.reference_impl import zipf_corpus, zipf_queries

REFERENCE_PIPELINE = Path(
    "/root/reference/rag_system/pipeline/evaluate_rag_pipeline.py"
)

pytestmark = pytest.mark.skipif(
    not REFERENCE_PIPELINE.exists(), reason="reference repo not mounted"
)


def load_reference_module():
    spec = importlib.util.spec_from_file_location(
        "reference_evaluate_rag_pipeline", REFERENCE_PIPELINE
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def reference_mod():
    return load_reference_module()


@pytest.fixture(scope="module")
def corpus():
    return zipf_corpus(num_docs=800, vocab_size=3000, avg_len=70)


@pytest.fixture(scope="module")
def queries():
    return zipf_queries(num_queries=40, vocab_size=3000, terms_per_query=7)


def build_reference_retriever(reference_mod, method, corpus, tmp_path,
                              monkeypatch):
    # The reference writes .rag_cache into the CWD; keep it in tmp.
    monkeypatch.chdir(tmp_path)
    hardware = {"avx2": False, "cores": 1, "threads": 1, "memory_gb": 8}
    r = reference_mod.OptimizedRetriever(
        {"type": method, "params": {"k1": 1.2, "b": 0.75}}, hardware
    )
    r.use_cache = False  # deterministic: no .rag_cache probe
    r.query_cache = None
    r.build_index_from_corpus(corpus)
    return r


@pytest.mark.parametrize("method", ["bm25", "tfidf"])
def test_topk_matches_reference_engine(
    reference_mod, corpus, queries, method, tmp_path, monkeypatch
):
    ref = build_reference_retriever(
        reference_mod, method, corpus, tmp_path, monkeypatch
    )
    index = SparseIndexBuilder(method=method, head_dtype="f32").build(corpus)
    engine = SparseSearchEngine(index, cache_queries=False)

    k = 10
    ref_results = ref.search(queries, top_k=k)
    got_results = engine.search(queries, top_k=k)

    tol = 5e-3
    n_nonempty = 0
    for qid in queries:
        ref_r = ref_results[qid]
        got_r = got_results[qid]
        # Membership: identical, except documents whose score ties the k-th
        # boundary within the cross-implementation tolerance (those can
        # legitimately swap in/out of the top-k).
        diff = set(got_r.keys()) ^ set(ref_r.keys())
        if diff:
            kth = min(ref_r.values()) if ref_r else 0.0
            for doc_id in diff:
                s = ref_r.get(doc_id, got_r.get(doc_id))
                assert abs(s - kth) < tol, (qid, doc_id, s, kth)
        if ref_r:
            n_nonempty += 1
        for doc_id, s in ref_r.items():
            if doc_id in got_r:
                assert got_r[doc_id] == pytest.approx(
                    s, abs=1e-3, rel=1e-3
                ), (qid, doc_id)
        # Rank order identical wherever the reference scores are separated
        # by more than the cross-implementation score tolerance (pairs
        # closer than that can legitimately swap). Restricted to the common
        # documents (boundary swaps handled above).
        common = set(ref_r) & set(got_r)
        ref_order = sorted(common, key=lambda d: -ref_r[d])
        got_order = sorted(common, key=lambda d: -got_r[d])
        ref_s = np.asarray([ref_r[d] for d in ref_order])
        well_separated = np.diff(ref_s) < -5e-3
        run_matches = True
        for i, sep in enumerate(well_separated):
            if not sep:
                run_matches = True  # inside a near-tie run: order free
                continue
            # Boundary between separated runs: the PREFIX SETS must agree.
            if set(ref_order[: i + 1]) != set(got_order[: i + 1]):
                raise AssertionError((qid, i, ref_order, got_order))
    assert n_nonempty > len(queries) // 2  # the comparison wasn't vacuous


def test_int8_default_close_to_reference(
    reference_mod, corpus, queries, tmp_path, monkeypatch
):
    """The production int8 head keeps >=95% top-10 agreement with the
    reference's exact CPU scoring."""
    ref = build_reference_retriever(
        reference_mod, "bm25", corpus, tmp_path, monkeypatch
    )
    index = SparseIndexBuilder(method="bm25", head_dtype="int8").build(corpus)
    engine = SparseSearchEngine(index, cache_queries=False)
    ref_results = ref.search(queries, top_k=10)
    got_results = engine.search(queries, top_k=10)
    overlaps = []
    for qid in queries:
        a, b = set(ref_results[qid]), set(got_results[qid])
        if not a and not b:
            continue
        overlaps.append(len(a & b) / max(len(a), len(b), 1))
    assert np.mean(overlaps) >= 0.95, np.mean(overlaps)
