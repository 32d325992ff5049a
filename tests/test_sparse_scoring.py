"""Correctness-vs-oracle tests for the sparse scoring path.

Pattern follows the reference test strategy (SURVEY.md §4): every optimized
kernel is validated against a naive ground-truth implementation with
absolute + relative tolerances and ranking-overlap checks.
"""

import numpy as np
import pytest

from osr_tpu.index.builder import SparseIndexBuilder
from osr_tpu.retrieval.engine import SparseSearchEngine

from tests.reference_impl import DenseOracleScorer, zipf_corpus, zipf_queries

ATOL = 1e-3  # reference tests/bm25_performance.py uses np.allclose(atol=1e-3)
RTOL = 1e-4


@pytest.fixture(scope="module")
def corpus():
    return zipf_corpus(num_docs=300, vocab_size=800, avg_len=60)


@pytest.fixture(scope="module")
def queries():
    return zipf_queries(num_queries=25, vocab_size=800, terms_per_query=6)


def full_scores(engine, texts):
    """Dense (B, N) score matrix via the device path."""
    return engine.score_all(texts)


@pytest.mark.parametrize("method", ["bm25", "tfidf"])
@pytest.mark.parametrize("head_terms", [None, 0, 64])
def test_scores_match_oracle(corpus, queries, method, head_terms):
    """Score parity for the pure-dense (head covers all), pure-sparse
    (head_terms=0) and hybrid (head_terms=64) layouts."""
    oracle = DenseOracleScorer(corpus, method=method)
    index = SparseIndexBuilder(method=method, head_terms=head_terms).build(
        corpus
    )
    engine = SparseSearchEngine(index)

    texts = list(queries.values())
    got = full_scores(engine, texts)
    for i, text in enumerate(texts):
        want = oracle.score(text).astype(np.float32)
        np.testing.assert_allclose(got[i], want, atol=ATOL, rtol=RTOL)


def test_search_ranking_matches_oracle(corpus, queries):
    oracle = DenseOracleScorer(corpus, method="bm25")
    index = SparseIndexBuilder(method="bm25").build(corpus)
    engine = SparseSearchEngine(index)
    results = engine.search(queries, top_k=10)

    for qid, text in queries.items():
        want_idx, want_scores = oracle.topk(text, 10)
        got = results[qid]
        # positive-score results only, like the reference
        want = {
            oracle.doc_ids[i]: s
            for i, s in zip(want_idx, want_scores)
            if s > 0
        }
        assert set(got.keys()) == set(want.keys()), qid
        for doc_id, s in want.items():
            assert got[doc_id] == pytest.approx(s, abs=ATOL, rel=1e-3)


def test_search_api_edge_cases(corpus):
    index = SparseIndexBuilder().build(corpus)
    engine = SparseSearchEngine(index)
    # Rare terms: very common Zipf terms get negative Robertson IDF and are
    # (correctly, like the reference) filtered by the score>0 rule.
    res = engine.search(
        {"empty": "", "ws": "   ", "oov": "zzzzz qqqqq", "ok": "term300 term450"},
        top_k=5,
    )
    assert res["empty"] == {}
    assert res["ws"] == {}
    assert res["oov"] == {}  # no in-vocab terms -> no positive scores
    assert len(res["ok"]) > 0


def test_query_cache_hit(corpus):
    index = SparseIndexBuilder().build(corpus)
    engine = SparseSearchEngine(index)
    r1 = engine.search({"a": "term1 term3"}, top_k=5)
    assert len(engine._query_cache) == 1
    r2 = engine.search({"b": "term1 term3"}, top_k=5)
    assert r1["a"] == r2["b"]


def test_duplicate_query_terms_accumulate(corpus):
    oracle = DenseOracleScorer(corpus, method="bm25")
    index = SparseIndexBuilder().build(corpus)
    engine = SparseSearchEngine(index)
    got = full_scores(engine, ["term1 term1 term1 term5"])
    want = oracle.score("term1 term1 term1 term5").astype(np.float32)
    np.testing.assert_allclose(got[0], want, atol=ATOL, rtol=RTOL)


def test_empty_and_tiny_docs():
    corpus = {
        "d0": {"text": ""},
        "d1": {"text": "alpha"},
        "d2": {"text": "alpha beta gamma " * 50},
    }
    oracle = DenseOracleScorer(corpus, method="bm25")
    index = SparseIndexBuilder().build(corpus)
    engine = SparseSearchEngine(index)
    got = full_scores(engine, ["alpha beta"])
    want = oracle.score("alpha beta").astype(np.float32)
    np.testing.assert_allclose(got[0], want, atol=ATOL, rtol=RTOL)


def test_bf16_head_preserves_ranking(corpus, queries):
    """head_dtype='bf16' halves head memory; rankings must match f32."""
    index = SparseIndexBuilder(method="bm25").build(corpus)
    f32 = SparseSearchEngine(index, head_dtype="f32")
    bf16 = SparseSearchEngine(index, head_dtype="bf16")
    r32 = f32.search(queries, top_k=10)
    r16 = bf16.search(queries, top_k=10)
    for qid in queries:
        ids32, ids16 = list(r32[qid]), list(r16[qid])
        if not ids32 and not ids16:
            continue  # all scores <= 0: both correctly empty
        overlap = len(set(ids32) & set(ids16)) / max(len(ids32), 1)
        assert overlap >= 0.9, (qid, overlap)
        for doc in set(ids32) & set(ids16):
            assert r16[qid][doc] == pytest.approx(r32[qid][doc], rel=2e-2)


def test_encode_queries_overflow_raises(corpus):
    index = SparseIndexBuilder().build(corpus)
    engine = SparseSearchEngine(index, batch_sizes=(8,))
    with pytest.raises(ValueError):
        engine.encode_queries(["q"] * 9)
    # score_all chunks internally, so >max-batch is fine there
    out = engine.score_all(["term300"] * 20)
    assert out.shape == (20, index.num_docs)
    np.testing.assert_allclose(out[0], out[19])
