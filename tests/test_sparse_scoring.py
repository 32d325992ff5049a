"""Correctness-vs-oracle tests for the sparse scoring path.

Pattern follows the reference test strategy (SURVEY.md §4): every optimized
kernel is validated against a naive ground-truth implementation with
absolute + relative tolerances and ranking-overlap checks. Exact score
parity uses head_dtype='f32' (HIGHEST-precision matmul); the quantized
int8/bf16 heads are validated by ranking overlap.
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
    """Score parity for the mostly-postings (head_terms=0 floors at the
    non-positive-IDF prefix), hybrid (64) and default layouts."""
    oracle = DenseOracleScorer(corpus, method=method)
    index = SparseIndexBuilder(
        method=method, head_terms=head_terms, head_dtype="f32"
    ).build(corpus)
    engine = SparseSearchEngine(index)

    texts = list(queries.values())
    got = full_scores(engine, texts)
    for i, text in enumerate(texts):
        want = oracle.score(text).astype(np.float32)
        np.testing.assert_allclose(got[i], want, atol=ATOL, rtol=RTOL)


def test_head_floor_covers_nonpositive_idf(corpus):
    """head_terms=0 must still pull every non-positive-IDF term into the
    head — tail postings weights are strictly positive (exactness of the
    head-topk/candidate merge relies on it)."""
    index = SparseIndexBuilder(
        method="bm25", head_terms=0, head_dtype="f32"
    ).build(corpus)
    f = index.layout.head_terms
    assert f == int(np.searchsorted(index.idf, 0.0, side="right"))
    assert (index.layout.post_weights > 0).all()


def test_search_ranking_matches_oracle(corpus, queries):
    oracle = DenseOracleScorer(corpus, method="bm25")
    index = SparseIndexBuilder(method="bm25", head_dtype="f32").build(corpus)
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


@pytest.mark.parametrize("head_terms", [0, 64, None])
def test_fused_topk_equals_dense_argsort(corpus, queries, head_terms):
    """The fused search step (block top-k + candidate merge) must return
    exactly the top-k of the dense score matrix, across layout splits."""
    index = SparseIndexBuilder(
        method="bm25", head_terms=head_terms, head_dtype="f32"
    ).build(corpus)
    engine = SparseSearchEngine(index)
    texts = list(queries.values())
    dense = engine.score_all(texts)
    k = 10
    scores, rows = engine.search_token_batch(texts, k)
    for i in range(len(texts)):
        want = np.sort(dense[i])[::-1][:k]
        np.testing.assert_allclose(
            np.sort(scores[i])[::-1], want, atol=ATOL, rtol=1e-3
        )
        # membership (modulo exact ties at the boundary)
        got_set = set(rows[i][scores[i] > want[-1] + ATOL].tolist())
        want_set = set(np.argsort(dense[i])[::-1][:k].tolist())
        assert got_set <= want_set


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
    index = SparseIndexBuilder(head_dtype="f32").build(corpus)
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
    index = SparseIndexBuilder(head_dtype="f32").build(corpus)
    engine = SparseSearchEngine(index)
    got = full_scores(engine, ["alpha beta"])
    want = oracle.score("alpha beta").astype(np.float32)
    np.testing.assert_allclose(got[0], want, atol=ATOL, rtol=RTOL)


def _rank_overlap(results_a, results_b, queries):
    """Mean top-k doc-set overlap between two engines' search results."""
    overlaps = []
    for qid in queries:
        a, b = list(results_a[qid]), list(results_b[qid])
        if not a and not b:
            continue
        overlaps.append(len(set(a) & set(b)) / max(len(a), len(b), 1))
    return float(np.mean(overlaps)) if overlaps else 1.0


@pytest.mark.parametrize("quant_dtype", ["bf16", "int8"])
def test_quantized_head_preserves_ranking(corpus, queries, quant_dtype):
    """Quantized heads (the memory-parity modes; int8 is the default) must
    preserve rankings: high top-10 overlap with the exact f32 head, and
    close scores on the intersection."""
    f32 = SparseSearchEngine(
        SparseIndexBuilder(method="bm25", head_dtype="f32").build(corpus)
    )
    q = SparseSearchEngine(
        SparseIndexBuilder(method="bm25", head_dtype=quant_dtype).build(corpus)
    )
    r32 = f32.search(queries, top_k=10)
    rq = q.search(queries, top_k=10)
    assert _rank_overlap(r32, rq, queries) >= 0.95
    # int8 quantization error is ABSOLUTE per-term (column max / 254), so
    # tiny scores can differ wildly in relative terms; accept either bound.
    rel = 2e-2 if quant_dtype == "bf16" else 8e-2
    abs_tol = 1e-3 if quant_dtype == "bf16" else 6e-2
    for qid in queries:
        for doc in set(r32[qid]) & set(rq[qid]):
            assert rq[qid][doc] == pytest.approx(
                r32[qid][doc], rel=rel, abs=abs_tol
            )


def test_approx_topk_mode(corpus, queries):
    """topk_mode='approx' (lax.approx_max_k) keeps high overlap with exact."""
    index = SparseIndexBuilder(method="bm25", head_dtype="f32").build(corpus)
    exact = SparseSearchEngine(index, topk_mode="exact")
    approx = SparseSearchEngine(index, topk_mode="approx")
    re_ = exact.search(queries, top_k=10)
    ra = approx.search(queries, top_k=10)
    assert _rank_overlap(re_, ra, queries) >= 0.9


def test_encode_queries_overflow_raises(corpus):
    index = SparseIndexBuilder().build(corpus)
    engine = SparseSearchEngine(index, batch_sizes=(8,))
    with pytest.raises(ValueError):
        engine.encode_queries(["q"] * 9)
    # score_all chunks internally, so >max-batch is fine there
    out = engine.score_all(["term300"] * 20)
    assert out.shape == (20, index.num_docs)
    np.testing.assert_allclose(out[0], out[19])


def test_chunked_scoring_matches_single_sweep():
    """Row-chunked device scoring (engine ``score_chunk_rows``) returns the
    same results as the single-sweep path on a corpus big enough for
    several chunks — the (B, R) score matrix never exists at full R
    (the 1M-doc B>=2048 HBM-capacity fix, DEVELOPMENT.md)."""
    corpus = zipf_corpus(num_docs=12_000, vocab_size=6_000, avg_len=40)
    queries = zipf_queries(num_queries=48, vocab_size=6_000)
    index = SparseIndexBuilder().build(corpus)
    base = SparseSearchEngine(index, cache_queries=False, score_chunk_rows=0)
    if base.merge_backend != "host":
        pytest.skip("chunked path requires the host merge (native lib)")
    chunked = SparseSearchEngine(
        index, cache_queries=False, score_chunk_rows=4096
    )
    assert chunked._dev.chunks is not None
    assert len(chunked._dev.chunks) == 3
    want = base.search(queries, top_k=20)
    got = chunked.search(queries, top_k=20)
    for qid in queries:
        w, g = want[qid], got[qid]
        # Membership identical except EXACT ties at the k-th boundary
        # (int8 heads produce equal f32 scores; either member is a valid
        # top-k — same contract as any top-k tie).
        kth = min(w.values()) if w else 0.0
        for d in set(g) ^ set(w):
            s = w.get(d, g.get(d))
            assert s == kth, (qid, d, s, kth)
        for d, s in w.items():
            if d in g:
                assert g[d] == s, (qid, d)


def test_chunk_auto_threshold_engages():
    """Auto-chunking triggers exactly when the score matrix would exceed
    the budget, and stays off otherwise."""
    from osr_tpu.retrieval import engine as eng

    corpus = zipf_corpus(num_docs=9_000, vocab_size=4_000, avg_len=30)
    index = SparseIndexBuilder().build(corpus)
    off = SparseSearchEngine(index, cache_queries=False)
    assert off._dev.chunks is None  # small corpus: under budget
    small_budget = eng.SCORE_BUDGET_BYTES
    try:
        eng.SCORE_BUDGET_BYTES = 128 * 1024
        # merge_backend forced to 'host' (not auto) so the chunking
        # assertions run even on hosts without the native extension,
        # where auto falls to 'device' and would skip them vacuously.
        on = SparseSearchEngine(
            index, cache_queries=False, merge_backend="host"
        )
        assert on._dev.chunks is not None
        r = index.layout.num_rows
        got = sum(c[0].shape[0] for c in on._dev.chunks)
        assert got >= r  # chunks cover every row (last one padded)
    finally:
        eng.SCORE_BUDGET_BYTES = small_budget


def test_chunk_auto_shrinks_for_head_residency():
    """The auto-chunker must budget the score chunk against what the
    resident head leaves free of the total HBM search budget, not just
    the fixed score budget (a 9.5 GiB 5M-doc F=4096 int4 head + a
    6 GiB-budgeted chunk RESOURCE_EXHAUSTED the chip —
    bench_results/tpu_evidence_scale5m.log)."""
    from osr_tpu.retrieval import engine as eng

    # Big enough that (B_max, R) f32 = 512 x ~41k x 4 B ~ 84 MB exceeds
    # the 64 MB minimum chunk budget the floor guarantees.
    corpus = zipf_corpus(num_docs=40_000, vocab_size=8_000, avg_len=30)
    index = SparseIndexBuilder().build(corpus)
    head_bytes = index.layout.head.nbytes
    saved = (eng.SCORE_BUDGET_BYTES, eng.HBM_SEARCH_BUDGET_BYTES)
    try:
        # Score budget alone would NOT chunk this corpus; a total budget
        # the head nearly fills must force chunking anyway.
        eng.SCORE_BUDGET_BYTES = 1 << 40
        eng.HBM_SEARCH_BUDGET_BYTES = head_bytes + (1 << 20)
        # Forced host merge: the budget logic must always be exercised
        # (auto merge falls to 'device' without the native extension and
        # disables chunking, passing this test vacuously — ADVICE r4).
        on = SparseSearchEngine(
            index, cache_queries=False, merge_backend="host"
        )
        max_b = on.batch_sizes[-1]
        assert max_b * index.layout.num_rows * 4 > (64 << 20)
        assert on._dev.chunks is not None
        got = sum(c[0].shape[0] for c in on._dev.chunks)
        assert got >= index.layout.num_rows
    finally:
        eng.SCORE_BUDGET_BYTES, eng.HBM_SEARCH_BUDGET_BYTES = saved


def test_chunk_budget_counts_xla_int4_transient():
    """The XLA int4 fallback materializes a transient (Rc, F) bf16
    unpacked head copy per chunk (ops/bm25.py:head_scores); the
    auto-chunker must budget it, not just the (B, Rc) f32 score slab
    (r4 advisor finding). With the transient counted, the same budget
    must produce SMALLER chunks for an int4+XLA engine than the
    f32-slab-only model would."""
    from osr_tpu.retrieval import engine as eng

    corpus = zipf_corpus(num_docs=40_000, vocab_size=8_000, avg_len=30)
    index = SparseIndexBuilder(head_dtype="int4").build(corpus)
    f = index.layout.head_terms
    saved = (eng.SCORE_BUDGET_BYTES, eng.HBM_SEARCH_BUDGET_BYTES)
    try:
        eng.SCORE_BUDGET_BYTES = 64 << 20
        eng.HBM_SEARCH_BUDGET_BYTES = 1 << 40
        on = SparseSearchEngine(
            index,
            cache_queries=False,
            merge_backend="host",
            head_backend="xla",
        )
        assert on._dev.chunks is not None
        max_b = on.batch_sizes[-1]
        rows_old_model = max((64 << 20) // (4 * max_b), 4096)
        rows_new_model = max((64 << 20) // (4 * max_b + 2 * f), 4096)
        got_rows = on._dev.chunks[0][0].shape[0]
        assert rows_new_model < rows_old_model
        # Chunk rows are equalized and row-aligned upward, but must stay
        # at/below the transient-aware bound's scale, not the old one.
        assert got_rows < rows_old_model
    finally:
        eng.SCORE_BUDGET_BYTES, eng.HBM_SEARCH_BUDGET_BYTES = saved


def test_cand_filter_bit_identical(corpus, queries):
    """The exact tau candidate filter (postings.filter_candidates_by_tau,
    engine cand_filter_per_query) must be invisible: identical scores,
    rows, and tie order vs the unfiltered host-merge path, across head
    widths that put most postings in the tail."""
    for head_terms in (32, 128):
        index = SparseIndexBuilder(head_terms=head_terms).build(corpus)
        base = SparseSearchEngine(
            index, cache_queries=False, merge_backend="host",
            cand_filter_per_query=0,
        )
        filt = SparseSearchEngine(
            index, cache_queries=False, merge_backend="host",
            cand_filter_per_query=1,  # force the deferred+filtered path
        )
        r0 = base.search(queries, top_k=10)
        r1 = filt.search(queries, top_k=10)
        assert set(r0) == set(r1)
        for qid in r0:
            assert list(r0[qid].keys()) == list(r1[qid].keys())
            assert np.allclose(
                list(r0[qid].values()), list(r1[qid].values()),
                rtol=0, atol=0,
            )
