"""Index cache round-trip tests (fast packed path + re-pack path)."""

import numpy as np
import pytest

from osr_tpu.index.builder import SparseIndexBuilder
from osr_tpu.index.cache import load_index, load_or_build, save_index, cache_path, corpus_fingerprint
from osr_tpu.retrieval.engine import SparseSearchEngine

from tests.reference_impl import DenseOracleScorer, zipf_corpus, zipf_queries


@pytest.fixture(scope="module")
def corpus():
    return zipf_corpus(num_docs=150, vocab_size=400, avg_len=30)


def _results(index, queries):
    return SparseSearchEngine(index, cache_queries=False).search(queries, top_k=8)


def test_packed_roundtrip_identical(corpus, tmp_path):
    queries = zipf_queries(10, 400, 5)
    builder = SparseIndexBuilder(method="bm25", keep_raw_rows=True)
    index = builder.build(corpus)
    save_index(index, tmp_path / "idx.npz", builder)

    loaded = load_index(tmp_path / "idx.npz", SparseIndexBuilder(method="bm25"))
    assert loaded.vocabulary == index.vocabulary
    assert loaded.doc_ids == index.doc_ids
    np.testing.assert_array_equal(loaded.layout.head, index.layout.head)
    np.testing.assert_array_equal(
        loaded.layout.post_rows, index.layout.post_rows
    )
    np.testing.assert_array_equal(
        loaded.layout.post_weights, index.layout.post_weights
    )
    assert _results(loaded, queries) == _results(index, queries)


def test_param_change_triggers_repack(corpus, tmp_path):
    queries = zipf_queries(10, 400, 5)
    builder = SparseIndexBuilder(
        method="bm25", k1=1.2, keep_raw_rows=True, head_dtype="f32"
    )
    index = builder.build(corpus)
    save_index(index, tmp_path / "idx.npz", builder)

    # Different k1: weights must be recomputed from the raw rows, and scores
    # must match a fresh build with the new parameters.
    loaded = load_index(
        tmp_path / "idx.npz",
        SparseIndexBuilder(method="bm25", k1=2.0, head_dtype="f32"),
    )
    fresh = SparseIndexBuilder(
        method="bm25", k1=2.0, head_dtype="f32"
    ).build(corpus)
    got = _results(loaded, queries)
    want = _results(fresh, queries)
    for qid in queries:
        assert set(got[qid]) == set(want[qid])
        for doc in want[qid]:
            assert got[qid][doc] == pytest.approx(want[qid][doc], abs=1e-3)
    # and match the oracle at k1=2.0
    oracle = DenseOracleScorer(corpus, method="bm25", k1=2.0)
    engine = SparseSearchEngine(loaded)
    scores = engine.score_all([list(queries.values())[0]])
    np.testing.assert_allclose(
        scores[0],
        oracle.score(list(queries.values())[0]).astype(np.float32),
        atol=1e-3,
        rtol=1e-3,
    )


def test_load_or_build_cache_flow(corpus, tmp_path):
    builder = SparseIndexBuilder(method="tfidf")
    i1 = load_or_build(builder, corpus, tmp_path)
    assert cache_path(tmp_path, "tfidf", corpus_fingerprint(corpus)).exists()
    i2 = load_or_build(SparseIndexBuilder(method="tfidf"), corpus, tmp_path)
    assert i2.doc_ids == i1.doc_ids
    assert i2.avgdl == i1.avgdl
    # corrupt cache falls back to rebuild
    p = cache_path(tmp_path, "tfidf", corpus_fingerprint(corpus))
    p.write_bytes(b"corrupt")
    i3 = load_or_build(SparseIndexBuilder(method="tfidf"), corpus, tmp_path)
    assert i3.doc_ids == i1.doc_ids


def test_method_mismatch_raises(corpus, tmp_path):
    builder = SparseIndexBuilder(method="bm25", keep_raw_rows=True)
    index = builder.build(corpus)
    save_index(index, tmp_path / "idx.npz", builder)
    with pytest.raises(ValueError, match="bm25"):
        load_index(tmp_path / "idx.npz", SparseIndexBuilder(method="tfidf"))


def test_cache_v3_zlib_file_still_loads(tmp_path, monkeypatch):
    """A cache written by the zlib (v3) path loads under the v4 reader."""
    from osr_tpu.index import cache as cache_mod
    from osr_tpu.index.builder import SparseIndexBuilder
    from osr_tpu.testing import SyntheticDataGenerator

    corpus = SyntheticDataGenerator(seed=42).zipf_corpus(
        120, 800, avg_len=30, word_prefix="t", min_len=5
    )
    b = SparseIndexBuilder(method="bm25", keep_raw_rows=True)
    idx = b.build(corpus)
    p = tmp_path / "v3.npz"
    monkeypatch.setattr(cache_mod, "_zstd", None)  # force the v3 writer
    cache_mod.save_index(idx, p, b)
    monkeypatch.undo()
    idx2 = cache_mod.load_index(p, b)
    import numpy as np

    assert np.array_equal(idx2.layout.head, idx.layout.head)
    assert idx2.doc_ids == idx.doc_ids


def test_cache_v4_roundtrip_small_arrays_uncompressed(tmp_path):
    """Small indices stay below the zstd threshold; the v4 container must
    roundtrip them (json strings as utf-8 buffers) bit-exactly."""
    from osr_tpu.index import cache as cache_mod
    from osr_tpu.index.builder import SparseIndexBuilder
    from osr_tpu.testing import SyntheticDataGenerator

    corpus = SyntheticDataGenerator(seed=7).zipf_corpus(
        60, 400, avg_len=20, word_prefix="w", min_len=5
    )
    b = SparseIndexBuilder(method="tfidf", keep_raw_rows=True)
    idx = b.build(corpus)
    p = tmp_path / "v4.npz"
    cache_mod.save_index(idx, p, b)
    idx2 = cache_mod.load_index(p, b)
    import numpy as np

    assert np.array_equal(idx2.layout.head, idx.layout.head)
    assert idx2.vocabulary == idx.vocabulary
    assert abs(idx2.avgdl - idx.avgdl) < 1e-6
