"""Multi-device sharding tests on the 8-device virtual CPU mesh.

Validates that document-sharded search (per-shard top-k + all-gather merge)
returns exactly the single-device results — the distributed-correctness
pattern SURVEY.md §4 prescribes for the TPU build.
"""

import jax
import numpy as np
import pytest

from osr_tpu.index.builder import SparseIndexBuilder
from osr_tpu.index.dense import synthetic_corpus_embeddings
from osr_tpu.parallel.mesh import make_mesh
from osr_tpu.parallel.sharded import (
    ShardedDenseSearchEngine,
    ShardedSparseSearchEngine,
)
from osr_tpu.retrieval.engine import DenseSearchEngine, SparseSearchEngine

from tests.reference_impl import zipf_corpus, zipf_queries


@pytest.fixture(scope="module")
def corpus():
    return zipf_corpus(num_docs=250, vocab_size=600, avg_len=50)


@pytest.fixture(scope="module")
def queries():
    return zipf_queries(num_queries=12, vocab_size=600, terms_per_query=5)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("query_parallel", [1, 2])
def test_sharded_sparse_matches_single_device(corpus, queries, query_parallel):
    index = SparseIndexBuilder(method="bm25").build(corpus)
    single = SparseSearchEngine(index)
    mesh = make_mesh(8, query_parallel=query_parallel)
    sharded = ShardedSparseSearchEngine(index, mesh)

    want = single.search(queries, top_k=10)
    got = sharded.search(queries, top_k=10)
    assert set(got.keys()) == set(want.keys())
    for qid in want:
        assert set(got[qid]) == set(want[qid]), qid
        for doc, s in want[qid].items():
            assert got[qid][doc] == pytest.approx(s, abs=1e-4, rel=1e-4)


def test_sharded_dense_matches_single_device(corpus):
    doc_ids = list(corpus.keys())
    emb = synthetic_corpus_embeddings(len(doc_ids), dim=64, seed=5)
    queries = synthetic_corpus_embeddings(16, dim=64, seed=9)
    single = DenseSearchEngine(doc_ids, emb, quantization="symmetric")
    mesh = make_mesh(8)
    sharded = ShardedDenseSearchEngine(doc_ids, emb, mesh)

    s1, i1 = single.search_vectors(queries, top_k=10)
    s2, i2 = sharded.search_vectors(queries, top_k=10)
    np.testing.assert_allclose(s2, s1, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(i2, i1)


def test_sharded_handles_row_padding(queries):
    # 131 docs does not divide 8 -> exercises shard padding
    corpus = zipf_corpus(num_docs=131, vocab_size=400, avg_len=30)
    index = SparseIndexBuilder(method="tfidf").build(corpus)
    single = SparseSearchEngine(index)
    sharded = ShardedSparseSearchEngine(index, make_mesh(8))
    want = single.search(queries, top_k=7)
    got = sharded.search(queries, top_k=7)
    for qid in want:
        assert set(got[qid]) == set(want[qid])


# ---------------------------------------------------------------------------
# Option-matrix parity at >=10k docs with the production int8 head
# (VERDICT r2 items 4 and 6)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def big_corpus():
    return zipf_corpus(num_docs=12_000, vocab_size=6_000, avg_len=40)


@pytest.fixture(scope="module")
def big_index(big_corpus):
    return SparseIndexBuilder(method="bm25").build(big_corpus)  # int8 head


@pytest.fixture(scope="module")
def big_queries():
    return zipf_queries(num_queries=32, vocab_size=6_000, terms_per_query=7)


def _assert_same_modulo_kth_ties(want, got):
    for qid in want:
        w, g = want[qid], got[qid]
        kth = min(w.values()) if w else 0.0
        for d in set(g) ^ set(w):
            s = w.get(d, g.get(d))
            assert s == pytest.approx(kth, abs=1e-5), (qid, d, s, kth)
        for d, s in w.items():
            if d in g:
                assert g[d] == pytest.approx(s, abs=1e-5, rel=1e-5), (qid, d)


@pytest.mark.parametrize(
    "head_backend,query_parallel",
    [("xla", 1), ("xla", 2), ("pallas", 2)],
)
def test_sharded_options_match_single_device_at_scale(
    big_index, big_queries, head_backend, query_parallel
):
    """Exact sharded search == single-device search at 12k docs, int8
    head, across the head-backend x query-DP option matrix (the Pallas
    per-shard kernel runs in interpret mode on the CPU mesh)."""
    single = SparseSearchEngine(big_index, cache_queries=False)
    mesh = make_mesh(8, query_parallel=query_parallel)
    sharded = ShardedSparseSearchEngine(
        big_index,
        mesh,
        head_backend=head_backend,
        cache_queries=False,
        pallas_interpret=head_backend == "pallas",
    )
    want = single.search(big_queries, top_k=20)
    got = sharded.search(big_queries, top_k=20)
    _assert_same_modulo_kth_ties(want, got)


def test_sharded_approx_mode_recall(big_index, big_queries):
    """Approx top-k mode on the sharded engine: recall@20 >= 0.9 vs the
    exact sharded results (the reference suite's 90% overlap bar,
    reference tests/topk_selection.py:329-343)."""
    mesh = make_mesh(8)
    exact = ShardedSparseSearchEngine(
        big_index, mesh, topk_mode="exact", cache_queries=False
    )
    approx = ShardedSparseSearchEngine(
        big_index, mesh, topk_mode="approx", cache_queries=False
    )
    want = exact.search(big_queries, top_k=20)
    got = approx.search(big_queries, top_k=20)
    overlaps = []
    for qid in want:
        if not want[qid]:
            continue
        overlaps.append(
            len(set(want[qid]) & set(got[qid])) / len(want[qid])
        )
    assert np.mean(overlaps) >= 0.9, np.mean(overlaps)


def test_sharded_search_weighted_matches_single(big_index):
    """SPLADE search_weighted parity: sharded == single-device on
    weighted {term: weight} queries."""
    terms = list(big_index.vocabulary)[:2000]
    rng = np.random.RandomState(7)
    queries = {}
    for qi in range(12):
        picks = rng.choice(len(terms), size=6, replace=False)
        queries[f"w{qi}"] = {
            terms[p]: float(rng.rand() * 2 + 0.1) for p in picks
        }
    queries["empty"] = {}
    single = SparseSearchEngine(big_index, cache_queries=False)
    sharded = ShardedSparseSearchEngine(
        big_index, make_mesh(8), cache_queries=False
    )
    want = single.search_weighted(queries, top_k=15)
    got = sharded.search_weighted(queries, top_k=15)
    assert got["empty"] == {}
    _assert_same_modulo_kth_ties(want, got)


def test_sharded_query_cache(big_index, big_queries):
    engine = ShardedSparseSearchEngine(
        big_index, make_mesh(8), cache_queries=True
    )
    first = engine.search(big_queries, top_k=10)
    assert len(engine._query_cache) > 0
    again = engine.search(big_queries, top_k=10)
    assert first == again


@pytest.mark.parametrize(
    "quantization,backend",
    [("symmetric", "xla"), ("symmetric", "pallas"), ("asymmetric", "xla"),
     ("int4", "xla"), ("int4", "pallas"), ("none", "xla")],
)
def test_sharded_dense_options_match_single_device(quantization, backend):
    """Dense option matrix: sharded == single-device for symmetric and
    int4 (xla + pallas-interpret), asymmetric, and fp32 paths."""
    doc_ids = [f"d{i}" for i in range(517)]  # does not divide 8
    # pallas int4 needs dim/2 lane-aligned (128); other cases stay small.
    dim = 256 if (quantization, backend) == ("int4", "pallas") else 64
    emb = synthetic_corpus_embeddings(len(doc_ids), dim=dim, seed=5)
    queries = synthetic_corpus_embeddings(16, dim=dim, seed=9)
    single = DenseSearchEngine(
        doc_ids,
        emb,
        quantization=quantization,
        backend="xla",  # single-device reference path
    )
    sharded = ShardedDenseSearchEngine(
        doc_ids,
        emb,
        make_mesh(8),
        quantization=quantization,
        backend=backend,
        pallas_interpret=backend == "pallas",
    )
    s1, i1 = single.search_vectors(queries, top_k=10)
    s2, i2 = sharded.search_vectors(queries, top_k=10)
    np.testing.assert_allclose(s2, s1, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(i2, i1)


def test_sharded_int4_matches_single_device(big_corpus, big_queries):
    """The int4 head works under sharding: per-shard decode + matmul ==
    the single-device int4 engine (Pallas interpret on the CPU mesh)."""
    index = SparseIndexBuilder(method="bm25", head_dtype="int4").build(
        big_corpus
    )
    single = SparseSearchEngine(index, cache_queries=False)
    sharded = ShardedSparseSearchEngine(
        index,
        make_mesh(8, query_parallel=2),
        head_backend="pallas",
        cache_queries=False,
        pallas_interpret=True,
    )
    want = single.search(big_queries, top_k=15)
    got = sharded.search(big_queries, top_k=15)
    _assert_same_modulo_kth_ties(want, got)


@pytest.mark.parametrize("fusion", ["weighted", "rrf"])
def test_sharded_hybrid_matches_flat_hybrid(corpus, queries, fusion):
    """Sharded hybrid fusion == flat hybrid fast path: both engines are
    exact under sharding (the sparse merge bit-matches, per-row int8
    quantization is row-local), so fused results must agree — for the
    weighted mode AND rank-based RRF (ranks are identical when the leg
    arrays are identical)."""
    from osr_tpu.retrieval.registry import RetrieverRegistry

    flat = RetrieverRegistry.create(
        {
            "type": "hybrid",
            "params": {
                "sparse_weight": 0.3,
                "dense_weight": 0.7,
                "embedding_dim": 64,
                "fusion_depth": 25,
                "fusion": fusion,
                "cache_dir": None,
            },
        }
    )
    flat.build_index_from_corpus(corpus)

    from osr_tpu.parallel.sharded import ShardedHybridEngine

    sharded = ShardedHybridEngine(
        flat.sparse.engine.index,
        # The flat dense retriever's synthetic embeddings (default seed).
        synthetic_corpus_embeddings(len(corpus), dim=64),
        make_mesh(8, query_parallel=2),
        sparse_weight=0.3,
        dense_weight=0.7,
        fusion_depth=25,
        fusion=fusion,
    )
    want = flat.search(queries, top_k=50)
    got = sharded.search(queries, top_k=50)
    assert set(got) == set(want)
    for qid in want:
        assert set(got[qid]) == set(want[qid]), qid
        for doc, s in want[qid].items():
            assert got[qid][doc] == pytest.approx(s, abs=1e-4), (qid, doc)


def test_sharded_extract_matches_standard_and_flat():
    """Extract-mode sharded search (per-shard Mosaic top-m extraction +
    host-side candidate head scores) must match the standard sharded
    engine AND the flat engine dict-for-dict. Shards must clear the
    kernel floor: 20k docs over 4 doc-shards -> 5,120 rows/shard."""
    corpus = zipf_corpus(num_docs=20_000, vocab_size=20_000, avg_len=60)
    queries = zipf_queries(
        num_queries=8, vocab_size=20_000, terms_per_query=6
    )
    index = SparseIndexBuilder(method="bm25").build(corpus)
    mesh = make_mesh(8, query_parallel=2)

    ex = ShardedSparseSearchEngine(
        index,
        mesh,
        batch_sizes=(8,),
        cache_queries=False,
        head_backend="pallas",
        pallas_interpret=True,
        narrow_m=8,
        narrow_backend="extract",
    )
    assert ex._use_extract(10)
    std = ShardedSparseSearchEngine(
        index, mesh, batch_sizes=(8,), cache_queries=False
    )
    flat = SparseSearchEngine(index, batch_sizes=(8,), cache_queries=False)
    r_ex = ex.search(queries, top_k=10)
    r_std = std.search(queries, top_k=10)
    assert r_ex == r_std
    assert r_ex == flat.search(queries, top_k=10)


def test_sharded_extract_unsafe_flag_falls_back(monkeypatch):
    """A raised tie-safety flag must re-dispatch the standard sharded
    program — results identical to the standard engine."""
    import osr_tpu.parallel.sharded as sh

    corpus = zipf_corpus(num_docs=20_000, vocab_size=20_000, avg_len=60)
    queries = zipf_queries(
        num_queries=4, vocab_size=20_000, terms_per_query=6
    )
    index = SparseIndexBuilder(method="bm25").build(corpus)
    mesh = make_mesh(8, query_parallel=2)

    real = sh.sharded_search_extract
    calls = {"n": 0}

    def always_unsafe(*args, **kwargs):
        calls["n"] += 1
        tops, tids, flag = real(*args, **kwargs)
        import jax.numpy as jnp

        return tops, tids, jnp.ones_like(flag)

    monkeypatch.setattr(sh, "sharded_search_extract", always_unsafe)
    ex = sh.ShardedSparseSearchEngine(
        index,
        mesh,
        batch_sizes=(4,),
        cache_queries=False,
        head_backend="pallas",
        pallas_interpret=True,
        narrow_m=8,
        narrow_backend="extract",
    )
    std = sh.ShardedSparseSearchEngine(
        index, mesh, batch_sizes=(4,), cache_queries=False
    )
    r_ex = ex.search(queries, top_k=10)
    assert calls["n"] > 0, "extract program was never dispatched"
    assert r_ex == std.search(queries, top_k=10)
