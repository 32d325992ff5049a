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
