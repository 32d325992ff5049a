"""Learned-sparse (SPLADE) ingestion tests (osr_tpu/index/learned.py)."""

import json

import numpy as np
import pytest

from osr_tpu.index.learned import (
    LearnedSparseIndexBuilder,
    load_learned_vectors,
)
from osr_tpu.retrieval.engine import SparseSearchEngine
from osr_tpu.retrieval.registry import RetrieverRegistry


def synthetic_learned_vectors(n_docs=120, n_terms=300, seed=0):
    """SPLADE-shaped vectors: sparse non-negative expansions."""
    rng = np.random.RandomState(seed)
    vecs = {}
    for d in range(n_docs):
        n = rng.randint(5, 40)
        terms = rng.choice(n_terms, size=n, replace=False)
        ws = rng.gamma(2.0, 0.7, size=n).astype(np.float32)
        vecs[f"doc{d}"] = {f"tok{t}": float(w) for t, w in zip(terms, ws)}
    return vecs


def dense_oracle(vecs, query):
    """score(q, d) = sum_t w_q(t) * w_d(t) — the learned-sparse dot."""
    out = {}
    for did, v in vecs.items():
        s = sum(w * v.get(t, 0.0) for t, w in query.items())
        out[did] = s
    return out


@pytest.fixture(scope="module")
def vectors():
    return synthetic_learned_vectors()


@pytest.fixture(scope="module")
def queries():
    rng = np.random.RandomState(7)
    out = {}
    for i in range(12):
        terms = rng.choice(300, size=rng.randint(2, 8), replace=False)
        out[f"q{i}"] = {
            f"tok{t}": float(rng.gamma(2.0, 0.7)) for t in terms
        }
    return out


@pytest.mark.parametrize("head_terms", [0, 64, None])
def test_learned_sparse_matches_dot_oracle(vectors, queries, head_terms):
    index = LearnedSparseIndexBuilder(
        head_terms=head_terms, head_dtype="f32"
    ).build(vectors)
    assert index.method == "splade"
    engine = SparseSearchEngine(index, cache_queries=False)
    res = engine.search_weighted(queries, top_k=10)
    for qid, qvec in queries.items():
        oracle = dense_oracle(vectors, qvec)
        want = dict(
            sorted(
                ((d, s) for d, s in oracle.items() if s > 0),
                key=lambda kv: -kv[1],
            )[:10]
        )
        got = res[qid]
        assert set(got) == set(want), qid
        for d, s in want.items():
            assert got[d] == pytest.approx(s, rel=1e-4, abs=1e-4)


def test_learned_sparse_int8_ranking(vectors, queries):
    f32 = SparseSearchEngine(
        LearnedSparseIndexBuilder(head_dtype="f32").build(vectors)
    )
    i8 = SparseSearchEngine(
        LearnedSparseIndexBuilder(head_dtype="int8").build(vectors)
    )
    r32 = f32.search_weighted(queries, top_k=10)
    r8 = i8.search_weighted(queries, top_k=10)
    overlaps = [
        len(set(r32[q]) & set(r8[q])) / max(len(r32[q]), len(r8[q]), 1)
        for q in queries
        if r32[q] or r8[q]
    ]
    assert np.mean(overlaps) >= 0.9


def test_negative_weights_rejected(vectors):
    bad = dict(vectors)
    bad["neg"] = {"tok0": -1.0}
    with pytest.raises(ValueError, match="non-negative"):
        LearnedSparseIndexBuilder().build(bad)


def test_jsonl_and_npz_loaders(tmp_path, vectors, queries):
    # jsonl round trip
    p = tmp_path / "vecs.jsonl"
    with open(p, "w") as f:
        for did, v in vectors.items():
            f.write(json.dumps({"id": did, "vector": v}) + "\n")
    doc_ids, terms, indptr, tids, ws = load_learned_vectors(p)
    assert doc_ids == list(vectors.keys())
    assert int(indptr[-1]) == sum(len(v) for v in vectors.values())

    # npz round trip through the registry route
    pz = tmp_path / "vecs.npz"
    np.savez(
        pz,
        doc_ids_json=json.dumps(doc_ids),
        vocab_json=json.dumps(terms),
        indptr=indptr,
        term_ids=tids,
        weights=ws,
    )
    r = RetrieverRegistry.create(
        {"type": "splade", "params": {"vectors_path": str(pz)}}
    )
    r.build_index_from_corpus({})
    # query via explicit vectors (the real SPLADE query path)
    r.query_vectors = queries
    res = r.search({qid: "" for qid in queries}, top_k=5)
    oracle_top = dense_oracle(vectors, queries["q0"])
    best = max(oracle_top, key=oracle_top.get)
    assert best in res["q0"]


def test_splade_without_vectors_still_routes_to_tfidf():
    r = RetrieverRegistry.create(
        {
            "type": "splade",
            "params": {"scoring": "sparse", "cache_dir": None},
        }
    )
    from osr_tpu.retrieval.registry import SparseRetriever

    assert isinstance(r, SparseRetriever)
