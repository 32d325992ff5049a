"""Array-level hybrid fusion (osr_tpu/retrieval/fusion.py).

The dict-level fusion (`HybridRetriever._search_dicts`, the r3
implementation) is the semantics oracle: the vectorized fast path must
produce the same fused scores for the same doc ids."""

import numpy as np
import pytest

from osr_tpu.retrieval.fusion import fuse_topk_arrays, fused_rows_to_results
from osr_tpu.retrieval.registry import RetrieverRegistry

from tests.reference_impl import zipf_corpus, zipf_queries


def _fuse_dict_oracle(s_pairs, d_pairs, ws, wd, top_k):
    """Reimplementation of the dict-path semantics on one query."""

    def minmax(pairs):
        kept = {i: s for i, s in pairs if s > 0 and i >= 0}
        if not kept:
            return {}
        lo, hi = min(kept.values()), max(kept.values())
        span = (hi - lo) or 1.0
        return {i: (s - lo) / span for i, s in kept.items()}

    fused = {}
    for i, s in minmax(s_pairs).items():
        fused[i] = fused.get(i, 0.0) + ws * s
    for i, s in minmax(d_pairs).items():
        fused[i] = fused.get(i, 0.0) + wd * s
    return sorted(fused.items(), key=lambda kv: -kv[1])[:top_k]


def test_fuse_matches_dict_oracle_random():
    rng = np.random.default_rng(42)
    B, ds, dd, n_docs, k = 17, 23, 19, 200, 10
    # Unique ids per row per side; a deliberate overlap between sides.
    s_ids = np.stack(
        [rng.choice(n_docs, ds, replace=False) for _ in range(B)]
    )
    d_ids = np.stack(
        [
            np.concatenate(
                [s_ids[r, : dd // 2], rng.choice(
                    np.setdiff1d(np.arange(n_docs), s_ids[r]),
                    dd - dd // 2,
                    replace=False,
                )]
            )
            for r in range(B)
        ]
    )
    s_sc = np.sort(rng.normal(2.0, 1.0, (B, ds)).astype(np.float32))[:, ::-1]
    d_sc = np.sort(rng.normal(1.0, 1.0, (B, dd)).astype(np.float32))[:, ::-1]
    # Sprinkle empty slots and non-positive scores.
    s_ids[:, -2:] = -1
    s_sc[:, -2:] = 0.0
    d_sc[3, :] = -1.0  # one query with no kept dense results

    f_sc, f_ids = fuse_topk_arrays(s_sc, s_ids, d_sc, d_ids, 0.3, 0.7, k)
    for r in range(B):
        want = _fuse_dict_oracle(
            list(zip(s_ids[r].tolist(), s_sc[r].tolist())),
            list(zip(d_ids[r].tolist(), d_sc[r].tolist())),
            0.3,
            0.7,
            k,
        )
        got = [
            (i, s)
            for i, s in zip(f_ids[r].tolist(), f_sc[r].tolist())
            if i >= 0
        ]
        assert len(got) == len(want)
        # Compare as score-sorted sets (tie order may differ).
        for (gi, gs), (wi, ws_) in zip(got, want):
            assert gs == pytest.approx(ws_, abs=1e-5)
        assert {i for i, _ in got} == {i for i, _ in want} or all(
            abs(gs - ws_) < 1e-5
            for (_, gs), (_, ws_) in zip(got, want)
        )


def test_fuse_duplicate_doc_sums_both_sides():
    s_sc = np.array([[3.0, 2.0, 1.0]], np.float32)
    s_ids = np.array([[5, 7, 9]])
    d_sc = np.array([[4.0, 2.0]], np.float32)
    d_ids = np.array([[7, 5]])
    f_sc, f_ids = fuse_topk_arrays(s_sc, s_ids, d_sc, d_ids, 0.5, 0.5, 3)
    # sparse norm: 5->1.0, 7->0.5, 9->0.0 ; dense norm: 7->1.0, 5->0.0
    # fused: 5 -> 0.5, 7 -> 0.25 + 0.5 = 0.75, 9 -> 0.0
    assert f_ids[0].tolist() == [7, 5, 9]
    assert f_sc[0].tolist() == pytest.approx([0.75, 0.5, 0.0], abs=1e-6)


def test_fuse_empty_sides():
    empty_sc = np.zeros((2, 4), np.float32)
    empty_ids = np.full((2, 4), -1)
    d_sc = np.array([[2.0, 1.0], [0.0, 0.0]], np.float32)
    d_ids = np.array([[3, 1], [2, 4]])
    f_sc, f_ids = fuse_topk_arrays(
        empty_sc, empty_ids, d_sc, d_ids, 0.3, 0.7, 5
    )
    assert f_ids[0].tolist()[:2] == [3, 1]
    assert f_sc[0][:2].tolist() == pytest.approx([0.7, 0.0], abs=1e-6)
    # Query with nothing kept anywhere -> all empty slots.
    assert (f_ids[1] == -1).all()
    res = fused_rows_to_results(
        ["a", "b"], f_sc, f_ids, [f"d{i}" for i in range(5)]
    )
    assert res["b"] == {}
    assert list(res["a"].keys())[:2] == ["d3", "d1"]


def test_hybrid_fast_path_matches_dict_path():
    corpus = zipf_corpus(num_docs=250, vocab_size=500, avg_len=40)
    r = RetrieverRegistry.create(
        {
            "type": "hybrid",
            "params": {
                "sparse_weight": 0.3,
                "dense_weight": 0.7,
                "embedding_dim": 64,
                "fusion_depth": 30,
                "cache_dir": None,
            },
        }
    )
    r.build_index_from_corpus(corpus)
    queries = zipf_queries(32, vocab_size=500)
    queries["empty"] = ""
    queries["blank"] = "  \t "  # whitespace-only: both paths return {}
    # top_k > both depths so no boundary-tie flakiness.
    fast = r.search(queries, top_k=80)
    slow = r._search_dicts(queries, top_k=80)
    assert set(fast) == set(slow)
    for qid in slow:
        assert set(fast[qid]) == set(slow[qid]), qid
        for doc, s in slow[qid].items():
            assert fast[qid][doc] == pytest.approx(s, abs=1e-5), (qid, doc)


def _rrf_dict_oracle(s_pairs, d_pairs, ws, wd, rrf_k, top_k):
    """Per-query RRF semantics: rank = 1-based position among kept
    entries in descending-score order (stable on input order)."""

    def leg(pairs, weight):
        kept = [(i, s) for i, s in pairs if s > 0 and i >= 0]
        kept.sort(key=lambda kv: -kv[1])  # stable: input order on ties
        return {i: weight / (rrf_k + r) for r, (i, _) in enumerate(kept, 1)}

    fused = {}
    for part in (leg(s_pairs, ws), leg(d_pairs, wd)):
        for i, s in part.items():
            fused[i] = fused.get(i, 0.0) + s
    return fused


def test_fuse_rrf_matches_dict_oracle_random():
    rng = np.random.default_rng(7)
    B, ds, dd, n_docs, k = 11, 23, 19, 150, 10
    s_ids = np.stack(
        [rng.choice(n_docs, ds, replace=False) for _ in range(B)]
    )
    d_ids = np.stack(
        [
            np.concatenate(
                [
                    s_ids[r, : dd // 2],
                    rng.choice(
                        np.setdiff1d(np.arange(n_docs), s_ids[r]),
                        dd - dd // 2,
                        replace=False,
                    ),
                ]
            )
            for r in range(B)
        ]
    )
    s_sc = np.sort(rng.normal(2.0, 1.0, (B, ds)).astype(np.float32))[:, ::-1]
    d_sc = np.sort(rng.normal(1.0, 1.0, (B, dd)).astype(np.float32))[:, ::-1]
    s_ids[:, -2:] = -1
    s_sc[:, -2:] = 0.0
    d_sc[3, :] = -1.0

    f_sc, f_ids = fuse_topk_arrays(
        s_sc, s_ids, d_sc, d_ids, 1.0, 1.0, k, mode="rrf", rrf_k=60.0
    )
    for r in range(B):
        fused = _rrf_dict_oracle(
            list(zip(s_ids[r].tolist(), s_sc[r].tolist())),
            list(zip(d_ids[r].tolist(), d_sc[r].tolist())),
            1.0,
            1.0,
            60.0,
            k,
        )
        want = sorted(fused.values(), reverse=True)[:k]
        got = [
            (i, s)
            for i, s in zip(f_ids[r].tolist(), f_sc[r].tolist())
            if i >= 0
        ]
        assert len(got) == len(want)
        # RRF yields exact ties (same-rank singletons); tie order at the
        # k boundary may pick different docs, so compare the fused score
        # SEQUENCE, and every selected id's score against the full oracle.
        for (gi, gs), ws_ in zip(got, want):
            assert gs == pytest.approx(ws_, abs=1e-6)
            assert gs == pytest.approx(np.float32(fused[gi]), abs=1e-6)


def test_fuse_rrf_scale_free():
    """RRF depends only on ranks: scaling one leg's scores by 1000x must
    not change the fused ranking (the failure mode of weighted min-max
    fusion when the legs' score spreads differ)."""
    rng = np.random.default_rng(3)
    s_sc = np.sort(rng.random((4, 12)).astype(np.float32))[:, ::-1] + 0.1
    d_sc = np.sort(rng.random((4, 12)).astype(np.float32))[:, ::-1] + 0.1
    s_ids = np.stack([rng.permutation(40)[:12] for _ in range(4)])
    d_ids = np.stack([rng.permutation(40)[:12] for _ in range(4)])
    a_sc, a_ids = fuse_topk_arrays(
        s_sc, s_ids, d_sc, d_ids, 1.0, 1.0, 8, mode="rrf"
    )
    b_sc, b_ids = fuse_topk_arrays(
        s_sc * 1000.0, s_ids, d_sc / 1000.0, d_ids, 1.0, 1.0, 8, mode="rrf"
    )
    np.testing.assert_array_equal(a_ids, b_ids)
    np.testing.assert_allclose(a_sc, b_sc, rtol=1e-6)


def test_fuse_unknown_mode_raises():
    z = np.zeros((1, 2), np.float32)
    i = np.zeros((1, 2), np.int64)
    with pytest.raises(ValueError):
        fuse_topk_arrays(z, i, z, i, 0.5, 0.5, 2, mode="nope")


def test_hybrid_rrf_fast_path_matches_dict_path():
    corpus = zipf_corpus(num_docs=250, vocab_size=500, avg_len=40)
    r = RetrieverRegistry.create(
        {
            "type": "hybrid",
            "params": {
                "fusion": "rrf",
                "rrf_k": 60.0,
                "embedding_dim": 64,
                "fusion_depth": 30,
                "cache_dir": None,
            },
        }
    )
    r.build_index_from_corpus(corpus)
    queries = zipf_queries(16, vocab_size=500)
    queries["empty"] = ""
    fast = r.search(queries, top_k=80)
    slow = r._search_dicts(queries, top_k=80)
    assert set(fast) == set(slow)
    for qid in slow:
        assert set(fast[qid]) == set(slow[qid]), qid
        for doc, s in slow[qid].items():
            assert fast[qid][doc] == pytest.approx(s, abs=1e-6), (qid, doc)


def test_set_fusion_retunes_without_rebuild():
    corpus = zipf_corpus(num_docs=200, vocab_size=400, avg_len=30)
    r = RetrieverRegistry.create(
        {
            "type": "hybrid",
            "params": {"embedding_dim": 32, "cache_dir": None},
        }
    )
    r.build_index_from_corpus(corpus)
    queries = zipf_queries(8, vocab_size=400)
    base = r.search(queries, top_k=20)
    r.set_fusion(sparse_weight=0.9, dense_weight=0.1)
    reweighted = r.search(queries, top_k=20)
    r.set_fusion(fusion="rrf", sparse_weight=1.0, dense_weight=1.0)
    rrf = r.search(queries, top_k=20)
    # Each retune must match a fresh retriever constructed with the same
    # params (proving search-time fusion needs no rebuild).
    fresh = RetrieverRegistry.create(
        {
            "type": "hybrid",
            "params": {
                "embedding_dim": 32,
                "cache_dir": None,
                "fusion": "rrf",
                "sparse_weight": 1.0,
                "dense_weight": 1.0,
            },
        }
    )
    fresh.build_index_from_corpus(corpus)
    want = fresh.search(queries, top_k=20)
    assert rrf == want
    # And the retunes actually changed something vs the default.
    assert base != reweighted or base != rrf

    with pytest.raises(ValueError):
        r.set_fusion(fusion="nope")
