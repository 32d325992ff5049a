"""int4 head mode: half the head HBM of int8 (the >5M-docs/chip regime).

Codes are unsigned [0, 15] against per-column SIGNED scales — a head
column's weights all share its IDF's sign, so the nibble spends every
non-zero level on magnitude (osr_tpu/index/layout.py:unpack_int4).
Measured top-10 agreement with the exact f32 head: ~0.95 on the Zipf
fixture (the int8 bar), at half the bytes.
"""

import numpy as np
import pytest

from osr_tpu.index.builder import SparseIndexBuilder
from osr_tpu.index.layout import pack_flat, unpack_int4
from osr_tpu.retrieval.engine import SparseSearchEngine

from tests.reference_impl import DenseOracleScorer, zipf_corpus, zipf_queries


@pytest.fixture(scope="module")
def corpus():
    return zipf_corpus(num_docs=800, vocab_size=3000, avg_len=70)


@pytest.fixture(scope="module")
def queries():
    return zipf_queries(num_queries=40, vocab_size=3000, terms_per_query=7)


def test_pack_unpack_roundtrip():
    """Codes reconstruct weights within half a quantization step; absent
    entries decode to exactly 0; negative-IDF columns carry the sign in
    the scale."""
    rng = np.random.RandomState(0)
    num_docs, vocab, f = 50, 40, 24
    doc_idx, term_ids, weights = [], [], []
    col_sign = np.where(np.arange(vocab) % 5 == 0, -1.0, 1.0)
    for d in range(num_docs):
        for t in rng.choice(vocab, size=8, replace=False):
            doc_idx.append(d)
            term_ids.append(t)
            weights.append(float(col_sign[t] * (rng.rand() * 3 + 0.05)))
    order = np.argsort(doc_idx, kind="stable")
    lay = pack_flat(
        np.asarray(doc_idx)[order],
        np.asarray(term_ids, np.int32)[order],
        np.asarray(weights, np.float32)[order],
        num_docs,
        vocab,
        head_terms=f,
        head_dtype="int4",
    )
    assert lay.head.dtype == np.uint8
    assert lay.head.shape[1] == (f + 1) // 2
    codes = unpack_int4(lay.head, f)
    assert codes.min() >= 0 and codes.max() <= 15
    approx = codes.astype(np.float32) * lay.head_scales[None, :]
    dense = np.zeros((lay.num_rows, f), dtype=np.float32)
    for d, t, w in zip(doc_idx, term_ids, weights):
        if t < f:
            dense[d, t] = w
    # within half a step of the per-column scale; absent entries exact 0
    np.testing.assert_allclose(
        approx, dense, atol=np.abs(lay.head_scales).max() * 0.5 + 1e-7
    )
    assert np.all(approx[dense == 0] == 0)
    # negative columns: sign lives in the scale
    neg_cols = [t for t in range(f) if col_sign[t] < 0 and dense[:, t].any()]
    assert neg_cols and all(lay.head_scales[t] < 0 for t in neg_cols)


def test_int4_scores_close_to_oracle(corpus, queries):
    oracle = DenseOracleScorer(corpus, method="bm25")
    engine = SparseSearchEngine(
        SparseIndexBuilder(method="bm25", head_dtype="int4").build(corpus),
        cache_queries=False,
    )
    texts = list(queries.values())[:8]
    got = engine.score_all(texts)
    for i, text in enumerate(texts):
        want = oracle.score(text).astype(np.float32)
        # int4 error is ~1/30 of each column's max, absolute per term.
        np.testing.assert_allclose(got[i], want, atol=0.5, rtol=0.1)


def test_int4_preserves_ranking(corpus, queries):
    f32 = SparseSearchEngine(
        SparseIndexBuilder(method="bm25", head_dtype="f32").build(corpus),
        cache_queries=False,
    )
    i4 = SparseSearchEngine(
        SparseIndexBuilder(method="bm25", head_dtype="int4").build(corpus),
        cache_queries=False,
    )
    r32 = f32.search(queries, top_k=10)
    r4 = i4.search(queries, top_k=10)
    overlaps = [
        len(set(r32[q]) & set(r4[q])) / max(len(r32[q]), len(r4[q]), 1)
        for q in queries
        if r32[q] or r4[q]
    ]
    assert np.mean(overlaps) >= 0.9, np.mean(overlaps)


def test_int4_pallas_interpret_equals_xla(corpus, queries):
    """The Mosaic int4 decode+matmul+blockmax == the XLA decode chain,
    bit for bit (interpret mode on CPU; the TPU path shares the code)."""
    import jax.numpy as jnp

    from osr_tpu.ops.bm25 import head_scores, scatter_query_head
    from osr_tpu.ops.pallas.head import masked_head_scores_blockmax

    index = SparseIndexBuilder(method="bm25", head_dtype="int4").build(corpus)
    lay = index.layout
    assert lay.head.shape[1] % 128 == 0  # builder aligned F for Pallas
    engine = SparseSearchEngine(index, cache_queries=False)
    enc = engine.encode_queries(list(queries.values())[:8])
    qhead = scatter_query_head(
        jnp.asarray(enc.head_ids),
        jnp.asarray(enc.head_weights),
        head_terms=lay.head_terms,
    )
    want = np.asarray(
        head_scores(
            jnp.asarray(lay.head), jnp.asarray(lay.head_scales), qhead
        )
    )
    want = np.where(lay.valid[None, :], want, -np.inf)
    got, bmax = masked_head_scores_blockmax(
        jnp.asarray(lay.head),
        jnp.asarray(lay.head_scales),
        qhead,
        jnp.asarray(lay.valid),
        interpret=True,
    )
    np.testing.assert_array_equal(want, np.asarray(got))
    # block maxima agree with a NumPy reduce over the same scores
    g = bmax.shape[1]
    pad = g * 128 - want.shape[1]
    wp = np.pad(want, ((0, 0), (0, pad)), constant_values=-np.inf)
    np.testing.assert_array_equal(
        wp.reshape(want.shape[0], g, 128).max(axis=2), np.asarray(bmax)
    )


def test_int4_cache_roundtrip(corpus, tmp_path):
    from osr_tpu.index.cache import load_index, save_index

    builder = SparseIndexBuilder(
        method="bm25", head_dtype="int4", keep_raw_rows=True
    )
    index = builder.build(corpus)
    path = tmp_path / "i4.npz"
    save_index(index, path, builder)
    loaded = load_index(path, builder)
    assert loaded is not None
    np.testing.assert_array_equal(loaded.layout.head, index.layout.head)
    np.testing.assert_array_equal(
        loaded.layout.head_scales, index.layout.head_scales
    )
    assert loaded.layout.head_dtype == "int4"


def test_int4_memory_is_half_of_int8(corpus):
    i8 = SparseIndexBuilder(method="bm25", head_dtype="int8").build(corpus)
    i4 = SparseIndexBuilder(
        method="bm25", head_dtype="int4", head_terms=i8.layout.head_terms
    ).build(corpus)
    assert i4.layout.head.nbytes * 2 == pytest.approx(
        i8.layout.head.nbytes, rel=0.01
    )


def test_native_int4_pack_matches_numpy():
    """The fused C++ int4 weight+pack is BIT-identical to the NumPy
    compute_weights_flat + pack_flat int4 path."""
    native = pytest.importorskip("osr_tpu.native")
    from osr_tpu.index.builder import bm25_idf, compute_weights_flat
    from osr_tpu.index.layout import DOC_ALIGN, _round_up

    corpus = zipf_corpus(num_docs=90, vocab_size=200, avg_len=40)
    texts = [d["text"] for d in corpus.values()]
    vocab, df, dl, indptr, tids, tfs = (
        SparseIndexBuilder._count_corpus_python(texts)
    )
    num_docs, vocab_size = len(texts), len(vocab)
    for head_terms in (0, 33, 128):
        f = min(head_terms, vocab_size)
        avgdl = float(dl.mean())
        idf = bm25_idf(df, num_docs)
        weights = compute_weights_flat(
            tids, tfs, indptr, dl, idf, "bm25", 1.2, 0.75, avgdl
        )
        doc_idx = np.repeat(
            np.arange(num_docs, dtype=np.int64), np.diff(indptr)
        )
        want = pack_flat(
            doc_idx, tids, weights, num_docs, vocab_size,
            head_terms=f, head_dtype="int4",
        )
        rows = max(_round_up(num_docs, DOC_ALIGN), DOC_ALIGN)
        head, scales, post_ptr, post_rows, post_w = (
            native.pack_hybrid_int4_native(
                indptr, tids, tfs, dl, idf, rows, f, vocab_size,
                "bm25", 1.2, 0.75, avgdl,
            )
        )
        np.testing.assert_array_equal(head, want.head)
        np.testing.assert_array_equal(scales, want.head_scales)
        np.testing.assert_array_equal(post_ptr, want.post_ptr)
        np.testing.assert_array_equal(post_rows, want.post_rows)
        np.testing.assert_array_equal(post_w, want.post_weights)


# ---------------------------------------------------------------------------
# Group-wise dense int4 (ops/quantize.py:quantize_symmetric_int4_grouped)
# ---------------------------------------------------------------------------


def _outlier_embeddings(n=300, d=256, seed=0):
    """Embeddings with one large outlier component per row — the case
    where a single per-row scale crushes all other components (the r4
    -24% nDCG mechanism)."""
    rng = np.random.RandomState(seed)
    x = rng.randn(n, d).astype(np.float32) * 0.05
    x[np.arange(n), rng.randint(0, d, size=n)] += rng.choice(
        [-3.0, 3.0], size=n
    )
    return x


def test_int4_grouped_reconstruction_beats_per_row():
    from osr_tpu.ops.quantize import (
        quantize_symmetric_int4_grouped_np,
        quantize_symmetric_int4_np,
        unpack_int4_signed,
    )

    x = _outlier_embeddings()
    n, d = x.shape
    pr_packed, pr_scales = quantize_symmetric_int4_np(x)
    gr_packed, gr_scales = quantize_symmetric_int4_grouped_np(
        x, group_size=128
    )
    pr = np.asarray(unpack_int4_signed(pr_packed)) * pr_scales[:, None]
    g = d // 128
    gr = (
        np.asarray(unpack_int4_signed(gr_packed)).reshape(n, g, 128)
        * gr_scales[:, :, None]
    ).reshape(n, d)
    err_pr = np.abs(pr - x).mean()
    err_gr = np.abs(gr - x).mean()
    assert err_gr < 0.7 * err_pr, (err_gr, err_pr)
    # Finer groups bound the outlier tighter still.
    g64_packed, g64_scales = quantize_symmetric_int4_grouped_np(
        x, group_size=64
    )
    g64 = (
        np.asarray(unpack_int4_signed(g64_packed)).reshape(n, d // 64, 64)
        * g64_scales[:, :, None]
    ).reshape(n, d)
    assert np.abs(g64 - x).mean() < err_gr


def test_int4_grouped_single_group_equals_per_row():
    """group_size = D degenerates to exactly the per-row quantizer:
    identical packed codes and scales."""
    from osr_tpu.ops.quantize import (
        quantize_symmetric_int4_grouped_np,
        quantize_symmetric_int4_np,
    )

    x = _outlier_embeddings(n=64, d=128)
    pr_packed, pr_scales = quantize_symmetric_int4_np(x)
    gr_packed, gr_scales = quantize_symmetric_int4_grouped_np(
        x, group_size=128
    )
    np.testing.assert_array_equal(pr_packed, gr_packed)
    np.testing.assert_allclose(pr_scales, gr_scales[:, 0], rtol=1e-6)


def test_int4_grouped_np_matches_jax():
    from osr_tpu.ops.quantize import (
        quantize_symmetric_int4_grouped,
        quantize_symmetric_int4_grouped_np,
    )

    x = _outlier_embeddings(n=96, d=256)
    jp, js = quantize_symmetric_int4_grouped(x, group_size=128)
    npp, nps = quantize_symmetric_int4_grouped_np(x, group_size=128)
    np.testing.assert_array_equal(np.asarray(jp), npp)
    np.testing.assert_allclose(np.asarray(js), nps, rtol=1e-6)


def test_int4_grouped_engine_search_ranks_better_than_per_row():
    """End-to-end: with outlier-heavy embeddings the grouped engine's
    top-1 agreement with fp32 must beat per-row int4's."""
    from osr_tpu.retrieval.engine import DenseSearchEngine

    x = _outlier_embeddings(n=400, d=256, seed=3)
    ids = [f"d{i}" for i in range(len(x))]
    q = {f"q{i}": x[i * 7] + 0.01 * np.random.RandomState(i).randn(256)
         for i in range(40)}
    fp = DenseSearchEngine(ids, x, quantization="none")
    pr = DenseSearchEngine(ids, x, quantization="int4")
    gr = DenseSearchEngine(ids, x, quantization="int4_grouped")
    r_fp = fp.search(q, top_k=5, min_score=-1e30)
    r_pr = pr.search(q, top_k=5, min_score=-1e30)
    r_gr = gr.search(q, top_k=5, min_score=-1e30)

    def top1_agree(res):
        hits = 0
        for qid in q:
            a = next(iter(r_fp[qid]), None)
            b = next(iter(res[qid]), None)
            hits += a == b
        return hits / len(q)

    assert top1_agree(r_gr) >= top1_agree(r_pr)
    assert top1_agree(r_gr) >= 0.8


def test_int4_grouped_from_quantized_matches_ctor():
    from osr_tpu.ops.quantize import quantize_symmetric_int4_grouped_np
    from osr_tpu.retrieval.engine import DenseSearchEngine

    x = _outlier_embeddings(n=200, d=256, seed=5)
    ids = [f"d{i}" for i in range(len(x))]
    packed, scales = quantize_symmetric_int4_grouped_np(x, group_size=128)
    e1 = DenseSearchEngine(ids, x, quantization="int4_grouped")
    e2 = DenseSearchEngine.from_quantized(
        ids, packed, scales, quantization="int4_grouped"
    )
    q = {"q0": x[3], "q1": x[11]}
    r1 = e1.search(q, top_k=4, min_score=-1e30)
    r2 = e2.search(q, top_k=4, min_score=-1e30)
    assert r1.keys() == r2.keys()
    for qid in r1:
        assert list(r1[qid]) == list(r2[qid])
        for d_, s in r1[qid].items():
            assert abs(s - r2[qid][d_]) < 1e-4
