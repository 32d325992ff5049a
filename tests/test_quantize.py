import numpy as np
import jax.numpy as jnp
import pytest

from osr_tpu.index.dense import synthetic_corpus_embeddings, synthetic_query_embedding
from osr_tpu.ops import quantize as qz


@pytest.fixture(scope="module")
def embeddings():
    return synthetic_corpus_embeddings(500, dim=128, seed=42)


def test_symmetric_roundtrip(embeddings):
    values, scales = qz.quantize_symmetric(jnp.asarray(embeddings))
    recon = np.asarray(qz.dequantize_symmetric(values, scales))
    mae = np.abs(recon - embeddings).mean()
    # max quantization step is absmax/127; errors must be below half a step
    max_step = (np.abs(embeddings).max(axis=1) / 127.0).max()
    assert mae < max_step
    assert np.asarray(values).dtype == np.int8
    assert np.abs(np.asarray(values)).max() <= 127


def test_asymmetric_roundtrip(embeddings):
    values, scales, mins = qz.quantize_asymmetric(jnp.asarray(embeddings))
    recon = np.asarray(qz.dequantize_asymmetric(values, scales, mins))
    assert np.asarray(values).dtype == np.uint8
    step = np.asarray(scales).max()
    assert np.abs(recon - embeddings).max() <= step  # within one step


def test_int8_dot_matches_fp32(embeddings):
    queries = synthetic_corpus_embeddings(16, dim=128, seed=7)
    d_int8, d_scales = qz.quantize_symmetric(jnp.asarray(embeddings))
    q_int8, q_scales = qz.quantize_symmetric(jnp.asarray(queries))
    got = np.asarray(
        qz.int8_dot_product_batch(q_int8, d_int8, q_scales, d_scales)
    )
    want = queries @ embeddings.T
    # correlation must be extremely high (reference measured 0.99999)
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert corr > 0.999
    np.testing.assert_allclose(got, want, atol=0.05)


def test_asymmetric_search_matches_fp32_ranking(embeddings):
    queries = synthetic_corpus_embeddings(8, dim=128, seed=11)
    values, scales, mins = qz.quantize_asymmetric(jnp.asarray(embeddings))
    s_q, i_q = qz.int8_search_asymmetric(
        jnp.asarray(queries), values, scales, mins, k=10
    )
    s_f, i_f = qz.fp_search(jnp.asarray(queries), jnp.asarray(embeddings), k=10)
    i_q, i_f = np.asarray(i_q), np.asarray(i_f)
    for b in range(8):
        overlap = len(set(i_q[b]) & set(i_f[b])) / 10
        assert overlap >= 0.8, overlap
    # scores approximate the true dot products
    np.testing.assert_allclose(np.asarray(s_q), np.asarray(s_f), atol=0.05)


def test_retrieval_quality_preservation(embeddings):
    """fp32-vs-int8 P@10 overlap (reference bar: ~0.93+, BASELINE.md)."""
    queries = embeddings[:32] + 0.02 * np.random.RandomState(3).randn(
        32, 128
    ).astype(np.float32)
    d_int8, d_scales = qz.quantize_symmetric(jnp.asarray(embeddings))
    s8, i8 = qz.int8_search_symmetric(
        jnp.asarray(queries), d_int8, d_scales, k=10
    )
    sf, if_ = qz.fp_search(jnp.asarray(queries), jnp.asarray(embeddings), k=10)
    i8, if_ = np.asarray(i8), np.asarray(if_)
    overlaps = [len(set(i8[b]) & set(if_[b])) / 10 for b in range(32)]
    assert np.mean(overlaps) >= 0.9


def test_synthetic_query_embedding_deterministic():
    a = synthetic_query_embedding("what is an ETF", 64)
    b = synthetic_query_embedding("what is an ETF", 64)
    c = synthetic_query_embedding("different", 64)
    np.testing.assert_array_equal(a, b)
    assert not np.allclose(a, c)
    assert a.shape == (64,)
    np.testing.assert_allclose(np.linalg.norm(a), 1.0, rtol=1e-5)

def test_block_pruned_selection_matches_plain_topk():
    """Above the _select_topk width crossover (16*128 docs) the dense search
    routes through the block-max-pruned exact selection; its results must
    match plain lax.top_k over the full similarity matrix (modulo exact
    score ties, absent in this float fixture)."""
    docs = synthetic_corpus_embeddings(2500, dim=64, seed=5)
    queries = synthetic_corpus_embeddings(9, dim=64, seed=6)
    d8, ds = qz.quantize_symmetric(jnp.asarray(docs))
    vals, ids = qz.int8_search_symmetric(jnp.asarray(queries), d8, ds, k=13)
    # Plain reference selection over the dequantized similarity matrix.
    q8, qs = qz.quantize_symmetric(jnp.asarray(queries))
    full = np.asarray(qz.int8_dot_product_batch(q8, d8, qs, ds))
    ref_ids = np.argsort(-full, axis=1, kind="stable")[:, :13]
    np.testing.assert_array_equal(np.asarray(ids), ref_ids)
    np.testing.assert_allclose(
        np.asarray(vals), np.take_along_axis(full, ref_ids, axis=1), rtol=1e-6
    )


@pytest.mark.parametrize("fn_name", ["int8_search_symmetric", "fp_search"])
def test_packed_result_mode(fn_name):
    """packed=True returns one (B, 2k) f32 array: scores ‖ indices-as-values,
    bit-identical to the tuple mode."""
    docs = synthetic_corpus_embeddings(300, dim=32, seed=8)
    queries = synthetic_corpus_embeddings(4, dim=32, seed=9)
    if fn_name == "int8_search_symmetric":
        d8, ds = qz.quantize_symmetric(jnp.asarray(docs))
        args = (jnp.asarray(queries), d8, ds)
        fn = qz.int8_search_symmetric
    else:
        args = (jnp.asarray(queries), jnp.asarray(docs))
        fn = qz.fp_search
    vals, ids = fn(*args, k=7)
    packed = np.asarray(fn(*args, k=7, packed=True))
    assert packed.shape == (4, 14) and packed.dtype == np.float32
    np.testing.assert_array_equal(packed[:, :7], np.asarray(vals))
    np.testing.assert_array_equal(packed[:, 7:].astype(np.int32), np.asarray(ids))


def test_dense_engine_large_corpus_end_to_end():
    """DenseSearchEngine over a corpus wide enough for the block-pruned
    path, through the packed-fetch search_vectors surface."""
    from osr_tpu.retrieval.engine import DenseSearchEngine

    docs = synthetic_corpus_embeddings(2200, dim=48, seed=12)
    eng = DenseSearchEngine(
        [f"d{i}" for i in range(2200)], docs, quantization="symmetric"
    )
    queries = docs[:6] + 0.01 * np.random.RandomState(4).randn(6, 48).astype(
        np.float32
    )
    scores, ids = eng.search_vectors(queries, top_k=5)
    assert scores.shape == (6, 5) and ids.shape == (6, 5)
    assert (np.diff(scores, axis=1) <= 1e-6).all()  # descending
    # Each query's nearest neighbour is its own source document.
    np.testing.assert_array_equal(ids[:, 0], np.arange(6))


# ---------------------------------------------------------------------------
# int4 dense quantization (beyond the reference: nibble-packed corpus side,
# same trade as the sparse head's int4 mode — half the resident HBM)
# ---------------------------------------------------------------------------


def test_int4_roundtrip(embeddings):
    packed, scales = qz.quantize_symmetric_int4(jnp.asarray(embeddings))
    assert np.asarray(packed).dtype == np.uint8
    assert packed.shape == (embeddings.shape[0], embeddings.shape[1] // 2)
    codes = np.asarray(qz.unpack_int4_signed(packed))
    assert codes.dtype == np.int8
    assert codes.min() >= -7 and codes.max() <= 7
    recon = codes.astype(np.float32) * np.asarray(scales)[:, None]
    # max quantization step is absmax/7; mean error must be below half a step
    max_step = (np.abs(embeddings).max(axis=1) / 7.0).max()
    assert np.abs(recon - embeddings).mean() < max_step / 2 + 1e-6


def test_int4_pack_layout():
    """Block packing: byte c's LOW nibble = logical column c, HIGH nibble =
    column c + D/2 (two's complement) — the head convention, lane-concat
    decodable."""
    x = np.array([[0.7, -0.3, 0.1, -0.7]], dtype=np.float32)  # scale 0.1
    packed, scales = qz.quantize_symmetric_int4(jnp.asarray(x))
    p = np.asarray(packed)[0]
    np.testing.assert_allclose(np.asarray(scales), [0.1], rtol=1e-5)
    # codes: [7, -3, 1, -7]; bytes: (lo=7, hi=1), (lo=-3&0xF=13, hi=-7&0xF=9)
    assert p[0] == (7 | (1 << 4))
    assert p[1] == (13 | (9 << 4))
    codes = np.asarray(qz.unpack_int4_signed(packed))[0]
    np.testing.assert_array_equal(codes, [7, -3, 1, -7])


def test_int4_search_matches_manual_oracle(embeddings):
    docs = jnp.asarray(embeddings[:300])
    queries = jnp.asarray(embeddings[300:332])
    packed, ds = qz.quantize_symmetric_int4(docs)
    vals, ids = qz.int4_search_symmetric(queries, packed, ds, k=9)
    # oracle: dequantize both sides exactly as the kernel does
    q8, qs = qz.quantize_symmetric(queries)
    sims = (
        np.asarray(q8, np.float32) @ np.asarray(
            qz.unpack_int4_signed(packed), np.float32
        ).T
        * np.asarray(qs)[:, None]
        * np.asarray(ds)[None, :]
    )
    want = np.sort(sims, axis=1)[:, ::-1][:, :9]
    np.testing.assert_allclose(np.asarray(vals), want, rtol=1e-5)
    # int4 ranking stays close to fp32: top-10 overlap on unit-norm vectors
    fv, fi = qz.fp_search(queries, docs, k=10)
    _, ii = qz.int4_search_symmetric(queries, packed, ds, k=10)
    overlap = np.mean([
        len(set(np.asarray(fi)[r]) & set(np.asarray(ii)[r])) / 10.0
        for r in range(fi.shape[0])
    ])
    assert overlap >= 0.6, overlap  # clustered synthetic: int4 keeps ranks


def test_int4_odd_dim_raises():
    with pytest.raises(ValueError):
        qz.quantize_symmetric_int4(jnp.ones((4, 5)))


def test_numpy_quantizer_twins_match_jitted(embeddings):
    x = jnp.asarray(embeddings)
    v8, s8 = qz.quantize_symmetric(x)
    nv8, ns8 = qz.quantize_symmetric_np(embeddings)
    np.testing.assert_array_equal(np.asarray(v8), nv8)
    # XLA lowers x/127 as a reciprocal multiply: scales agree to 1 ulp
    np.testing.assert_allclose(np.asarray(s8), ns8, rtol=3e-7)
    p4, s4 = qz.quantize_symmetric_int4(x)
    np4, ns4 = qz.quantize_symmetric_int4_np(embeddings)
    np.testing.assert_array_equal(np.asarray(p4), np4)
    np.testing.assert_allclose(np.asarray(s4), ns4, rtol=3e-7)


@pytest.mark.parametrize("quantization", ["symmetric", "int4"])
def test_dense_engine_from_quantized_matches_regular(embeddings, quantization):
    """from_quantized (host-pre-quantized bytes only) must return exactly
    what the quantize-on-device constructor returns."""
    from osr_tpu.retrieval.engine import DenseSearchEngine

    doc_ids = [f"d{i}" for i in range(300)]
    docs = embeddings[:300]
    queries = embeddings[300:332]
    regular = DenseSearchEngine(doc_ids, docs, quantization=quantization)
    qfn = (
        qz.quantize_symmetric_np
        if quantization == "symmetric"
        else qz.quantize_symmetric_int4_np
    )
    rows, scales = qfn(docs)
    pre = DenseSearchEngine.from_quantized(
        doc_ids, rows, scales, quantization=quantization
    )
    s1, i1 = regular.search_vectors(queries, top_k=9)
    s2, i2 = pre.search_vectors(queries, top_k=9)
    np.testing.assert_allclose(s2, s1, rtol=1e-6)
    np.testing.assert_array_equal(i2, i1)

    with pytest.raises(ValueError):  # wrong dtype for the mode
        DenseSearchEngine.from_quantized(
            doc_ids, rows.astype(np.int16), scales, quantization=quantization
        )


@pytest.mark.parametrize(
    "quantization,backend",
    [("symmetric", "xla"), ("int4", "xla"),
     ("symmetric", "pallas"), ("int4", "pallas")],
)
def test_dense_from_quantized_chunked_matches_unchunked(
    embeddings, quantization, backend
):
    """Row-chunked dense scoring (from_quantized score_chunk_rows) must
    equal the single-sweep result — uneven last chunk included."""
    import unittest.mock as mock

    from osr_tpu.index.dense import synthetic_corpus_embeddings
    from osr_tpu.ops.pallas import matmul as pmm
    from osr_tpu.retrieval.engine import DenseSearchEngine

    dim = 256 if backend == "pallas" else 64
    emb = synthetic_corpus_embeddings(470, dim=dim, seed=21)
    docs, queries = emb[:437], emb[437:470]  # 437 = 3x160 + 117 leftover
    doc_ids = [f"d{i}" for i in range(437)]
    qfn = (
        qz.quantize_symmetric_np
        if quantization == "symmetric"
        else qz.quantize_symmetric_int4_np
    )
    rows, scales = qfn(docs)

    import contextlib

    if backend == "pallas":
        real4, real8 = pmm.int4_similarity_pallas, pmm.int8_similarity_pallas
        ctx = contextlib.ExitStack()
        ctx.enter_context(mock.patch.object(
            pmm, "int4_similarity_pallas",
            side_effect=lambda *a, **k: real4(*a, **{**k, "interpret": True}),
        ))
        ctx.enter_context(mock.patch.object(
            pmm, "int8_similarity_pallas",
            side_effect=lambda *a, **k: real8(*a, **{**k, "interpret": True}),
        ))
    else:
        ctx = contextlib.nullcontext()

    with ctx:
        flat = DenseSearchEngine.from_quantized(
            doc_ids, rows, scales, quantization=quantization, backend=backend
        )
        chunked = DenseSearchEngine.from_quantized(
            doc_ids, rows, scales, quantization=quantization,
            backend=backend,
            score_chunk_rows=128 if backend == "pallas" else 160,
        )
        assert chunked._chunks is not None and len(chunked._chunks) >= 3
        s1, i1 = flat.search_vectors(queries, top_k=9)
        s2, i2 = chunked.search_vectors(queries, top_k=9)
        np.testing.assert_allclose(s2, s1, rtol=1e-6)
        np.testing.assert_array_equal(i2, i1)
        # top_k past the last chunk's size still returns min(top_k, N)
        s3, i3 = chunked.search_vectors(queries[:4], top_k=200)
        assert s3.shape == (4, 200) and i3.shape == (4, 200)
        s4, i4 = flat.search_vectors(queries[:4], top_k=200)
        np.testing.assert_allclose(s3, s4, rtol=1e-6)
