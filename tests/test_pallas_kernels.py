"""Pallas kernel tests (interpret mode on the CPU test platform; the same
kernels compile through Mosaic on TPU — exercised by bench/TPU runs)."""

import numpy as np
import jax.numpy as jnp
import pytest

from osr_tpu.ops import quantize as qz
from osr_tpu.ops.pallas.matmul import int8_similarity_pallas
from osr_tpu.ops.pallas.quantize import (
    dequantize_symmetric_pallas,
    quantize_symmetric_pallas,
)
from osr_tpu.index.dense import synthetic_corpus_embeddings


@pytest.fixture(scope="module")
def embeddings():
    return synthetic_corpus_embeddings(256, dim=128, seed=42)


def test_pallas_quantize_matches_xla(embeddings):
    v_p, s_p = quantize_symmetric_pallas(jnp.asarray(embeddings), interpret=True)
    v_x, s_x = qz.quantize_symmetric(jnp.asarray(embeddings))
    np.testing.assert_array_equal(np.asarray(v_p), np.asarray(v_x))
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_x), rtol=1e-6)
    recon = dequantize_symmetric_pallas(v_p, s_p, interpret=True)
    np.testing.assert_allclose(
        np.asarray(recon),
        np.asarray(qz.dequantize_symmetric(v_x, s_x)),
        rtol=1e-6,
    )


def test_pallas_stochastic_quantize_unbiased(embeddings):
    import jax

    if jax.devices()[0].platform != "tpu":
        pytest.skip(
            "pltpu.prng_seed has no interpret-mode lowering on CPU; "
            "validated on real TPU (see scripts in DEVELOPMENT.md)"
        )
    x = jnp.asarray(embeddings[:64])
    seeds = [jnp.asarray([s], jnp.int32) for s in range(8)]
    recons = []
    for seed in seeds:
        v, s = quantize_symmetric_pallas(
            x, seed, stochastic=True, interpret=True
        )
        assert np.abs(np.asarray(v)).max() <= 127
        recons.append(np.asarray(dequantize_symmetric_pallas(v, s, interpret=True)))
    mean_recon = np.mean(recons, axis=0)
    det_v, det_s = qz.quantize_symmetric(x)
    det_err = np.abs(
        np.asarray(qz.dequantize_symmetric(det_v, det_s)) - embeddings[:64]
    ).mean()
    stoch_err = np.abs(mean_recon - embeddings[:64]).mean()
    # Averaging over seeds must reduce error (unbiasedness), and each
    # single draw must stay within one quantization step.
    assert stoch_err < det_err * 1.5
    step = (np.abs(embeddings[:64]).max(axis=1) / 127.0).max()
    assert np.abs(recons[0] - embeddings[:64]).max() <= step + 1e-6


def test_pallas_int8_similarity_matches_xla(embeddings):
    queries = synthetic_corpus_embeddings(128, dim=128, seed=9)
    q8, qs = qz.quantize_symmetric(jnp.asarray(queries))
    d8, ds = qz.quantize_symmetric(jnp.asarray(embeddings))
    got = int8_similarity_pallas(q8, d8, qs, ds, interpret=True)
    want = qz.int8_dot_product_batch(q8, d8, qs, ds)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_dense_engine_pallas_backend_matches_xla(embeddings):
    """DenseSearchEngine(backend='pallas') must return the XLA backend's
    results exactly (interpret mode on CPU; Mosaic-compiled on TPU)."""
    import unittest.mock as mock

    from osr_tpu.ops.pallas import matmul as pmm
    from osr_tpu.retrieval.engine import DenseSearchEngine

    doc_ids = [f"d{i}" for i in range(200)]  # 200: exercises row padding
    emb = embeddings[:200]
    queries = embeddings[200:230]  # 30: exercises query padding

    real = pmm.int8_similarity_pallas

    def interp(*args, **kw):
        kw["interpret"] = True
        return real(*args, **kw)

    with mock.patch.object(pmm, "int8_similarity_pallas", side_effect=interp):
        pal = DenseSearchEngine(doc_ids, emb, backend="pallas")
        s_p, i_p = pal.search_vectors(queries, top_k=7)
    xla = DenseSearchEngine(doc_ids, emb, backend="xla")
    s_x, i_x = xla.search_vectors(queries, top_k=7)
    np.testing.assert_allclose(s_p, s_x, rtol=1e-6)
    np.testing.assert_array_equal(i_p, i_x)

    with pytest.raises(ValueError):
        DenseSearchEngine(doc_ids, emb, backend="pallas", quantization="asymmetric")


def test_pallas_head_blockmax_matches_xla():
    """Fused scores+blockmax kernel: scores == the XLA chain exactly, and
    the in-kernel block maxima == maxima computed from the score matrix —
    so block_topk_from_max(scores, bmax) == block_topk(scores)."""
    import jax

    from osr_tpu.ops.bm25 import head_scores
    from osr_tpu.ops.pallas.head import masked_head_scores_blockmax
    from osr_tpu.ops.topk import block_topk, block_topk_from_max

    rng = np.random.RandomState(3)
    r, f, b = 700, 160, 9  # unaligned on every axis
    head = rng.randint(-127, 128, (r, f)).astype(np.int8)
    scales = (rng.rand(f).astype(np.float32) + 0.1) / 127.0
    qhead = rng.randint(0, 4, (b, f)).astype(np.float32)
    valid = rng.rand(r) > 0.1

    interp = jax.devices()[0].platform != "tpu"
    hs, bmax = masked_head_scores_blockmax(
        jnp.asarray(head),
        jnp.asarray(scales),
        jnp.asarray(qhead),
        jnp.asarray(valid),
        interpret=interp,
    )
    want = head_scores(
        jnp.asarray(head), jnp.asarray(scales), jnp.asarray(qhead)
    )
    want = jnp.where(jnp.asarray(valid)[None, :], want, -jnp.inf)
    np.testing.assert_allclose(np.asarray(hs), np.asarray(want), rtol=1e-6)

    # Block maxima vs a NumPy reduction over the padded score matrix.
    padded = np.pad(
        np.asarray(want), ((0, 0), (0, (-r) % 128)),
        constant_values=-np.inf,
    )
    want_bmax = padded.reshape(b, -1, 128).max(axis=2)
    np.testing.assert_array_equal(np.asarray(bmax), want_bmax)

    v1, r1 = block_topk_from_max(hs, bmax, k=7)
    v2, r2 = block_topk(hs, k=7)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_pallas_head_scores_match_xla():
    """Fused Mosaic head-scoring kernel == the XLA int8 chain, exactly
    (same bf16 operand rounding, f32 accumulation, -inf mask)."""
    import jax

    from osr_tpu.ops.bm25 import head_scores
    from osr_tpu.ops.pallas.head import masked_head_scores

    rng = np.random.RandomState(0)
    r, f, b = 300, 160, 17  # deliberately unaligned: exercises padding
    head = rng.randint(-127, 128, (r, f)).astype(np.int8)
    scales = (rng.rand(f).astype(np.float32) + 0.1) / 127.0
    qhead = rng.randint(0, 4, (b, f)).astype(np.float32)
    valid = rng.rand(r) > 0.1

    got = masked_head_scores(
        jnp.asarray(head),
        jnp.asarray(scales),
        jnp.asarray(qhead),
        jnp.asarray(valid),
        interpret=jax.devices()[0].platform != "tpu",
    )
    want = head_scores(
        jnp.asarray(head), jnp.asarray(scales), jnp.asarray(qhead)
    )
    want = jnp.where(jnp.asarray(valid)[None, :], want, -jnp.inf)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-6
    )


def test_pallas_blocktopm_matches_oracle():
    """Extraction kernel: per-block top-m (values, global rows) == a NumPy
    top-m over the XLA score matrix, including tie order (lowest lane
    first) and -inf padding blocks."""
    import jax

    from osr_tpu.ops.bm25 import head_scores
    from osr_tpu.ops.pallas.head import masked_head_blocktopm

    rng = np.random.RandomState(5)
    r, f, b, m = 700, 160, 9, 4  # unaligned rows: padding blocks all -inf
    head = rng.randint(-127, 128, (r, f)).astype(np.int8)
    scales = (rng.rand(f).astype(np.float32) + 0.1) / 127.0
    qhead = rng.randint(0, 4, (b, f)).astype(np.float32)
    valid = rng.rand(r) > 0.1

    interp = jax.devices()[0].platform != "tpu"
    vals, rows = masked_head_blocktopm(
        jnp.asarray(head),
        jnp.asarray(scales),
        jnp.asarray(qhead),
        jnp.asarray(valid),
        m=m,
        interpret=interp,
    )
    want = head_scores(
        jnp.asarray(head), jnp.asarray(scales), jnp.asarray(qhead)
    )
    want = np.asarray(
        jnp.where(jnp.asarray(valid)[None, :], want, -jnp.inf)
    )
    g = vals.shape[1]
    padded = np.pad(
        want, ((0, 0), (0, g * 128 - r)), constant_values=-np.inf
    ).reshape(b, g, 128)
    # NumPy oracle with lax.top_k tie semantics: sort by (-value, lane).
    order = np.lexsort(
        (np.broadcast_to(np.arange(128), padded.shape), -padded), axis=2
    )[:, :, :m]
    want_vals = np.take_along_axis(padded, order, axis=2)
    np.testing.assert_array_equal(np.asarray(vals), want_vals)
    want_rows = order + (np.arange(g) * 128)[None, :, None]
    got_rows = np.asarray(rows)
    # Row identity matters only where the value is finite (all -inf
    # blocks: any lane is equally correct).
    finite = np.isfinite(want_vals)
    np.testing.assert_array_equal(got_rows[finite], want_rows[finite])


def test_fused_search_extract_bit_identical_when_safe():
    """fused_search_extract == fused_search_packed (packed layout, bit
    for bit) on spread-out scores, with the tie-safety flag clear; on
    adversarially clustered scores the flag must fire."""
    import jax

    from osr_tpu.ops import bm25 as ops

    rng = np.random.RandomState(11)
    r, f, b, k = 6144, 256, 8, 20
    head = rng.randint(-127, 128, (r, f)).astype(np.int8)
    scales = (rng.rand(f).astype(np.float32) + 0.1) / 127.0
    valid = np.ones(r, dtype=bool)
    q = 8
    ids = np.stack(
        [rng.choice(f, size=q, replace=False) for _ in range(b)]
    ).astype(np.int32)
    w = rng.random((b, q)).astype(np.float32)
    packed_q = jnp.asarray(ops.pack_query_batch(ids, w))
    empty = jnp.zeros(0, jnp.int32)
    interp = jax.devices()[0].platform != "tpu"

    got = np.asarray(
        ops.fused_search_extract(
            packed_q,
            jnp.asarray(head),
            jnp.asarray(scales),
            jnp.asarray(valid),
            head_terms=f,
            k=k,
            narrow_m=8,
            interpret=interp,
        )
    )
    flag, got_pk = got[:, -1], got[:, :-1]
    want_pk, _ = ops.fused_search_packed(
        packed_q,
        empty,
        empty,
        jnp.asarray(head),
        jnp.asarray(scales),
        jnp.asarray(valid),
        head_terms=f,
        k=k,
        head_backend="pallas" if not interp else "xla",
    )
    assert (flag == 0.0).all()
    np.testing.assert_array_equal(got_pk, np.asarray(want_pk))

    # Clustered case: one head row block repeated so > m of the top-k
    # share a 128-row block -> the flag must fire.
    head2 = head.copy()
    head2[256 : 256 + 30] = 127  # 30 near-identical very strong rows
    got2 = np.asarray(
        ops.fused_search_extract(
            packed_q,
            jnp.asarray(head2),
            jnp.asarray(scales),
            jnp.asarray(valid),
            head_terms=f,
            k=k,
            narrow_m=8,
            interpret=interp,
        )
    )
    assert (got2[:, -1] == 1.0).all()


def test_engine_extract_backend_matches_standard():
    """SparseSearchEngine(narrow_backend='extract') end-to-end == the
    standard engine, dict-for-dict (CPU: interpret-mode kernel)."""
    from osr_tpu.index.builder import SparseIndexBuilder
    from osr_tpu.retrieval.engine import SparseSearchEngine
    from osr_tpu.testing import SyntheticDataGenerator

    gen = SyntheticDataGenerator(seed=42)
    corpus = gen.zipf_corpus(6000, 20_000, avg_len=60, word_prefix="t")
    queries = gen.queries(24, 20_000, avg_terms=8, word_prefix="t")
    index = SparseIndexBuilder(method="bm25").build(corpus)

    ex = SparseSearchEngine(
        index,
        batch_sizes=(24,),
        cache_queries=False,
        head_backend="pallas",
        narrow_m=8,
        narrow_backend="extract",
    )
    assert ex._use_extract(10)
    std = SparseSearchEngine(index, batch_sizes=(24,), cache_queries=False)
    r_ex = ex.search(queries, top_k=10)
    r_std = std.search(queries, top_k=10)
    assert r_ex == r_std


def test_int4_similarity_pallas_matches_xla_decode():
    """The VMEM nibble-decode kernel must reproduce the XLA
    unpack-then-int8-dot chain bit-for-bit (same integer arithmetic,
    same f32 scale epilogue)."""
    from osr_tpu.ops import quantize as qz
    from osr_tpu.ops.pallas import matmul as pmm

    rng = np.random.default_rng(7)
    docs = rng.standard_normal((256, 256)).astype(np.float32)
    queries = rng.standard_normal((64, 256)).astype(np.float32)
    packed, ds = qz.quantize_symmetric_int4(jnp.asarray(docs))
    q8, qs = qz.quantize_symmetric(
        jnp.pad(jnp.asarray(queries), ((0, 64), (0, 0)))
    )
    got = pmm.int4_similarity_pallas(q8, packed, qs, ds, interpret=True)
    want = qz.int8_dot_product_batch(
        q8, qz.unpack_int4_signed(packed), qs, ds
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    with pytest.raises(ValueError):  # unaligned packed width
        pmm.int4_similarity_pallas(
            q8[:, :128], packed[:, :64], qs, ds, interpret=True
        )


def test_dense_engine_int4_pallas_matches_xla():
    """DenseSearchEngine(quantization='int4', backend='pallas') returns
    the int4 XLA backend's results exactly (interpret on CPU), and the
    resident corpus really is nibble-packed."""
    import unittest.mock as mock

    from osr_tpu.index.dense import synthetic_corpus_embeddings
    from osr_tpu.ops.pallas import matmul as pmm
    from osr_tpu.retrieval.engine import DenseSearchEngine

    emb = synthetic_corpus_embeddings(230, dim=256, seed=11)
    doc_ids = [f"d{i}" for i in range(200)]  # exercises row padding
    queries = emb[200:230]

    real = pmm.int4_similarity_pallas

    def interp(*args, **kw):
        kw["interpret"] = True
        return real(*args, **kw)

    with mock.patch.object(
        pmm, "int4_similarity_pallas", side_effect=interp
    ):
        pal = DenseSearchEngine(
            doc_ids, emb[:200], quantization="int4", backend="pallas"
        )
        assert pal._docs.dtype == jnp.uint8
        assert pal._docs.shape[1] == 128  # dim/2: half the int8 bytes
        s_p, i_p = pal.search_vectors(queries, top_k=7)
    xla = DenseSearchEngine(doc_ids, emb[:200], quantization="int4")
    s_x, i_x = xla.search_vectors(queries, top_k=7)
    np.testing.assert_allclose(s_p, s_x, rtol=1e-6)
    np.testing.assert_array_equal(i_p, i_x)

    with pytest.raises(ValueError):  # dim/2 not lane-aligned
        DenseSearchEngine(
            doc_ids,
            np.asarray(emb[:200, :130]),
            quantization="int4",
            backend="pallas",
        )


def test_engine_extract_backend_matches_standard_chunked():
    """Chunked scoring with narrow_backend='extract': per-chunk Mosaic
    top-m extraction (score matrix never at full Rc) must match the
    standard chunked engine dict-for-dict. Chunk shapes are equalized
    by _DeviceIndex, so every chunk takes the extract kernel here."""
    from osr_tpu.index.builder import SparseIndexBuilder
    from osr_tpu.retrieval.engine import SparseSearchEngine
    from osr_tpu.testing import SyntheticDataGenerator

    gen = SyntheticDataGenerator(seed=42)
    corpus = gen.zipf_corpus(10_000, 20_000, avg_len=60, word_prefix="t")
    queries = gen.queries(24, 20_000, avg_terms=8, word_prefix="t")
    index = SparseIndexBuilder(method="bm25").build(corpus)

    ex = SparseSearchEngine(
        index,
        batch_sizes=(24,),
        cache_queries=False,
        head_backend="pallas",
        narrow_m=8,
        narrow_backend="extract",
        score_chunk_rows=4096,
    )
    assert ex._dev.chunks is not None and len(ex._dev.chunks) == 3
    assert ex._use_extract_chunked(10)
    std = SparseSearchEngine(
        index, batch_sizes=(24,), cache_queries=False,
        score_chunk_rows=4096,
    )
    r_ex = ex.search(queries, top_k=10)
    r_std = std.search(queries, top_k=10)
    assert r_ex == r_std
    # and equal to the unchunked engine too
    flat = SparseSearchEngine(index, batch_sizes=(24,), cache_queries=False)
    assert r_ex == flat.search(queries, top_k=10)


def test_engine_extract_chunked_unsafe_flag_falls_back(monkeypatch):
    """A raised tie-safety flag must re-dispatch the standard chunked
    program — results identical, never trusting the narrowed set."""
    import osr_tpu.ops.bm25 as bm25_ops
    from osr_tpu.index.builder import SparseIndexBuilder
    from osr_tpu.retrieval.engine import SparseSearchEngine
    from osr_tpu.testing import SyntheticDataGenerator

    gen = SyntheticDataGenerator(seed=42)
    corpus = gen.zipf_corpus(10_000, 20_000, avg_len=60, word_prefix="t")
    queries = gen.queries(12, 20_000, avg_terms=8, word_prefix="t")
    index = SparseIndexBuilder(method="bm25").build(corpus)

    real = bm25_ops.fused_search_extract

    calls = {"n": 0}

    def always_unsafe(*args, **kwargs):
        calls["n"] += 1
        out = real(*args, **kwargs)
        return out.at[:, -1].set(1.0)

    monkeypatch.setattr(bm25_ops, "fused_search_extract", always_unsafe)
    ex = SparseSearchEngine(
        index,
        batch_sizes=(12,),
        cache_queries=False,
        head_backend="pallas",
        narrow_m=8,
        narrow_backend="extract",
        score_chunk_rows=4096,
    )
    r_ex = ex.search(queries, top_k=10)
    std = SparseSearchEngine(
        index, batch_sizes=(12,), cache_queries=False,
        score_chunk_rows=4096,
    )
    assert calls["n"] > 0, "extract kernel was never invoked"
    assert r_ex == std.search(queries, top_k=10)


def test_engine_extract_backend_int4_head(monkeypatch):
    """extract backend over an int4-packed head (flat AND chunked) must
    match the standard int4 engine dict-for-dict."""
    from osr_tpu.index.builder import SparseIndexBuilder
    from osr_tpu.retrieval.engine import SparseSearchEngine
    from osr_tpu.testing import SyntheticDataGenerator

    gen = SyntheticDataGenerator(seed=42)
    corpus = gen.zipf_corpus(10_000, 20_000, avg_len=60, word_prefix="t")
    queries = gen.queries(16, 20_000, avg_terms=8, word_prefix="t")
    index = SparseIndexBuilder(method="bm25", head_dtype="int4").build(corpus)

    std = SparseSearchEngine(index, batch_sizes=(16,), cache_queries=False)
    want = std.search(queries, top_k=10)
    for chunk_rows in (None, 4096):
        ex = SparseSearchEngine(
            index,
            batch_sizes=(16,),
            cache_queries=False,
            head_backend="pallas",
            narrow_m=8,
            narrow_backend="extract",
            score_chunk_rows=chunk_rows,
        )
        if chunk_rows:
            assert ex._use_extract_chunked(10)
        else:
            assert ex._use_extract(10)
        assert ex.search(queries, top_k=10) == want, f"chunk={chunk_rows}"


def test_engine_extract_chunked_below_floor_uses_standard_path():
    """When the equalized chunk size is below the extraction kernel's
    shape floor, _use_extract_chunked must decline and the engine must
    fall through to the standard chunked program (still correct)."""
    from osr_tpu.index.builder import SparseIndexBuilder
    from osr_tpu.retrieval.engine import SparseSearchEngine
    from osr_tpu.testing import SyntheticDataGenerator

    gen = SyntheticDataGenerator(seed=42)
    corpus = gen.zipf_corpus(10_000, 20_000, avg_len=60, word_prefix="t")
    queries = gen.queries(12, 20_000, avg_terms=8, word_prefix="t")
    index = SparseIndexBuilder(method="bm25").build(corpus)

    ex = SparseSearchEngine(
        index,
        batch_sizes=(12,),
        cache_queries=False,
        head_backend="pallas",
        narrow_m=8,
        narrow_backend="extract",
        score_chunk_rows=2048,
    )
    assert ex._dev.chunks is not None
    assert ex._dev.chunks[0][0].shape[0] < 4096
    # The floor declines (all chunks equalized below 4096 rows), so the
    # engine would take the standard chunked program — which on CPU
    # cannot run the non-interpret Mosaic head; on TPU it just works.
    assert not ex._use_extract_chunked(10)
    # Correctness of the declined path at this chunking, CPU backend:
    auto = SparseSearchEngine(
        index, batch_sizes=(12,), cache_queries=False,
        narrow_m=8, narrow_backend="extract", score_chunk_rows=2048,
    )
    assert not auto._use_extract_chunked(10)  # auto backend = xla on CPU
    std = SparseSearchEngine(
        index, batch_sizes=(12,), cache_queries=False,
        score_chunk_rows=2048,
    )
    assert auto.search(queries, top_k=10) == std.search(queries, top_k=10)
