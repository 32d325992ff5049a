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
