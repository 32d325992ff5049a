"""Native (C++) component tests. Skipped when the library can't build."""

import re

import numpy as np
import pytest

native = pytest.importorskip("osr_tpu.native")

from osr_tpu.index.builder import SparseIndexBuilder
from osr_tpu.retrieval.engine import SparseSearchEngine

from tests.reference_impl import DenseOracleScorer, zipf_corpus, zipf_queries


@pytest.mark.parametrize(
    "text",
    [
        "Hello, World! 123 foo_bar",
        "UPPER lower MiXeD",
        "",
        "   ...   ",
        "tabs\tand\nnewlines here",
        "a" * 3000,
        "digits 007 under_score __lead trail__",
    ],
)
def test_ascii_tokenize_matches_regex(text):
    assert native.ascii_tokenize(text) == re.findall(r"\b\w+\b", text.lower())


def test_zlib_roundtrip():
    raw = b"the quick brown fox " * 123
    comp = native.zlib_compress(raw)
    assert len(comp) < len(raw)
    assert native.zlib_decompress(comp, len(raw)) == raw
    with pytest.raises(ValueError):
        native.zlib_decompress(b"garbage", 10)


def test_native_counting_equals_python():
    corpus = zipf_corpus(num_docs=60, vocab_size=150, avg_len=25)
    corpus["empty"] = {"text": ""}
    corpus["punct"] = {"text": "!!! ??? ..."}
    texts = [d["text"] for d in corpus.values()]
    got = SparseIndexBuilder._count_corpus_native(texts)
    want = SparseIndexBuilder._count_corpus_python(texts)
    assert got is not None
    g_vocab, g_df, g_dl, g_indptr, g_tids, g_tfs = got
    w_vocab, w_df, w_dl, w_indptr, w_tids, w_tfs = want
    assert g_vocab == w_vocab
    np.testing.assert_array_equal(g_df, w_df)
    np.testing.assert_array_equal(g_dl, w_dl)
    np.testing.assert_array_equal(g_indptr, w_indptr)
    np.testing.assert_array_equal(g_tids, w_tids)
    np.testing.assert_array_equal(g_tfs, w_tfs)


def test_native_path_falls_back_on_unicode():
    texts = ["ünïcode text", "plain ascii"]
    assert SparseIndexBuilder._count_corpus_native(texts) is None


def test_index_built_via_native_matches_oracle():
    corpus = zipf_corpus(num_docs=100, vocab_size=300, avg_len=30)
    queries = zipf_queries(num_queries=8, vocab_size=300)
    oracle = DenseOracleScorer(corpus, method="bm25")
    engine = SparseSearchEngine(
        SparseIndexBuilder(head_dtype="f32").build(corpus)
    )
    got = engine.score_all(list(queries.values()))
    for i, text in enumerate(queries.values()):
        np.testing.assert_allclose(
            got[i], oracle.score(text).astype(np.float32), atol=1e-3, rtol=1e-4
        )
