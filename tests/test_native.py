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


@pytest.mark.parametrize("method", ["bm25", "tfidf"])
@pytest.mark.parametrize("head_terms", [0, 32, 150])
def test_pack_hybrid_parity(method, head_terms):
    """The fused C++ weight+pack produces arrays BIT-identical to the NumPy
    compute_weights_flat + pack_flat reference path (int8 head)."""
    from osr_tpu.index.builder import compute_weights_flat, bm25_idf, tfidf_idf
    from osr_tpu.index.layout import DOC_ALIGN, _round_up, pack_flat

    corpus = zipf_corpus(num_docs=70, vocab_size=150, avg_len=40)
    texts = [d["text"] for d in corpus.values()]
    vocab, df, dl, indptr, tids, tfs = SparseIndexBuilder._count_corpus_python(
        texts
    )
    num_docs, vocab_size = len(texts), len(vocab)
    head_terms = min(head_terms, vocab_size)
    avgdl = float(dl.mean())
    idf = (
        bm25_idf(df, num_docs) if method == "bm25" else tfidf_idf(df, num_docs)
    )
    k1, b = 1.2, 0.75

    weights = compute_weights_flat(
        tids, tfs, indptr, dl, idf, method, k1, b, avgdl
    )
    doc_idx = np.repeat(np.arange(num_docs, dtype=np.int64), np.diff(indptr))
    want = pack_flat(
        doc_idx, tids, weights, num_docs, vocab_size,
        head_terms=head_terms, head_dtype="int8",
    )

    rows = max(_round_up(num_docs, DOC_ALIGN), DOC_ALIGN)
    head, scales, post_ptr, post_rows, post_w = (
        native.pack_hybrid_int8_native(
            indptr, tids, tfs, dl, idf, rows, head_terms, vocab_size,
            method, k1, b, avgdl,
        )
    )
    np.testing.assert_array_equal(head, want.head)
    np.testing.assert_array_equal(scales, want.head_scales)
    np.testing.assert_array_equal(post_ptr, want.post_ptr)
    np.testing.assert_array_equal(post_rows, want.post_rows)
    np.testing.assert_array_equal(post_w, want.post_weights)


def test_thread_override_roundtrip():
    try:
        native.set_num_threads(4)
        assert native.get_num_threads() == 4
    finally:
        native.set_num_threads(0)
    assert native.get_num_threads() >= 1


def test_multithreaded_host_identical_to_single_thread():
    """Forcing n_threads>1 through the WHOLE host runtime (query encode,
    tail walk, candidate head-dot, merge) yields bit-identical search
    results to single-threaded on a >=10k-doc corpus: every parallel
    section partitions work deterministically and each thread owns a
    disjoint output range (VERDICT r2 item 2)."""
    corpus = zipf_corpus(num_docs=12_000, vocab_size=8_000, avg_len=40)
    queries = zipf_queries(num_queries=64, vocab_size=8_000)
    index = SparseIndexBuilder().build(corpus)  # int8 production head
    engine = SparseSearchEngine(index, cache_queries=False)
    assert engine.merge_backend == "host"  # the C++ runtime is in play
    try:
        native.set_num_threads(1)
        single = engine.search(queries, top_k=20)
        native.set_num_threads(4)
        multi = engine.search(queries, top_k=20)
    finally:
        native.set_num_threads(0)
    # Dict equality compares doc ids, ORDER, and exact float scores.
    assert single == multi


def test_multithreaded_kernels_identical_to_single_thread():
    """Kernel-level determinism: the individual native entry points give
    byte-identical outputs at 1 vs 5 threads (including thread counts
    that don't divide the work evenly)."""
    corpus = zipf_corpus(num_docs=10_000, vocab_size=6_000, avg_len=35)
    queries = list(zipf_queries(num_queries=97, vocab_size=6_000).values())
    index = SparseIndexBuilder().build(corpus)
    lay = index.layout
    vocab_terms = [""] * len(index.vocabulary)
    for t, i in index.vocabulary.items():
        vocab_terms[i] = t
    nv = native.NativeVocab(vocab_terms)

    def run_all():
        tids, counts, ptr = nv.encode_queries(queries)
        in_head = tids < lay.head_terms
        qidx = np.repeat(
            np.arange(len(queries), dtype=np.int64), np.diff(ptr)
        )
        t_ptr = np.zeros(len(queries) + 1, dtype=np.int64)
        np.cumsum(
            np.bincount(qidx[~in_head], minlength=len(queries)),
            out=t_ptr[1:],
        )
        rows, cols, tail, qptr, total = native.tail_candidates_native(
            lay.post_ptr, lay.post_rows, lay.post_weights,
            (tids[~in_head] - lay.head_terms).astype(np.int32),
            counts[~in_head], t_ptr,
        )
        h_ptr = np.zeros(len(queries) + 1, dtype=np.int64)
        np.cumsum(
            np.bincount(qidx[in_head], minlength=len(queries)),
            out=h_ptr[1:],
        )
        cand_head = native.cand_head_dot_native(
            lay.head, lay.head_dtype, lay.head_scales, rows, cols, total,
            tids[in_head], counts[in_head], h_ptr,
        )
        return tids, counts, ptr, rows[:total], tail[:total], qptr, cand_head

    try:
        native.set_num_threads(1)
        base = run_all()
        native.set_num_threads(5)
        got = run_all()
    finally:
        native.set_num_threads(0)
    for a, b in zip(base, got):
        np.testing.assert_array_equal(a, b)


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


def test_blake2b64_matches_hashlib():
    import hashlib
    import random

    random.seed(7)
    cases = [b"", b"a", b"the", "naïve café".encode("utf-8"),
             b"x" * 127, b"y" * 128, b"z" * 129, b"w" * 300, b"q" * 1000]
    cases += [random.randbytes(random.randrange(0, 260)) for _ in range(200)]
    for c in cases:
        want = int.from_bytes(
            hashlib.blake2b(c, digest_size=8).digest(), "little"
        )
        assert native.blake2b64(c) == want, c[:24]


def _hash_texts(n=200, seed=3):
    import random

    random.seed(seed)
    vocab = [f"w{i}" for i in range(800)] + ["naïve", "Ωmega", "café"]
    texts = [
        " ".join(random.choices(vocab, k=random.randrange(1, 120)))
        for _ in range(n)
    ]
    texts += ["", "   ", "!!! ...", "solo", "rep rep rep rep"]
    return texts


@pytest.mark.parametrize("idf", [False, True])
def test_native_hashing_encoder_bit_identical_to_python(idf):
    from osr_tpu.encoders import HashingEncoder

    texts = _hash_texts()
    nat = HashingEncoder(dim=256, idf=idf, native="force")
    py = HashingEncoder(dim=256, idf=idf, native="off")
    assert nat._nb is not None and py._nb is None
    e_nat = nat.encode(texts)
    e_py = py.encode(texts)
    np.testing.assert_array_equal(e_nat, e_py)
    # Query path (post-fit) and single-vs-batch consistency.
    for q in ("w1 w2 unseenterm", "naïve café", ""):
        np.testing.assert_array_equal(nat.encode_one(q), py.encode_one(q))
        np.testing.assert_array_equal(
            nat.encode([q])[0], nat.encode_one(q)
        )
    if idf:
        for f in ("w1", "w1 w2", "never-seen-feature"):
            assert nat._idf(py._hash(f)) == py._idf(py._hash(f))


def test_native_hashing_encoder_thread_determinism():
    from osr_tpu.encoders import HashingEncoder

    texts = _hash_texts(n=400, seed=11)
    enc = HashingEncoder(dim=128, idf=True, native="force")
    try:
        native.set_num_threads(1)
        one = enc.encode(texts)
        native.set_num_threads(4)
        four = enc.encode(texts)
    finally:
        native.set_num_threads(0)
    np.testing.assert_array_equal(one, four)
