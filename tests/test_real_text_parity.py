"""Real-text parity: the full tokenize→index→search path on real English
prose (unicode, punctuation, numerals, mixed case) versus the in-process
REFERENCE retriever and the reference's own tokenizer regex.

The synthetic-Zipf parity suite (tests/test_reference_parity.py) proves
score/formula parity but only ever feeds ASCII ``t123``-style tokens
through the pipeline. Tokenizer fidelity is the single biggest quality
risk named in SURVEY.md §7.3 — the reference tokenizes with
``re.findall(r'\\b\\w+\\b', text.lower())`` (reference
rag_system/core/retrieval.py:148), which is unicode-aware in Python —
so here the corpus is REAL prose taken from the reference repository's
own markdown files (available offline, containing genuine non-ASCII
characters), exercising:

- the C++ ASCII fast paths (native tf_build corpus counting + NativeVocab
  query encoding) on the ASCII-only subset, and
- the Python fallbacks (regex tokenizer + Counter counting) on the mixed
  corpus — the builder and query encoder both route per-batch on
  ``str.isascii()``.
"""

import importlib.util
import re
import sys
from pathlib import Path

import numpy as np
import pytest

from osr_tpu.index.builder import SparseIndexBuilder
from osr_tpu.index.tokenizer import tokenize
from osr_tpu.retrieval.engine import SparseSearchEngine

REFERENCE_ROOT = Path("/root/reference")
REFERENCE_PIPELINE = (
    REFERENCE_ROOT / "rag_system/pipeline/evaluate_rag_pipeline.py"
)
PROSE_FILES = (
    "README.md",
    "DEVELOPMENT.md",
    "PROJECT_STATUS.md",
    "REPRO.md",
    "report/rag_pipeline_report.md",
    "report/week1.md",
)

pytestmark = pytest.mark.skipif(
    not REFERENCE_PIPELINE.exists(), reason="reference repo not mounted"
)

# The reference's exact tokenizer (reference retrieval.py:148), compiled
# independently of osr_tpu so the comparison can't share code.
_REF_TOKEN_RE = re.compile(r"\b\w+\b")


def _reference_tokens(text):
    return _REF_TOKEN_RE.findall(text.lower())


# Hand-written documents that force the non-ASCII Python fallback: accented
# latin, ligatures, CJK, numerals mixed into words, em-dashes, curly quotes.
UNICODE_DOCS = [
    "Führer Müller's naïve café — a résumé of the PIÈCE de résistance, "
    "priced at €42.50 (≈ $45).",
    "株式会社の検索エンジン performance: 3.2ms per query, nDCG@10 = 0.159.",
    "İstanbul'da BM25 skorlaması — Türkçe diakritikler: ğ, ş, ç, ö, ü.",
    "Straße vs strasse: German ß lowercases distinctly; Σίσυφος → σίσυφος.",
    "Ячейка №7 содержит 1024 документа, средняя длина — 130 токенов.",
]


@pytest.fixture(scope="module")
def real_paragraphs():
    """Paragraph-chunked real prose from the reference repo's markdown."""
    paras = []
    for rel in PROSE_FILES:
        p = REFERENCE_ROOT / rel
        if not p.exists():
            continue
        for chunk in p.read_text(encoding="utf-8").split("\n\n"):
            chunk = chunk.strip()
            if len(chunk) >= 80:
                paras.append(chunk)
    assert len(paras) >= 100, "expected ≥100 real paragraphs"
    return paras


@pytest.fixture(scope="module")
def mixed_corpus(real_paragraphs):
    """Real prose + unicode docs → the Python-fallback build path."""
    corpus = {
        f"p{i}": {"text": t} for i, t in enumerate(real_paragraphs)
    }
    for i, t in enumerate(UNICODE_DOCS):
        corpus[f"u{i}"] = {"text": t}
    assert any(not t.isascii() for t in real_paragraphs) or UNICODE_DOCS
    return corpus


@pytest.fixture(scope="module")
def ascii_corpus(real_paragraphs):
    """The ASCII-only subset → the C++ tf_build fast path."""
    docs = [t for t in real_paragraphs if t.isascii()]
    assert len(docs) >= 50, "expected ≥50 ASCII paragraphs"
    return {f"a{i}": {"text": t} for i, t in enumerate(docs)}


@pytest.fixture(scope="module")
def real_queries(real_paragraphs):
    """Real phrases: mid-document word windows + unicode queries."""
    rng = np.random.RandomState(42)
    queries = {}
    picks = rng.choice(len(real_paragraphs), size=30, replace=False)
    for n, i in enumerate(picks):
        words = real_paragraphs[int(i)].split()
        if len(words) < 6:
            continue
        start = int(rng.randint(0, max(1, len(words) - 6)))
        queries[f"q{n}"] = " ".join(words[start : start + 6])
    # Unicode queries exercise the Python query-encode fallback (the C++
    # NativeVocab path handles only ASCII batches).
    queries["qu0"] = "naïve café résumé"
    queries["qu1"] = "Müller Straße performance"
    queries["qu2"] = "検索エンジン performance"
    return queries


def load_reference_module():
    spec = importlib.util.spec_from_file_location(
        "reference_pipeline_for_real_text", REFERENCE_PIPELINE
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def reference_mod():
    return load_reference_module()


def build_reference_retriever(reference_mod, corpus, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # the reference writes .rag_cache into CWD
    hardware = {"avx2": False, "cores": 1, "threads": 1, "memory_gb": 8}
    r = reference_mod.OptimizedRetriever(
        {"type": "bm25", "params": {"k1": 1.2, "b": 0.75}}, hardware
    )
    r.use_cache = False
    r.query_cache = None
    r.build_index_from_corpus(corpus)
    return r


# ---------------------------------------------------------------------------
# Tokenizer fidelity on real text
# ---------------------------------------------------------------------------


def test_tokenizer_matches_reference_regex_on_real_prose(real_paragraphs):
    """Every real paragraph tokenizes identically to the reference regex
    (the native C++ tokenizer handles the ASCII ones; asserting equality
    on ALL of them covers both routes)."""
    n_ascii = 0
    for text in real_paragraphs:
        assert tokenize(text) == _reference_tokens(text), text[:80]
        n_ascii += text.isascii()
    assert n_ascii >= 50  # the C++ path was actually exercised


def test_tokenizer_matches_reference_regex_on_unicode():
    """Non-ASCII text routes to the Python fallback and still matches the
    unicode-aware reference regex exactly (including unicode lowercasing
    like İ→i̇ and Σ→σ)."""
    for text in UNICODE_DOCS:
        assert not text.isascii()
        assert tokenize(text) == _reference_tokens(text), text[:40]


def test_native_tokenizer_disagreement_would_be_caught():
    """Sanity: the assertion above is not vacuous — a text where naive
    byte-wise handling WOULD differ from the regex (ASCII fast path must
    only ever see ASCII)."""
    text = "Μixed-SCRIPT Τext"  # Greek caps that lowercase to different cps
    assert not text.isascii()
    assert tokenize(text) == _reference_tokens(text)


# ---------------------------------------------------------------------------
# Build-path equivalence: C++ tf_build vs Python Counter on real ASCII prose
# ---------------------------------------------------------------------------


def test_native_and_python_corpus_counting_agree(ascii_corpus):
    """The C++ corpus counter and the Python Counter path produce the same
    term matrix on real ASCII prose (markdown links, numbers, ALL-CAPS,
    underscores, code spans)."""
    texts = [d["text"] for d in ascii_corpus.values()]
    native = SparseIndexBuilder._count_corpus_native(texts)
    if native is None:
        pytest.skip("native library not built")
    python = SparseIndexBuilder._count_corpus_python(texts)
    nv, ndf, ndl, niptr, ntids, ntfs = native
    pv, pdf, pdl, piptr, ptids, ptfs = python
    assert nv == pv
    np.testing.assert_array_equal(ndf, pdf)
    np.testing.assert_array_equal(ndl, pdl)
    np.testing.assert_array_equal(niptr, piptr)
    # Rows keep first-seen term order in both paths.
    np.testing.assert_array_equal(ntids, ptids)
    np.testing.assert_array_equal(ntfs, ptfs)


# ---------------------------------------------------------------------------
# End-to-end ranking parity vs the reference engine on real text
# ---------------------------------------------------------------------------


def _assert_ranking_parity(ref_results, got_results, queries, tol=5e-3):
    n_nonempty = 0
    for qid in queries:
        ref_r = ref_results[qid]
        got_r = got_results[qid]
        # Membership identical except within-tolerance boundary ties.
        diff = set(got_r) ^ set(ref_r)
        if diff:
            kth = min(ref_r.values()) if ref_r else 0.0
            for doc_id in diff:
                s = ref_r.get(doc_id, got_r.get(doc_id))
                assert abs(s - kth) < tol, (qid, doc_id, s, kth)
        if ref_r:
            n_nonempty += 1
        for doc_id, s in ref_r.items():
            if doc_id in got_r:
                assert got_r[doc_id] == pytest.approx(
                    s, abs=1e-3, rel=1e-3
                ), (qid, doc_id)
    assert n_nonempty > len(queries) // 2


def test_mixed_corpus_ranking_matches_reference(
    reference_mod, mixed_corpus, real_queries, tmp_path, monkeypatch
):
    """Full path on the MIXED corpus (Python fallback build): rankings and
    scores match the reference engine on real prose + unicode docs."""
    ref = build_reference_retriever(
        reference_mod, mixed_corpus, tmp_path, monkeypatch
    )
    index = SparseIndexBuilder(method="bm25", head_dtype="f32").build(
        mixed_corpus
    )
    engine = SparseSearchEngine(index, cache_queries=False)
    k = 10
    _assert_ranking_parity(
        ref.search(real_queries, top_k=k),
        engine.search(real_queries, top_k=k),
        real_queries,
    )


def test_ascii_corpus_ranking_matches_reference(
    reference_mod, ascii_corpus, real_queries, tmp_path, monkeypatch
):
    """Full path on the ASCII corpus (C++ tf_build + NativeVocab query
    encode when built): rankings and scores match the reference engine."""
    ref = build_reference_retriever(
        reference_mod, ascii_corpus, tmp_path, monkeypatch
    )
    index = SparseIndexBuilder(method="bm25", head_dtype="f32").build(
        ascii_corpus
    )
    engine = SparseSearchEngine(index, cache_queries=False)
    ascii_queries = {
        q: t for q, t in real_queries.items() if t.isascii()
    }
    assert len(ascii_queries) >= 20
    k = 10
    _assert_ranking_parity(
        ref.search(ascii_queries, top_k=k),
        engine.search(ascii_queries, top_k=k),
        ascii_queries,
    )


def test_unicode_queries_hit_unicode_docs(mixed_corpus):
    """Unicode queries retrieve the unicode documents they quote —
    end-to-end evidence that non-ASCII terms survive tokenize→index→
    search (int8 production head)."""
    index = SparseIndexBuilder(method="bm25").build(mixed_corpus)
    engine = SparseSearchEngine(index, cache_queries=False)
    # NB: \b\w+\b treats an unbroken CJK run as ONE token (no internal
    # word boundaries), so the query must quote the full run — faithful
    # to the reference regex's behavior.
    out = engine.search(
        {"q0": "naïve café résumé", "q1": "株式会社の検索エンジン"}, top_k=5
    )
    assert "u0" in out["q0"], out["q0"]
    assert "u1" in out["q1"], out["q1"]
