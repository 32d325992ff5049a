"""Sparse index construction.

Semantics match the reference index build (reference
rag_system/core/retrieval.py:129-201 and
rag_system/pipeline/evaluate_rag_pipeline.py:210-278):

- tokenize with ``\\b\\w+\\b`` on lowercased text
- document length = total token count (with multiplicity)
- BM25 IDF: ``log((N - df + 0.5) / (df + 0.5))`` (Robertson; may be negative)
- TF-IDF IDF: ``log(N / (df + 1))``

Three deliberate TPU-first departures from the reference's representation
(scores are unchanged — parity is enforced against an exact-formula oracle):

1. **Precomputed weights.** The BM25 saturation and IDF depend only on
   build-time quantities, so the full per-(doc, term) score weight is
   computed once here (vectorized over the flat nnz arrays); query scoring
   is then a single sparse-times-dense contraction for both BM25 and TF-IDF
   (the reference recomputes the saturation inside the Numba kernel for
   every query).
2. **Frequency-ordered vocabulary.** Term ids are assigned by descending
   document frequency (ties broken alphabetically) instead of
   alphabetically, so the layout's dense head is a contiguous id range —
   see index/layout.py. The reference's alphabetical order
   (retrieval.py:155) carries no semantics; scores are id-order invariant.
3. **Flat nnz arrays.** The term matrix lives as (indptr, term_ids, tfs)
   flat arrays end to end — weights, head fill and postings build are all
   single vectorized passes, never per-document Python loops.
"""

from __future__ import annotations

import dataclasses
import hashlib
import time
import logging
from collections import Counter
from typing import Dict, List, Mapping, Optional, Union

import numpy as np

from osr_tpu.index.tokenizer import Tokenizer, tokenize
from osr_tpu.index.layout import (
    DEFAULT_HEAD_BUDGET_BYTES,
    DEFAULT_HEAD_CAP,
    HybridLayout,
    choose_head_terms,
    pack_flat,
)

logger = logging.getLogger(__name__)

TEXT_FIELDS = ("text", "content", "body", "passage", "document")


def extract_text(doc: Union[str, Mapping]) -> str:
    """Pull the text field out of a corpus entry.

    Field-priority matches the reference's flexible corpus handling
    (reference evaluate_rag_pipeline.py:221,595-603).
    """
    if isinstance(doc, str):
        return doc
    for field in TEXT_FIELDS:
        value = doc.get(field)
        if value:
            return value
    return ""


def bm25_idf(df: np.ndarray, num_docs: int) -> np.ndarray:
    """Robertson IDF, identical to reference retrieval.py:189."""
    return np.log((num_docs - df + 0.5) / (df + 0.5)).astype(np.float32)


def tfidf_idf(df: np.ndarray, num_docs: int) -> np.ndarray:
    """TF-IDF IDF, identical to reference evaluate_rag_pipeline.py:278."""
    return np.log(num_docs / (df + 1.0)).astype(np.float32)


def bm25_saturation(
    tf: np.ndarray, doc_len, k1: float, b: float, avgdl: float
) -> np.ndarray:
    """The BM25 term-frequency saturation factor (vectorized)."""
    norm = k1 * (1.0 - b + b * doc_len / avgdl)
    return tf * (k1 + 1.0) / (tf + norm)


@dataclasses.dataclass
class SparseIndex:
    """A built sparse index: host metadata + the device-ready layout."""

    method: str  # 'bm25' or 'tfidf'
    vocabulary: Dict[str, int]  # term -> id (descending-df order)
    doc_ids: List[str]
    layout: HybridLayout
    idf: np.ndarray  # (V,) float32, indexed by id
    doc_lengths: np.ndarray  # (N,) float32 (total token counts)
    avgdl: float
    k1: float
    b: float
    # Raw flat term matrix kept for cache serialization / re-weighting.
    raw_indptr: Optional[np.ndarray] = None  # (N+1,) int64
    raw_term_ids: Optional[np.ndarray] = None  # (nnz,) int32
    raw_tfs: Optional[np.ndarray] = None  # (nnz,) float32

    @property
    def num_docs(self) -> int:
        return len(self.doc_ids)

    @property
    def vocab_size(self) -> int:
        return len(self.vocabulary)

    def tokenizer(self) -> Tokenizer:
        return Tokenizer(self.vocabulary)

    def stats(self) -> Dict[str, object]:
        s = self.layout.stats()
        s.update(
            {
                "method": self.method,
                "avgdl": self.avgdl,
                "k1": self.k1,
                "b": self.b,
            }
        )
        return s


def compute_weights_flat(
    term_ids: np.ndarray,  # (nnz,) int32
    tfs: np.ndarray,  # (nnz,) float32
    indptr: np.ndarray,  # (N+1,) int64
    doc_lengths: np.ndarray,  # (N,) float32
    idf: np.ndarray,  # (V,) float32
    method: str,
    k1: float,
    b: float,
    avgdl: float,
) -> np.ndarray:
    """Precompute the per-(doc, term) score weights in one vectorized pass."""
    if term_ids.size == 0:
        return np.zeros(0, dtype=np.float32)
    if method == "bm25":
        dl = np.repeat(doc_lengths, np.diff(indptr))
        sat = bm25_saturation(tfs, dl, k1, b, avgdl)
        return (idf[term_ids] * sat).astype(np.float32)
    return (idf[term_ids] * tfs).astype(np.float32)


class SparseIndexBuilder:
    """Builds a :class:`SparseIndex` from a corpus mapping doc_id -> doc."""

    def __init__(
        self,
        method: str = "bm25",
        k1: float = 1.2,
        b: float = 0.75,
        head_terms: Optional[int] = None,
        head_budget_bytes: int = DEFAULT_HEAD_BUDGET_BYTES,
        head_cap: int = DEFAULT_HEAD_CAP,
        head_dtype: str = "int8",  # 'int8' (default) | 'int4' | 'bf16' | 'f32'
        keep_raw_rows: bool = False,
    ):
        method = method.lower()
        if method in ("bm25", "bm25_custom", "bm25_retriever"):
            method = "bm25"
        elif method in ("tfidf", "tf-idf", "dpr", "contriever", "splade"):
            # The reference pipeline scores its 'dpr'/'contriever'/'splade'
            # experiments with the TF-IDF kernel over the same term matrix
            # (reference evaluate_rag_pipeline.py:392-399).
            method = "tfidf"
        else:
            raise ValueError(f"Unknown sparse method: {method}")
        self.method = method
        self.k1 = float(k1)
        self.b = float(b)
        self.head_terms = head_terms
        self.head_budget_bytes = head_budget_bytes
        self.head_cap = head_cap
        self.head_dtype = head_dtype
        self.keep_raw_rows = keep_raw_rows

    @staticmethod
    def _count_corpus_native(texts: List[str]):
        """Tokenize + TF-count through the C++ fast path (native/).

        Returns None (caller falls back to Python) when the library isn't
        built or the corpus contains non-ASCII text — the C tokenizer is
        only token-identical to the reference regex on ASCII.
        """
        try:
            from osr_tpu.native import build_corpus_tf
        except ImportError:
            return None
        encoded: List[bytes] = []
        for t in texts:
            if not t.isascii():
                return None
            encoded.append(t.encode("ascii"))
        buf = b"".join(encoded)
        offsets = np.zeros(len(encoded) + 1, dtype=np.int64)
        np.cumsum([len(e) for e in encoded], out=offsets[1:])
        indptr, temp_ids, counts, doc_lengths, df_temp, terms = (
            build_corpus_tf(buf, offsets)
        )
        # Re-number by descending df (ties alphabetical).
        order = sorted(
            range(len(terms)), key=lambda i: (-int(df_temp[i]), terms[i])
        )
        final_of_temp = np.empty(len(terms), dtype=np.int32)
        final_of_temp[np.asarray(order, dtype=np.int64)] = np.arange(
            len(terms), dtype=np.int32
        )
        vocabulary = {terms[t]: int(f) for f, t in enumerate(order)}
        df = df_temp[np.asarray(order, dtype=np.int64)]
        # Rows keep first-seen term order (matching the Python Counter
        # path); nothing downstream needs per-row sorted ids — pack_flat
        # splits by an order-free mask and re-sorts the tail term-major.
        flat_final = final_of_temp[temp_ids]
        return vocabulary, df, doc_lengths, indptr, flat_final, counts

    @staticmethod
    def _count_corpus_python(texts: List[str]):
        """Reference-path counting: regex tokenizer + Counters."""
        doc_counts: List[Counter] = []
        df_counter: Counter = Counter()
        doc_lengths = np.zeros(len(texts), dtype=np.float32)
        for i, text in enumerate(texts):
            toks = tokenize(text)
            doc_lengths[i] = len(toks)
            counts = Counter(toks)
            doc_counts.append(counts)
            df_counter.update(counts.keys())
        terms_sorted = sorted(df_counter.items(), key=lambda kv: (-kv[1], kv[0]))
        vocabulary = {t: i for i, (t, _) in enumerate(terms_sorted)}
        df = np.fromiter(
            (c for _, c in terms_sorted), dtype=np.int64, count=len(terms_sorted)
        )
        indptr = np.zeros(len(texts) + 1, dtype=np.int64)
        np.cumsum([len(c) for c in doc_counts], out=indptr[1:])
        nnz = int(indptr[-1])
        flat_tids = np.empty(nnz, dtype=np.int32)
        flat_tfs = np.empty(nnz, dtype=np.float32)
        pos = 0
        # Rows keep first-seen term order (identical to the native path).
        for counts in doc_counts:
            n = len(counts)
            if n:
                flat_tids[pos : pos + n] = np.fromiter(
                    (vocabulary[t] for t in counts), dtype=np.int32, count=n
                )
                flat_tfs[pos : pos + n] = np.fromiter(
                    counts.values(), dtype=np.float32, count=n
                )
            pos += n
        return vocabulary, df, doc_lengths, indptr, flat_tids, flat_tfs

    def _pack_native(
        self, indptr, flat_tids, flat_tfs, doc_lengths, idf, num_docs,
        vocab_size, head_terms, avgdl,
    ) -> Optional[HybridLayout]:
        """Fused C++ weight+pack fast path (int8 and int4 heads).

        Produces arrays bit-identical to compute_weights_flat + pack_flat
        (proven by tests/test_native.py::test_pack_hybrid_parity and
        tests/test_int4.py::test_native_int4_pack_matches_numpy); returns
        None when the native library isn't available or the head dtype
        isn't quantized, and the caller falls back to the NumPy path.
        """
        if self.head_dtype not in ("int8", "int4"):
            return None
        try:
            from osr_tpu.native import (
                pack_hybrid_int4_native,
                pack_hybrid_int8_native,
            )
        except ImportError:
            return None
        from osr_tpu.index.layout import DOC_ALIGN, _round_up

        pack = (
            pack_hybrid_int8_native
            if self.head_dtype == "int8"
            else pack_hybrid_int4_native
        )
        rows = max(_round_up(num_docs, DOC_ALIGN), DOC_ALIGN)
        head, scales, post_ptr, post_rows, post_weights = pack(
            indptr, flat_tids, flat_tfs, doc_lengths, idf,
            rows, head_terms, vocab_size, self.method,
            self.k1, self.b, avgdl,
        )
        valid = np.zeros(rows, dtype=bool)
        valid[:num_docs] = True
        return HybridLayout(
            head_terms=head_terms,
            head=head,
            head_scales=scales,
            post_ptr=post_ptr,
            post_rows=post_rows,
            post_weights=post_weights,
            valid=valid,
            num_docs=num_docs,
            vocab_size=vocab_size,
            head_dtype=self.head_dtype,
        )

    def build(self, corpus: Mapping[str, Union[str, Mapping]]) -> SparseIndex:
        if not corpus:
            raise ValueError("Empty corpus provided")
        t0 = time.perf_counter()
        doc_ids = list(corpus.keys())
        texts = [extract_text(corpus[d]) for d in doc_ids]

        counted = self._count_corpus_native(texts)
        if counted is None:
            counted = self._count_corpus_python(texts)
        vocabulary, df, doc_lengths, indptr, flat_tids, flat_tfs = counted
        return self.build_from_term_matrix(
            vocabulary,
            df,
            doc_lengths,
            indptr,
            flat_tids,
            flat_tfs,
            doc_ids,
            t0=t0,
        )

    def build_from_term_matrix(
        self,
        vocabulary: Dict[str, int],
        df: np.ndarray,
        doc_lengths: np.ndarray,
        indptr: np.ndarray,
        flat_tids: np.ndarray,
        flat_tfs: np.ndarray,
        doc_ids: List[str],
        t0: Optional[float] = None,
    ) -> SparseIndex:
        """Weight + pack an already-counted term matrix (also the cache
        re-load path — see index/cache.py)."""
        if t0 is None:
            t0 = time.perf_counter()
        vocab_size = len(vocabulary)
        num_docs = len(doc_ids)
        avgdl = float(doc_lengths.mean()) if num_docs else 0.0
        idf = (
            bm25_idf(df, num_docs)
            if self.method == "bm25"
            else tfidf_idf(df, num_docs)
        )
        # IDF ascends with rank (df descends), so non-positive-IDF terms are
        # a prefix — they MUST land in the head (layout.py exactness).
        n_nonpos = int(np.searchsorted(idf, 0.0, side="right"))

        budget = self.head_budget_bytes
        if self.head_dtype == "int4":
            budget *= 2  # two head elements per byte
        f = choose_head_terms(
            num_docs,
            vocab_size,
            df,
            n_nonpos,
            self.head_terms,
            budget,
            self.head_cap,
        )
        if self.head_dtype == "int4" and self.head_terms is None:
            # The Pallas int4 kernel needs a 128-aligned PACKED width,
            # i.e. F % 256; round up when the vocabulary allows.
            from osr_tpu.index.layout import _round_up as _ru

            aligned = _ru(f, 256)
            if aligned <= vocab_size:
                f = aligned
        layout = self._pack_native(
            indptr, flat_tids, flat_tfs, doc_lengths, idf, num_docs,
            vocab_size, f, avgdl,
        )
        if layout is None:
            weights = compute_weights_flat(
                flat_tids,
                flat_tfs,
                indptr,
                doc_lengths,
                idf,
                self.method,
                self.k1,
                self.b,
                avgdl,
            )
            doc_idx = np.repeat(
                np.arange(num_docs, dtype=np.int64), np.diff(indptr)
            )
            layout = pack_flat(
                doc_idx,
                flat_tids,
                weights,
                num_docs,
                vocab_size,
                head_terms=f,
                head_dtype=self.head_dtype,
            )

        index = SparseIndex(
            method=self.method,
            vocabulary=vocabulary,
            doc_ids=doc_ids,
            layout=layout,
            idf=idf,
            doc_lengths=doc_lengths,
            avgdl=avgdl,
            k1=self.k1,
            b=self.b,
            raw_indptr=indptr if self.keep_raw_rows else None,
            raw_term_ids=flat_tids if self.keep_raw_rows else None,
            raw_tfs=flat_tfs if self.keep_raw_rows else None,
        )
        logger.info(
            "Built %s index: %d docs, %d terms, head=%d (%s), tail_nnz=%d, "
            "%.1f MB in %.2fs",
            self.method,
            num_docs,
            vocab_size,
            f,
            self.head_dtype,
            layout.tail_nnz,
            layout.nbytes / 2**20,
            time.perf_counter() - t0,
        )
        return index


def corpus_fingerprint(corpus: Mapping[str, object]) -> str:
    """Cache key for a corpus.

    Hashes the corpus size, EVERY doc id, EVERY document's text length, and
    a strided sample of text prefixes — unlike the reference's
    md5-of-first-1000-sorted-ids probe (reference
    evaluate_rag_pipeline.py:189), which aliases corpora sharing a thousand
    ids and never notices edited text. Per-doc lengths catch edits to any
    document (including past the sampled prefix) unless the edit is
    length-preserving AND outside the sampled prefixes."""
    h = hashlib.md5()
    h.update(str(len(corpus)).encode())
    ids = sorted(str(k) for k in corpus.keys())
    lengths = bytearray()
    for doc_id in ids:
        h.update(doc_id.encode())
        lengths += len(extract_text(corpus[doc_id])).to_bytes(8, "little")
    h.update(bytes(lengths))
    stride = max(1, len(ids) // 128)
    for doc_id in ids[::stride]:
        h.update(extract_text(corpus[doc_id])[:128].encode())
    return h.hexdigest()[:16]
