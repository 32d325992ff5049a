"""Sparse index construction.

Semantics match the reference index build (reference
rag_system/core/retrieval.py:129-201 and
rag_system/pipeline/evaluate_rag_pipeline.py:210-278):

- tokenize with ``\\b\\w+\\b`` on lowercased text
- vocabulary = sorted set of all corpus tokens
- document length = total token count (with multiplicity)
- BM25 IDF: ``log((N - df + 0.5) / (df + 0.5))`` (Robertson; may be negative)
- TF-IDF IDF: ``log(N / (df + 1))``

The TPU-first difference: instead of storing raw term frequencies and
re-evaluating the BM25 saturation per query (the reference's Numba kernel
recomputes ``tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))`` for every query), the
full per-(doc, term) score weight — IDF included — is precomputed once at
build time. Query scoring then reduces to

    score(q, d) = sum_t weights[d, t] * query_tf[q, t]

for both BM25 and TF-IDF, i.e. a single sparse-times-dense contraction that
the device kernels implement (see osr_tpu/ops/bm25.py). This is exact, not an
approximation: the saturation depends only on build-time quantities.
"""

from __future__ import annotations

import dataclasses
import hashlib
import time
import logging
from collections import Counter
from pathlib import Path
from typing import Dict, List, Mapping, Optional, Sequence, Tuple, Union

import numpy as np

from osr_tpu.index.tokenizer import Tokenizer, tokenize
from osr_tpu.index.layout import (
    DEFAULT_WIDTHS,
    BucketedEllIndex,
    pack_ell,
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
    tf: np.ndarray, doc_len: float, k1: float, b: float, avgdl: float
) -> np.ndarray:
    """The BM25 term-frequency saturation factor for one document."""
    norm = k1 * (1.0 - b + b * doc_len / avgdl)
    return tf * (k1 + 1.0) / (tf + norm)


@dataclasses.dataclass
class SparseIndex:
    """A built sparse index: host metadata + the device-ready ELL layout."""

    method: str  # 'bm25' or 'tfidf'
    vocabulary: Dict[str, int]
    doc_ids: List[str]
    ell: BucketedEllIndex
    idf: np.ndarray  # (V,) float32
    doc_lengths: np.ndarray  # (N,) float32 (total token counts)
    avgdl: float
    k1: float
    b: float
    # Raw per-doc sparse rows kept for oracle tests / re-weighting; optional.
    doc_term_ids: Optional[List[np.ndarray]] = None
    doc_tfs: Optional[List[np.ndarray]] = None

    @property
    def num_docs(self) -> int:
        return len(self.doc_ids)

    @property
    def vocab_size(self) -> int:
        return len(self.vocabulary)

    def tokenizer(self) -> Tokenizer:
        return Tokenizer(self.vocabulary)

    def stats(self) -> Dict[str, object]:
        s = self.ell.stats()
        s.update(
            {
                "method": self.method,
                "avgdl": self.avgdl,
                "k1": self.k1,
                "b": self.b,
            }
        )
        return s


class SparseIndexBuilder:
    """Builds a :class:`SparseIndex` from a corpus mapping doc_id -> doc."""

    def __init__(
        self,
        method: str = "bm25",
        k1: float = 1.2,
        b: float = 0.75,
        widths: Sequence[int] = DEFAULT_WIDTHS,
        min_bucket_docs: int = 1024,
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
        self.widths = tuple(widths)
        self.min_bucket_docs = min_bucket_docs
        self.keep_raw_rows = keep_raw_rows

    def build(self, corpus: Mapping[str, Union[str, Mapping]]) -> SparseIndex:
        if not corpus:
            raise ValueError("Empty corpus provided")
        t0 = time.perf_counter()
        doc_ids = list(corpus.keys())

        # Tokenize + vocabulary (sorted set, like reference retrieval.py:155).
        token_lists: List[List[str]] = []
        vocab_set: set = set()
        for doc_id in doc_ids:
            toks = tokenize(extract_text(corpus[doc_id]))
            token_lists.append(toks)
            vocab_set.update(toks)
        vocabulary = {term: i for i, term in enumerate(sorted(vocab_set))}
        vocab_size = len(vocabulary)

        # Per-doc sparse rows (sorted unique term ids + counts) and lengths.
        doc_lengths = np.zeros(len(doc_ids), dtype=np.float32)
        doc_term_ids: List[np.ndarray] = []
        doc_tfs: List[np.ndarray] = []
        df = np.zeros(vocab_size, dtype=np.int64)
        for i, toks in enumerate(token_lists):
            doc_lengths[i] = len(toks)
            if toks:
                counts = Counter(toks)
                tids = np.fromiter(
                    (vocabulary[t] for t in counts), dtype=np.int32, count=len(counts)
                )
                tfs = np.fromiter(counts.values(), dtype=np.float32, count=len(counts))
                order = np.argsort(tids)
                tids, tfs = tids[order], tfs[order]
                df[tids] += 1
            else:
                tids = np.empty(0, dtype=np.int32)
                tfs = np.empty(0, dtype=np.float32)
            doc_term_ids.append(tids)
            doc_tfs.append(tfs)

        num_docs = len(doc_ids)
        avgdl = float(doc_lengths.mean()) if num_docs else 0.0

        if self.method == "bm25":
            idf = bm25_idf(df, num_docs)
        else:
            idf = tfidf_idf(df, num_docs)

        # Precompute per-(doc, term) score weights.
        doc_weights: List[np.ndarray] = []
        for i in range(num_docs):
            tids, tfs = doc_term_ids[i], doc_tfs[i]
            if tids.size == 0:
                doc_weights.append(tfs)
                continue
            if self.method == "bm25":
                sat = bm25_saturation(
                    tfs, float(doc_lengths[i]), self.k1, self.b, avgdl
                )
                doc_weights.append((idf[tids] * sat).astype(np.float32))
            else:
                doc_weights.append((idf[tids] * tfs).astype(np.float32))

        ell = pack_ell(
            doc_term_ids,
            doc_weights,
            vocab_size,
            widths=self.widths,
            min_bucket_docs=self.min_bucket_docs,
        )

        index = SparseIndex(
            method=self.method,
            vocabulary=vocabulary,
            doc_ids=doc_ids,
            ell=ell,
            idf=idf,
            doc_lengths=doc_lengths,
            avgdl=avgdl,
            k1=self.k1,
            b=self.b,
            doc_term_ids=doc_term_ids if self.keep_raw_rows else None,
            doc_tfs=doc_tfs if self.keep_raw_rows else None,
        )
        logger.info(
            "Built %s index: %d docs, %d terms, %d buckets, %.1f MB in %.2fs",
            self.method,
            num_docs,
            vocab_size,
            len(ell.buckets),
            ell.nbytes / 2**20,
            time.perf_counter() - t0,
        )
        return index


def corpus_fingerprint(corpus: Mapping[str, object]) -> str:
    """Cache key for a corpus, mirroring the reference's md5-of-first-1000-ids
    probe (reference evaluate_rag_pipeline.py:189) but hashing *all* ids plus
    the corpus size so different corpora can't alias."""
    h = hashlib.md5()
    h.update(str(len(corpus)).encode())
    for doc_id in sorted(corpus.keys())[:1000]:
        h.update(str(doc_id).encode())
    return h.hexdigest()[:16]
