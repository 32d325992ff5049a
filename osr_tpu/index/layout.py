"""Bucketed padded-sparse (ELL) index layout for TPU.

The reference stores the corpus term-frequency matrix as SciPy CSR and walks
variable-length rows in a Numba loop (reference rag_system/core/retrieval.py:
41-76). Variable row lengths don't map to TPU vector units, so here each
document row is padded to a fixed slot width. To avoid paying the longest
document's width for every document (corpus doc lengths are long-tailed),
documents are partitioned into *width buckets*: each bucket holds the docs
whose unique-term count fits its width, stored as dense

    term_ids : (num_docs_b, width) int32   — column (term) ids, 0-padded
    weights  : (num_docs_b, width) float32 — precomputed per-(doc,term) score
                                             weights, 0-padded

Padding with weight 0 is exact: the scoring kernel computes
``sum_k weights[d,k] * query_weight[term_ids[d,k]]`` so padded slots
contribute nothing regardless of the term id they carry.

Scoring weights are precomputed at build time (see builder.py): the BM25
term-frequency saturation depends only on (tf, doc_len), so the whole
BM25/TF-IDF distinction collapses into the stored weights and query scoring
becomes one bandwidth-bound multiply-gather-reduce per bucket.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import numpy as np

# Candidate slot widths. Multiples of 8 keep the trailing dims friendly to
# TPU sublane tiling once transposed/blocked by the kernels.
DEFAULT_WIDTHS: Tuple[int, ...] = (8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192)

# Pad each bucket's document count to a multiple of this so per-bucket score
# blocks tile cleanly.
DOC_ALIGN = 8


@dataclasses.dataclass
class EllBucket:
    """One fixed-width slice of the bucketed ELL index."""

    width: int
    term_ids: np.ndarray  # (D, width) int32
    weights: np.ndarray  # (D, width) float32
    doc_perm: np.ndarray  # (D,) int32 — bucket-local row -> global doc index
    valid: np.ndarray  # (D,) bool  — False for alignment-padding rows

    @property
    def num_rows(self) -> int:
        return self.term_ids.shape[0]

    @property
    def num_docs(self) -> int:
        return int(self.valid.sum())

    @property
    def nbytes(self) -> int:
        return self.term_ids.nbytes + self.weights.nbytes + self.doc_perm.nbytes


@dataclasses.dataclass
class BucketedEllIndex:
    """The full device-layout sparse index: a list of ELL buckets."""

    buckets: List[EllBucket]
    num_docs: int
    vocab_size: int

    @property
    def nbytes(self) -> int:
        return sum(b.nbytes for b in self.buckets)

    @property
    def nnz(self) -> int:
        return sum(int((b.weights != 0).sum()) for b in self.buckets)

    def stats(self) -> Dict[str, object]:
        return {
            "num_docs": self.num_docs,
            "vocab_size": self.vocab_size,
            "num_buckets": len(self.buckets),
            "bucket_widths": [b.width for b in self.buckets],
            "bucket_rows": [b.num_rows for b in self.buckets],
            "memory_mb": self.nbytes / (1024 * 1024),
            "padding_overhead": (
                sum(b.num_rows * b.width for b in self.buckets)
                / max(1, sum(int(b.num_docs) for b in self.buckets))
            ),
        }


def _choose_widths(
    row_lengths: np.ndarray, widths: Sequence[int], min_bucket_docs: int
) -> List[int]:
    """Pick the set of widths actually used, merging undersized buckets up.

    A bucket with very few documents wastes a kernel dispatch; rows from such
    buckets are promoted into the next larger width.
    """
    max_len = int(row_lengths.max(initial=0))
    usable = [w for w in widths if w < max_len] + [
        next((w for w in widths if w >= max_len), _round_up(max_len, 8))
    ]
    # Count docs per tentative bucket.
    counts = {}
    for w in usable:
        prev = max((u for u in usable if u < w), default=0)
        counts[w] = int(((row_lengths > prev) & (row_lengths <= w)).sum())
    # Merge small buckets upward (the largest bucket always survives).
    chosen: List[int] = []
    carried = 0
    for w in usable:
        carried += counts[w]
        if carried >= min_bucket_docs or w == usable[-1]:
            if carried > 0:
                chosen.append(w)
            carried = 0
    return chosen


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pack_ell(
    doc_term_ids: Sequence[np.ndarray],
    doc_weights: Sequence[np.ndarray],
    vocab_size: int,
    widths: Sequence[int] = DEFAULT_WIDTHS,
    min_bucket_docs: int = 1024,
) -> BucketedEllIndex:
    """Pack per-document sparse rows into width buckets.

    Args:
      doc_term_ids: list of int arrays, the unique term ids of each document.
      doc_weights: list of float arrays, the precomputed score weight of each
        (doc, term) pair (same lengths as ``doc_term_ids``).
      vocab_size: |V|; stored for bounds checks and query-vector sizing.
      widths: candidate slot widths.
      min_bucket_docs: buckets with fewer docs are merged into the next width.
    """
    num_docs = len(doc_term_ids)
    row_lengths = np.asarray([len(t) for t in doc_term_ids], dtype=np.int64)
    if num_docs == 0:
        return BucketedEllIndex(buckets=[], num_docs=0, vocab_size=vocab_size)

    chosen = _choose_widths(row_lengths, widths, min_bucket_docs)

    buckets: List[EllBucket] = []
    prev_w = 0
    assigned = np.zeros(num_docs, dtype=bool)
    for w in chosen:
        sel = (~assigned) & (row_lengths <= w)
        idx = np.nonzero(sel)[0]
        assigned[idx] = True
        if idx.size == 0:
            prev_w = w
            continue
        rows = _round_up(idx.size, DOC_ALIGN)
        term_ids = np.zeros((rows, w), dtype=np.int32)
        weights = np.zeros((rows, w), dtype=np.float32)
        doc_perm = np.zeros(rows, dtype=np.int32)
        valid = np.zeros(rows, dtype=bool)
        for r, d in enumerate(idx):
            n = row_lengths[d]
            if n:
                term_ids[r, :n] = doc_term_ids[d]
                weights[r, :n] = doc_weights[d]
            doc_perm[r] = d
            valid[r] = True
        buckets.append(
            EllBucket(
                width=w,
                term_ids=term_ids,
                weights=weights,
                doc_perm=doc_perm,
                valid=valid,
            )
        )
        prev_w = w

    leftover = np.nonzero(~assigned)[0]
    if leftover.size:  # pragma: no cover - _choose_widths covers max length
        raise AssertionError(f"{leftover.size} docs exceeded all widths")

    return BucketedEllIndex(
        buckets=buckets, num_docs=num_docs, vocab_size=vocab_size
    )
