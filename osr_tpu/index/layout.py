"""Hybrid dense-head / sparse-tail index layout for TPU.

The reference stores the corpus term-frequency matrix as SciPy CSR and walks
variable-length rows in a Numba loop (reference rag_system/core/retrieval.py:
41-76). Neither variable-length rows nor random gathers are where a TPU is
fast; matmuls are. This layout exploits the Zipf shape of term frequencies:

1. The vocabulary is numbered by **descending document frequency** at build
   time, so the most common terms occupy ids ``[0, F)``.
2. The **head** — each document's weights over the top-F terms — is stored
   as a dense ``(R, F)`` matrix. Head scoring for a query batch is ONE MXU
   matmul against the first F rows of the dense query matrix (a contiguous
   slice, no gather). The head absorbs most of each document's token mass
   (~70-95% for Zipf/natural text), and its per-query HBM cost is tiny
   because the weight reads amortize over the whole batch.
3. The **tail** — the per-document rare terms (id >= F) — is short, so it
   packs into narrow padded (ELL) rows scored by a bandwidth-bound
   gather-multiply-reduce on the VPU. Documents are bucketed by tail width
   so nobody pays the longest tail.

Rows are ordered bucket-by-bucket; a ``doc_map`` row->global-doc-id array
and ``valid`` mask recover identities after top-k. Padding slots carry
weight 0, which is exact: every scoring term is ``weight * query_weight``.

Scoring weights (BM25 saturation x IDF, or TF x IDF) are precomputed at
build time — see builder.py — so this layout serves BM25 and TF-IDF with
the same kernels.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# Candidate tail slot widths. Fine-grained steps at the common small widths
# keep ELL padding low (padding slots cost gather bandwidth); power-of-two
# steps beyond.
DEFAULT_WIDTHS: Tuple[int, ...] = (
    8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
    320, 384, 448, 512, 768, 1024, 1536, 2048, 3072, 4096, 6144, 8192,
)

# Pad each bucket's row count to a multiple of this (TPU sublane friendly).
DOC_ALIGN = 8

# Default HBM budget for the dense head (bytes of float32 weights).
DEFAULT_HEAD_BUDGET_BYTES = 2 * 1024**3

HEAD_ALIGN = 128  # lane-align the head dimension


@dataclasses.dataclass
class TailBucket:
    """One fixed-width slice of the sparse tail. ``width == 0`` marks the
    pure-head bucket (documents whose every term is in the head)."""

    width: int
    row_offset: int  # first row of this bucket in the global row order
    num_rows: int
    term_ids: Optional[np.ndarray]  # (num_rows, width) int32, None if width==0
    weights: Optional[np.ndarray]  # (num_rows, width) float32, None if width==0

    @property
    def nbytes(self) -> int:
        n = 0
        if self.term_ids is not None:
            n += self.term_ids.nbytes + self.weights.nbytes
        return n


@dataclasses.dataclass
class HybridLayout:
    """Device-ready index: dense head + bucketed sparse tail."""

    head_terms: int  # F
    head_weights: np.ndarray  # (R, F) float32, rows in bucket order
    buckets: List[TailBucket]
    doc_map: np.ndarray  # (R,) int32 row -> global doc index
    valid: np.ndarray  # (R,) bool
    num_docs: int
    vocab_size: int

    @property
    def num_rows(self) -> int:
        return self.head_weights.shape[0]

    @property
    def nbytes(self) -> int:
        return (
            self.head_weights.nbytes
            + sum(b.nbytes for b in self.buckets)
            + self.doc_map.nbytes
        )

    def stats(self) -> Dict[str, object]:
        tail_slots = sum(b.num_rows * b.width for b in self.buckets)
        return {
            "num_docs": self.num_docs,
            "num_rows": self.num_rows,
            "vocab_size": self.vocab_size,
            "head_terms": self.head_terms,
            "head_mb": self.head_weights.nbytes / 2**20,
            "num_tail_buckets": len(self.buckets),
            "tail_widths": [b.width for b in self.buckets],
            "tail_rows": [b.num_rows for b in self.buckets],
            "tail_slots": tail_slots,
            "memory_mb": self.nbytes / 2**20,
        }


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def choose_head_terms(
    num_docs: int,
    vocab_size: int,
    head_terms: Optional[int] = None,
    head_budget_bytes: int = DEFAULT_HEAD_BUDGET_BYTES,
) -> int:
    """Pick F. Explicit ``head_terms`` wins; otherwise the largest
    lane-aligned F that fits the budget, capped at 4096 (diminishing Zipf
    coverage beyond) and at the vocabulary size."""
    if head_terms is not None:
        return max(min(head_terms, vocab_size), 0)
    rows = max(_round_up(num_docs, DOC_ALIGN), 1)
    by_budget = head_budget_bytes // (rows * 4)
    f = int(min(4096, by_budget, vocab_size))
    if f < vocab_size:  # lane-align the head slice when it isn't the whole V
        f = (f // HEAD_ALIGN) * HEAD_ALIGN
    return max(f, 0)


def _choose_widths(
    lengths: np.ndarray, widths: Sequence[int], min_bucket_docs: int
) -> List[int]:
    """Pick the tail widths actually used; undersized buckets merge upward."""
    max_len = int(lengths.max(initial=0))
    if max_len == 0:
        return []
    usable = [w for w in widths if w < max_len] + [
        next((w for w in widths if w >= max_len), _round_up(max_len, 8))
    ]
    counts = {}
    prev = 0
    for w in usable:
        counts[w] = int(((lengths > prev) & (lengths <= w)).sum())
        prev = w
    chosen: List[int] = []
    carried = 0
    for w in usable:
        carried += counts[w]
        if carried >= min_bucket_docs or w == usable[-1]:
            if carried > 0:
                chosen.append(w)
            carried = 0
    return chosen


def pack_hybrid(
    doc_term_ids: Sequence[np.ndarray],
    doc_weights: Sequence[np.ndarray],
    vocab_size: int,
    head_terms: int,
    widths: Sequence[int] = DEFAULT_WIDTHS,
    min_bucket_docs: Optional[int] = None,
) -> HybridLayout:
    """Pack per-document sparse rows (term ids in frequency order) into the
    hybrid layout. ``doc_term_ids[i]`` must be sorted ascending."""
    num_docs = len(doc_term_ids)
    f = head_terms
    if min_bucket_docs is None:
        # Each tail bucket adds a scan to the fused search program (compile
        # time) and a dispatch-side loop; keep the bucket count bounded as
        # the corpus grows while still splitting small corpora finely.
        min_bucket_docs = max(1024, num_docs // 12)

    # Split head/tail per doc (ids sorted, so searchsorted splits cleanly).
    splits = [int(np.searchsorted(t, f)) for t in doc_term_ids]
    tail_lengths = np.asarray(
        [len(t) - s for t, s in zip(doc_term_ids, splits)], dtype=np.int64
    )

    chosen = _choose_widths(tail_lengths, widths, min_bucket_docs)

    buckets: List[TailBucket] = []
    order: List[np.ndarray] = []
    row_offset = 0
    assigned = np.zeros(num_docs, dtype=bool)

    # Pure-head bucket first (tail length 0).
    zero_idx = np.nonzero(tail_lengths == 0)[0]
    if zero_idx.size:
        assigned[zero_idx] = True
        rows = _round_up(zero_idx.size, DOC_ALIGN)
        buckets.append(
            TailBucket(
                width=0,
                row_offset=row_offset,
                num_rows=rows,
                term_ids=None,
                weights=None,
            )
        )
        order.append(zero_idx)
        order.append(np.full(rows - zero_idx.size, -1, dtype=np.int64))
        row_offset += rows

    for w in chosen:
        sel = (~assigned) & (tail_lengths <= w)
        idx = np.nonzero(sel)[0]
        assigned[idx] = True
        if idx.size == 0:
            continue
        rows = _round_up(idx.size, DOC_ALIGN)
        term_ids = np.zeros((rows, w), dtype=np.int32)
        weights = np.zeros((rows, w), dtype=np.float32)
        # Vectorized ragged fill: one fancy-indexed assignment per bucket.
        lens = tail_lengths[idx]
        if lens.sum():
            flat_ids = np.concatenate(
                [doc_term_ids[d][splits[d] :] for d in idx]
            )
            flat_w = np.concatenate(
                [doc_weights[d][splits[d] :] for d in idx]
            )
            row_rep = np.repeat(np.arange(idx.size), lens)
            starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
            cols = np.arange(int(lens.sum())) - np.repeat(starts, lens)
            term_ids[row_rep, cols] = flat_ids
            weights[row_rep, cols] = flat_w
        buckets.append(
            TailBucket(
                width=w,
                row_offset=row_offset,
                num_rows=rows,
                term_ids=term_ids,
                weights=weights,
            )
        )
        order.append(idx)
        order.append(np.full(rows - idx.size, -1, dtype=np.int64))
        row_offset += rows

    if num_docs and not assigned.all():  # pragma: no cover
        raise AssertionError("unassigned docs in pack_hybrid")

    row_docs = (
        np.concatenate(order) if order else np.empty(0, dtype=np.int64)
    )
    total_rows = row_docs.shape[0]
    valid = row_docs >= 0
    doc_map = np.where(valid, row_docs, 0).astype(np.int32)

    # Dense head, rows in bucket order (one fancy-indexed assignment).
    head = np.zeros((total_rows, f), dtype=np.float32)
    if f and num_docs:
        real_rows = np.nonzero(valid)[0]
        head_lens = np.asarray([splits[d] for d in row_docs[real_rows]])
        if head_lens.sum():
            flat_cols = np.concatenate(
                [doc_term_ids[d][: splits[d]] for d in row_docs[real_rows]]
            )
            flat_w = np.concatenate(
                [doc_weights[d][: splits[d]] for d in row_docs[real_rows]]
            )
            row_rep = np.repeat(real_rows, head_lens)
            head[row_rep, flat_cols] = flat_w

    return HybridLayout(
        head_terms=f,
        head_weights=head,
        buckets=buckets,
        doc_map=doc_map,
        valid=valid,
        num_docs=num_docs,
        vocab_size=vocab_size,
    )
