"""Hybrid dense-head / postings-tail index layout for TPU (v2, "flat").

The reference stores the corpus term-frequency matrix as SciPy CSR and walks
variable-length rows in a Numba loop (reference rag_system/core/retrieval.py:
41-76). A TPU is fast at matmuls and slow at irregular memory access, and the
Zipf shape of term frequencies lets the index split cleanly along that line:

1. The vocabulary is numbered by **descending document frequency** at build
   time, so the most common terms occupy ids ``[0, F)``.
2. The **head** — each document's weights over the top-F terms — is a dense
   ``(R, F)`` matrix scored for a whole query batch by ONE MXU matmul. The
   head absorbs most of each document's token mass AND every query's common
   terms. It is stored quantized (``int8`` per-**column** scales by default):
   within one column the weights share the term's IDF factor and vary only by
   the bounded BM25 saturation, so a per-column absmax scale keeps the
   relative quantization error at the ~1% level. The scale vector folds into
   the *query* side of the contraction (``(A·diag(s)) @ q == A @ (s*q)``), so
   the matmul stays int8/bf16 on the MXU.
3. The **tail** — terms with id >= F — is stored **term-major** as classic
   inverted-list postings (CSC: ``post_ptr/post_rows/post_weights``). Tail
   terms are rare by construction (df bounded by the df of rank F), so a
   query touches only the postings of its own rare terms — a few hundred
   (doc, weight) pairs instead of a scan over every document. That
   pointer-chasing residue runs on the HOST (vectorized NumPy or the C++
   runtime in native/), producing per-query candidate lists that the device
   merges with the head top-k. Exactness argument: every term with
   non-positive IDF is forced into the head (see ``choose_head_terms``), so
   tail contributions are strictly positive, and any document whose total
   score can reach the top-k either appears in the head top-k or is
   tail-touched — both candidate channels are kept (proof in
   osr_tpu/ops/bm25.py:merge docstring).

Rows are document order (padded to a multiple of 8); ``valid`` masks the
padding. Scoring weights (BM25 saturation x IDF, or TF x IDF) are
precomputed at build time — see builder.py — so this layout serves BM25 and
TF-IDF with the same kernels.

This replaces round 1's bucketed-ELL tail, whose doc-major gather cost
scaled as (total tail slots x batch) — measured 77 ms of a 109 ms batch at
FiQA scale. Term-major tail work scales with the postings actually touched
by the batch (~10^5 per 1024 queries instead of 2.5 x 10^9 gather elements).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np

# Pad the row count to a multiple of this (TPU sublane friendly).
DOC_ALIGN = 8

# Default HBM budget for the dense head, in ELEMENTS (dtype-independent:
# bytes = elements * itemsize). 2 GiB elements at int8 = 2 GiB bytes.
DEFAULT_HEAD_BUDGET_BYTES = 2 * 1024**3

HEAD_ALIGN = 128  # lane-align the head dimension

# Default cap on F: document frequencies fall off as 1/rank, so head columns
# past the few-thousand mark cost (R x 1) bytes each while absorbing almost
# no additional token mass or query traffic.
DEFAULT_HEAD_CAP = 2048

HEAD_DTYPES = ("int8", "int4", "bf16", "f32")


def unpack_int4(packed: np.ndarray, f: int) -> np.ndarray:
    """Decode the block-packed int4 head to int8 codes (the NumPy
    reference for every int4 compute path).

    Layout: ``packed`` is (R, ceil(F/2)) uint8; LOW nibble of packed
    column c holds logical column ``c``, HIGH nibble holds logical column
    ``c + ceil(F/2)`` — block packing (not interleaved) so the device
    kernel unpacks with one lane-contiguous concat instead of a lane
    shuffle. Codes are UNSIGNED [0, 15] against a per-column SIGNED
    scale: a head column's weights all share the sign of its IDF (the
    saturation factor is positive), so the sign lives in the scale and
    the nibble keeps all 15 non-zero levels — double the resolution of
    a two's-complement nibble, with no sign-extension and absent terms
    encoding as the 0 code exactly.
    """
    lo = (packed & 0xF).astype(np.int8)
    hi = (packed >> 4).astype(np.int8)
    out = np.concatenate([lo, hi], axis=1)
    return out[:, :f]


@dataclasses.dataclass
class HybridLayout:
    """Device-ready head + host-resident postings tail."""

    head_terms: int  # F
    head: np.ndarray  # (R, F) int8 / bfloat16 / float32 (see head_dtype)
    head_scales: Optional[np.ndarray]  # (F,) f32 per-column scales (int8 only)
    post_ptr: np.ndarray  # (V - F + 1,) int64 — postings offsets per tail term
    post_rows: np.ndarray  # (nnz_tail,) int32 — document rows, ascending per term
    post_weights: np.ndarray  # (nnz_tail,) float32 — precomputed score weights
    valid: np.ndarray  # (R,) bool — False on alignment-padding rows
    num_docs: int
    vocab_size: int
    head_dtype: str

    @property
    def num_rows(self) -> int:
        return self.head.shape[0]

    @property
    def tail_nnz(self) -> int:
        return int(self.post_rows.shape[0])

    @property
    def max_tail_df(self) -> int:
        if self.post_ptr.shape[0] <= 1:
            return 0
        return int(np.diff(self.post_ptr).max(initial=0))

    @property
    def nbytes(self) -> int:
        n = self.head.nbytes + self.post_ptr.nbytes
        n += self.post_rows.nbytes + self.post_weights.nbytes
        if self.head_scales is not None:
            n += self.head_scales.nbytes
        return n

    def stats(self) -> Dict[str, object]:
        return {
            "num_docs": self.num_docs,
            "num_rows": self.num_rows,
            "vocab_size": self.vocab_size,
            "head_terms": self.head_terms,
            "head_dtype": self.head_dtype,
            "head_mb": self.head.nbytes / 2**20,
            "tail_nnz": self.tail_nnz,
            "max_tail_df": self.max_tail_df,
            "postings_mb": (
                self.post_ptr.nbytes
                + self.post_rows.nbytes
                + self.post_weights.nbytes
            )
            / 2**20,
            "memory_mb": self.nbytes / 2**20,
        }


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def choose_head_terms(
    num_docs: int,
    vocab_size: int,
    df: np.ndarray,  # (V,) document frequencies in descending order
    n_nonpositive_idf: int,
    head_terms: Optional[int] = None,
    head_budget_bytes: int = DEFAULT_HEAD_BUDGET_BYTES,
    head_cap: int = DEFAULT_HEAD_CAP,
) -> int:
    """Pick F — how many highest-df terms the dense head covers.

    Constraints, in priority order:

    1. ``F >= n_nonpositive_idf``: every term whose IDF is <= 0 (extremely
       common terms under Robertson IDF, reference retrieval.py:189) must be
       scored by the head. Tail postings weights are then strictly positive,
       which the exact head-topk/candidate merge relies on.
    2. Explicit ``head_terms`` wins above that floor.
    3. Otherwise the largest lane-aligned F within the byte budget (at 1
       byte/element — the int8 default), capped at ``head_cap``.
    """
    floor = min(n_nonpositive_idf, vocab_size)
    if head_terms is not None:
        return max(min(head_terms, vocab_size), floor)
    rows = max(_round_up(num_docs, DOC_ALIGN), 1)
    by_budget = head_budget_bytes // rows
    f = int(min(head_cap, by_budget, vocab_size))
    if f < vocab_size:  # lane-align the head slice when it isn't the whole V
        f = (f // HEAD_ALIGN) * HEAD_ALIGN
    return max(f, floor, 0)


def pack_flat(
    doc_idx: np.ndarray,  # (nnz,) int64/int32 document index per entry
    term_ids: np.ndarray,  # (nnz,) int32 term ids (descending-df numbering)
    weights: np.ndarray,  # (nnz,) float32 precomputed score weights
    num_docs: int,
    vocab_size: int,
    head_terms: int,
    head_dtype: str = "int8",
) -> HybridLayout:
    """Pack flat (doc, term, weight) triples into the hybrid layout.

    Entries must be doc-major (``doc_idx`` non-decreasing) so that each tail
    term's postings come out sorted by document row, which the host tail
    scorer and the device merge rely on.
    """
    if head_dtype not in HEAD_DTYPES:
        raise ValueError(f"Unknown head_dtype: {head_dtype}")
    f = head_terms
    rows = max(_round_up(num_docs, DOC_ALIGN), DOC_ALIGN)

    doc_idx = np.asarray(doc_idx)
    term_ids = np.asarray(term_ids)
    weights = np.asarray(weights, dtype=np.float32)
    in_head = term_ids < f

    head_scales: Optional[np.ndarray] = None
    h_docs, h_terms, h_w = doc_idx[in_head], term_ids[in_head], weights[in_head]
    if head_dtype == "int8":
        # Per-column absmax scale; zero columns get scale 1 (nothing to store).
        colmax = np.zeros(f, dtype=np.float32)
        if h_terms.size:
            np.maximum.at(colmax, h_terms, np.abs(h_w))
        head_scales = np.where(colmax > 0, colmax / 127.0, 1.0).astype(
            np.float32
        )
        head = np.zeros((rows, f), dtype=np.int8)
        if h_terms.size:
            q = np.rint(h_w / head_scales[h_terms])
            head[h_docs, h_terms] = np.clip(q, -127, 127).astype(np.int8)
    elif head_dtype == "int4":
        # Half the head bytes of int8 (the >5M-docs/chip regime): two
        # UNSIGNED [0, 15] codes per byte against per-column SIGNED
        # scales — a column's weights all share the IDF's sign, so the
        # sign lives in the scale and the nibble spends all 15 non-zero
        # levels on magnitude (see unpack_int4). Within a column weights
        # differ only by the bounded saturation, so ~3.3% relative error
        # at the column max; rank agreement is gated by tests.
        colmax = np.zeros(f, dtype=np.float32)
        colmin = np.zeros(f, dtype=np.float32)
        if h_terms.size:
            np.maximum.at(colmax, h_terms, h_w)
            np.minimum.at(colmin, h_terms, h_w)
        head_scales = np.where(
            colmax > 0,
            colmax / 15.0,
            np.where(colmin < 0, colmin / 15.0, 1.0),
        ).astype(np.float32)
        fp = (f + 1) // 2
        codes = np.zeros((rows, 2 * fp), dtype=np.uint8)
        if h_terms.size:
            q = np.clip(np.rint(h_w / head_scales[h_terms]), 0, 15)
            codes[h_docs, h_terms] = q.astype(np.uint8)
        head = (codes[:, :fp] | (codes[:, fp:] << 4)).astype(np.uint8)
    else:
        import ml_dtypes

        dt = ml_dtypes.bfloat16 if head_dtype == "bf16" else np.float32
        head = np.zeros((rows, f), dtype=dt)
        if h_terms.size:
            head[h_docs, h_terms] = h_w.astype(dt)

    # Term-major postings for the tail, rows ascending within each term
    # (stable sort on term id preserves the doc-major input order).
    in_tail = ~in_head
    t_docs = doc_idx[in_tail].astype(np.int32)
    t_terms = term_ids[in_tail] - f
    t_w = weights[in_tail]
    n_tail_terms = vocab_size - f
    order = np.argsort(t_terms, kind="stable")
    post_rows = np.ascontiguousarray(t_docs[order])
    post_weights = np.ascontiguousarray(t_w[order])
    counts = np.bincount(t_terms, minlength=max(n_tail_terms, 0))
    post_ptr = np.zeros(n_tail_terms + 1, dtype=np.int64)
    if n_tail_terms > 0:
        np.cumsum(counts[:n_tail_terms], out=post_ptr[1:])

    valid = np.zeros(rows, dtype=bool)
    valid[:num_docs] = True

    return HybridLayout(
        head_terms=f,
        head=head,
        head_scales=head_scales,
        post_ptr=post_ptr,
        post_rows=post_rows,
        post_weights=post_weights,
        valid=valid,
        num_docs=num_docs,
        vocab_size=vocab_size,
        head_dtype=head_dtype,
    )
