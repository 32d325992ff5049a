"""Vectorized result-dict assembly shared by every dict-surface engine.

The reference's retriever duck-type returns ``{qid: {doc_id: score}}``
(reference retriever_registry.py:228). Building those dicts was measured
at ~130 ms per 6,648-query batch (k=50) with a per-element filtering
dict-comprehension — a double-digit percentage of a whole search pass.
This module assembles them with one boolean mask, one object-array
doc-id gather and one bulk ``tolist`` for the entire batch, then a
``dict(zip())`` per row over exact-size list slices: measured 2x faster
at bench shape, byte-identical output (same row-major insertion order,
same f32→Python-float conversion).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np


def as_object_names(doc_ids) -> np.ndarray:
    """Object-dtype doc-id array for vectorized (B, k) -> name gathers."""
    if isinstance(doc_ids, np.ndarray) and doc_ids.dtype == object:
        return doc_ids
    return np.array(doc_ids, dtype=object)


def assemble_result_dicts(
    doc_names: np.ndarray,  # (N,) object ndarray (as_object_names)
    ids: np.ndarray,  # (B, k) integer rows
    scores: np.ndarray,  # (B, k) scores
    mask: np.ndarray,  # (B, k) bool: which entries to keep
) -> List[Dict[str, float]]:
    """One ``{doc_id: score}`` dict per row, in row-major entry order.

    ``mask`` must already exclude out-of-range ids (callers own the
    filter semantics: ``> 0`` for BM25, ``> min_score`` for dense,
    ``>= 0`` sentinel ids for fusion).
    """
    flat = np.nonzero(mask.ravel())[0]
    names = doc_names[ids.ravel()[flat]].tolist()
    vals = scores.ravel()[flat].astype(np.float64).tolist()
    bounds = np.cumsum(mask.sum(axis=1), dtype=np.int64).tolist()
    out: List[Dict[str, float]] = []
    start = 0
    for end in bounds:
        out.append(dict(zip(names[start:end], vals[start:end])))
        start = end
    return out
