"""On-disk index cache.

The analogue of the reference's ``.rag_cache/{method}_index_{hash}.npz``
checkpointing (reference evaluate_rag_pipeline.py:189-201,280-312), extended
with a fast-load path: both representations are stored —

- the raw CSR triple (term ids / tfs / indptr), which survives changes to
  BM25 parameters and layout heuristics (re-weight + re-pack on load), and
- the packed device layout (dense head + tail buckets), loaded directly —
  no re-tokenization, no re-packing — when the builder parameters match the
  ones the cache was written with.
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path
from typing import List, Mapping, Union

import numpy as np

from osr_tpu.index.builder import (
    SparseIndex,
    SparseIndexBuilder,
    compute_doc_weights,
    corpus_fingerprint,
)
from osr_tpu.index.layout import (
    HybridLayout,
    TailBucket,
    choose_head_terms,
    pack_hybrid,
)

logger = logging.getLogger(__name__)

_FORMAT_VERSION = 2


def cache_path(
    cache_dir: Union[str, Path], method: str, fingerprint: str
) -> Path:
    return Path(cache_dir) / f"{method}_index_{fingerprint}.npz"


def _builder_params(builder: SparseIndexBuilder) -> str:
    return json.dumps(
        {
            "method": builder.method,
            "k1": builder.k1,
            "b": builder.b,
            "head_terms": builder.head_terms,
            "head_budget_bytes": builder.head_budget_bytes,
            "widths": list(builder.widths),
            "min_bucket_docs": builder.min_bucket_docs,
        },
        sort_keys=True,
    )


def save_index(
    index: SparseIndex, path: Union[str, Path], builder: SparseIndexBuilder
) -> None:
    if index.doc_term_ids is None or index.doc_tfs is None:
        raise ValueError(
            "Index was built without keep_raw_rows=True; cannot cache"
        )
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    indptr = np.zeros(index.num_docs + 1, dtype=np.int64)
    for i, t in enumerate(index.doc_term_ids):
        indptr[i + 1] = indptr[i] + len(t)
    flat_tids = (
        np.concatenate(index.doc_term_ids)
        if index.num_docs
        else np.empty(0, np.int32)
    )
    flat_tfs = (
        np.concatenate(index.doc_tfs)
        if index.num_docs
        else np.empty(0, np.float32)
    )
    layout = index.layout
    packed = {
        "packed_head": layout.head_weights,
        "packed_doc_map": layout.doc_map,
        "packed_valid": layout.valid,
        "packed_meta": np.asarray(
            [
                [b.width, b.row_offset, b.num_rows]
                for b in layout.buckets
            ],
            dtype=np.int64,
        ).reshape(-1, 3),
    }
    for i, b in enumerate(layout.buckets):
        if b.term_ids is not None:
            packed[f"packed_ids_{i}"] = b.term_ids
            packed[f"packed_w_{i}"] = b.weights
    np.savez_compressed(
        path,
        format_version=_FORMAT_VERSION,
        builder_params=_builder_params(builder),
        method=index.method,
        k1=index.k1,
        b=index.b,
        avgdl=index.avgdl,
        idf=index.idf,
        doc_lengths=index.doc_lengths,
        vocabulary=np.asarray(list(index.vocabulary.keys()), dtype=object),
        doc_ids=np.asarray(index.doc_ids, dtype=object),
        indptr=indptr,
        term_ids=flat_tids,
        tfs=flat_tfs,
        head_terms=layout.head_terms,
        **packed,
    )
    logger.info("Index cached to %s", path)


def _load_packed_layout(z, num_docs: int, vocab_size: int) -> HybridLayout:
    meta = z["packed_meta"]
    buckets: List[TailBucket] = []
    for i, (width, row_offset, num_rows) in enumerate(meta):
        if f"packed_ids_{i}" in z:
            term_ids, weights = z[f"packed_ids_{i}"], z[f"packed_w_{i}"]
        else:
            term_ids = weights = None
        buckets.append(
            TailBucket(
                width=int(width),
                row_offset=int(row_offset),
                num_rows=int(num_rows),
                term_ids=term_ids,
                weights=weights,
            )
        )
    return HybridLayout(
        head_terms=int(z["head_terms"]),
        head_weights=z["packed_head"],
        buckets=buckets,
        doc_map=z["packed_doc_map"],
        valid=z["packed_valid"],
        num_docs=num_docs,
        vocab_size=vocab_size,
    )


def load_index(
    path: Union[str, Path], builder: SparseIndexBuilder
) -> SparseIndex:
    t0 = time.perf_counter()
    with np.load(path, allow_pickle=True) as z:
        if int(z["format_version"]) != _FORMAT_VERSION:
            raise ValueError("Incompatible index cache version")
        if str(z["method"]) != builder.method:
            # The stored idf belongs to the stored method's formula; silently
            # re-weighting with it under another method would be wrong.
            raise ValueError(
                f"Cache holds a {z['method']} index; builder wants "
                f"{builder.method}"
            )
        vocabulary = {t: i for i, t in enumerate(z["vocabulary"].tolist())}
        doc_ids = [str(d) for d in z["doc_ids"].tolist()]
        idf = z["idf"]
        doc_lengths = z["doc_lengths"]
        avgdl = float(z["avgdl"])
        params_match = str(z["builder_params"]) == _builder_params(builder)

        indptr = z["indptr"]
        flat_tids = z["term_ids"]
        flat_tfs = z["tfs"]
        doc_term_ids: List[np.ndarray] = list(
            np.split(flat_tids, indptr[1:-1])
        )
        doc_tfs: List[np.ndarray] = list(np.split(flat_tfs, indptr[1:-1]))

        if params_match:
            layout = _load_packed_layout(z, len(doc_ids), len(vocabulary))
            how = "packed"
        else:
            doc_weights = compute_doc_weights(
                doc_term_ids,
                doc_tfs,
                doc_lengths,
                idf,
                builder.method,
                builder.k1,
                builder.b,
                avgdl,
            )
            f = choose_head_terms(
                len(doc_ids),
                len(vocabulary),
                builder.head_terms,
                builder.head_budget_bytes,
            )
            layout = pack_hybrid(
                doc_term_ids,
                doc_weights,
                len(vocabulary),
                head_terms=f,
                widths=builder.widths,
                min_bucket_docs=builder.min_bucket_docs,
            )
            how = "re-packed"

    index = SparseIndex(
        method=builder.method,
        vocabulary=vocabulary,
        doc_ids=doc_ids,
        layout=layout,
        idf=idf,
        doc_lengths=doc_lengths,
        avgdl=avgdl,
        k1=builder.k1,
        b=builder.b,
        doc_term_ids=doc_term_ids if builder.keep_raw_rows else None,
        doc_tfs=doc_tfs if builder.keep_raw_rows else None,
    )
    logger.info(
        "Loaded cached index (%d docs, %s) in %.2fs",
        len(doc_ids),
        how,
        time.perf_counter() - t0,
    )
    return index


def load_or_build(
    builder: SparseIndexBuilder,
    corpus: Mapping[str, object],
    cache_dir: Union[str, Path] = ".rag_cache",
) -> SparseIndex:
    """Probe the cache; on miss, build and store (reference
    evaluate_rag_pipeline.py:181-208 flow)."""
    fp = corpus_fingerprint(corpus)
    path = cache_path(cache_dir, builder.method, fp)
    if path.exists():
        try:
            return load_index(path, builder)
        except Exception as e:  # corrupt/stale cache -> rebuild
            logger.warning("Index cache load failed (%s); rebuilding", e)
    keep = builder.keep_raw_rows
    builder.keep_raw_rows = True
    try:
        index = builder.build(corpus)
        try:
            save_index(index, path, builder)
        except Exception as e:
            logger.warning("Failed to cache index: %s", e)
    finally:
        builder.keep_raw_rows = keep
    if not keep:
        index.doc_term_ids = None
        index.doc_tfs = None
    return index
