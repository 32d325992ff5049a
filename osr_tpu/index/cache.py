"""On-disk index cache.

The analogue of the reference's ``.rag_cache/{method}_index_{hash}.npz``
checkpointing (reference evaluate_rag_pipeline.py:189-201,280-312): built
indexes are serialized keyed by a corpus fingerprint and method, and reloaded
instead of rebuilt. The raw CSR triple (term ids / tfs / indptr) is stored —
not the packed device layout — so cached indexes survive changes to the ELL
bucketing heuristics and BM25 parameters trigger only a cheap re-weighting,
not a re-tokenization.
"""

from __future__ import annotations

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
from osr_tpu.index.layout import choose_head_terms, pack_hybrid

logger = logging.getLogger(__name__)

_FORMAT_VERSION = 1


def cache_path(
    cache_dir: Union[str, Path], method: str, fingerprint: str
) -> Path:
    return Path(cache_dir) / f"{method}_index_{fingerprint}.npz"


def save_index(index: SparseIndex, path: Union[str, Path]) -> None:
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
        np.concatenate(index.doc_tfs) if index.num_docs else np.empty(0, np.float32)
    )
    np.savez_compressed(
        path,
        format_version=_FORMAT_VERSION,
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
    )
    logger.info("Index cached to %s", path)


def load_index(
    path: Union[str, Path], builder: SparseIndexBuilder
) -> SparseIndex:
    t0 = time.perf_counter()
    with np.load(path, allow_pickle=True) as z:
        if int(z["format_version"]) != _FORMAT_VERSION:
            raise ValueError("Incompatible index cache version")
        vocabulary = {t: i for i, t in enumerate(z["vocabulary"].tolist())}
        doc_ids = [str(d) for d in z["doc_ids"].tolist()]
        indptr = z["indptr"]
        flat_tids = z["term_ids"]
        flat_tfs = z["tfs"]
        idf = z["idf"]
        doc_lengths = z["doc_lengths"]
        avgdl = float(z["avgdl"])

    doc_term_ids: List[np.ndarray] = []
    doc_tfs: List[np.ndarray] = []
    for i in range(len(doc_ids)):
        s, e = indptr[i], indptr[i + 1]
        doc_term_ids.append(flat_tids[s:e])
        doc_tfs.append(flat_tfs[s:e])
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
        "Loaded cached index (%d docs) in %.2fs",
        len(doc_ids),
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
            save_index(index, path)
        except Exception as e:
            logger.warning("Failed to cache index: %s", e)
    finally:
        builder.keep_raw_rows = keep
    if not keep:
        index.doc_term_ids = None
        index.doc_tfs = None
    return index
