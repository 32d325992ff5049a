"""Dense embedding sources: synthetic generators and on-disk ingestion.

The reference's dense retrievers fabricate clustered synthetic embeddings
(reference retriever_registry.py:409-433) and hash-seeded query embeddings
(reference retriever_registry.py:526-536) so the dense path can be exercised
without a neural encoder. The same model-free path is kept here for tests
and benchmarks; real encoder-produced embeddings are ingested from disk
(.npy / raw fp32) via :func:`load_embeddings`.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Union

import numpy as np


def synthetic_corpus_embeddings(
    num_docs: int,
    dim: int = 768,
    seed: int = 42,
    num_clusters: Optional[int] = None,
    noise: float = 0.1,
) -> np.ndarray:
    """Clustered unit-norm synthetic embeddings.

    Matches reference retriever_registry.py:409-433: cluster centers from a
    seeded standard normal, docs assigned uniformly to clusters, Gaussian
    noise, L2-normalized rows. Vectorized (no per-doc Python loop).
    """
    rng = np.random.RandomState(seed)
    if num_clusters is None:
        num_clusters = max(1, min(50, num_docs // 10))
    centers = rng.randn(num_clusters, dim).astype(np.float32)
    assignments = rng.randint(0, num_clusters, num_docs)
    emb = centers[assignments] + (
        rng.randn(num_docs, dim).astype(np.float32) * noise
    )
    norms = np.linalg.norm(emb, axis=1, keepdims=True)
    return (emb / np.maximum(norms, 1e-8)).astype(np.float32)


def synthetic_query_embedding(query_text: str, dim: int = 768) -> np.ndarray:
    """Deterministic hash-seeded unit query embedding (reference
    retriever_registry.py:526-536 semantics, but with a stable hash: Python's
    ``hash`` is salted per process, which made the reference's query
    embeddings irreproducible across runs).

    Uses PCG64 (``default_rng``), not the legacy ``RandomState``: MT19937's
    seeding path alone costs ~420 us per query — measured at 57% of the
    entire hybrid search pass at FiQA scale — vs ~3 us here. The exact
    vector values are not a parity surface (the reference's were salted
    per process); determinism and unit norm are."""
    import zlib

    seed = zlib.crc32(query_text.encode("utf-8")) % (2**31)
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim, dtype=np.float32)
    return v / np.linalg.norm(v)


def load_embeddings(
    path: Union[str, Path],
    num_docs: Optional[int] = None,
    dim: Optional[int] = None,
    mmap: bool = True,
) -> np.ndarray:
    """Load real encoder embeddings from .npy/.npz or a raw fp32 blob.

    Raw blobs infer the dim from file size when ``num_docs`` is given
    (reference retrieval.py:320-339 behavior).
    """
    path = Path(path)
    if path.suffix == ".npy":
        return np.load(path, mmap_mode="r" if mmap else None)
    if path.suffix == ".npz":
        with np.load(path) as z:
            return z[z.files[0]]
    # Raw float32 blob
    size = path.stat().st_size
    if dim is None:
        if not num_docs:
            raise ValueError("Need num_docs or dim to infer raw blob shape")
        dim = size // (num_docs * 4)
    num_docs = num_docs or size // (dim * 4)
    return np.memmap(path, dtype=np.float32, mode="r", shape=(num_docs, dim))
