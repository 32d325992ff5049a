"""The retrieval engine — the single scoring path of the framework.

The reference implements its engine three times (reference
rag_system/core/retrieval.py, rag_system/core/retriever_registry.py,
rag_system/pipeline/evaluate_rag_pipeline.py — see SURVEY.md §0.3); this is
the one implementation everything here uses.

Host/device split:

- host: tokenization, query batching/padding, result-dict assembly, the
  query cache (reference retrieval.py:287-289 semantics: capped insert-only
  cache keyed on (query text, top_k)).
- device: dense query-matrix scatter, bucketed ELL scoring, per-bucket
  top-k, cross-bucket merge — all jit-compiled, batched, HBM-resident.

Batches are padded to a small fixed menu of sizes so the jitted kernels
compile once per (bucket, batch-size) pair and are reused for the lifetime
of the engine.
"""

from __future__ import annotations

import logging
import threading
from typing import Dict, List, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from osr_tpu.index.builder import SparseIndex
from osr_tpu.index.tokenizer import Tokenizer
from osr_tpu.ops.bm25 import (
    build_query_matrix,
    chunk_rows_for_width,
    score_and_topk_bucket,
)
from osr_tpu.ops.topk import merge_topk

logger = logging.getLogger(__name__)

DEFAULT_BATCH_SIZES = (8, 32, 128)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class _DeviceBucket:
    """Device-resident arrays of one ELL bucket."""

    def __init__(self, bucket, device):
        self.width = bucket.width
        self.num_rows = bucket.num_rows
        put = lambda a: jax.device_put(a, device)
        self.term_ids = put(bucket.term_ids)
        self.weights = put(bucket.weights)
        self.valid = put(bucket.valid)
        self.doc_perm = put(bucket.doc_perm)
        self.chunk_rows = chunk_rows_for_width(bucket.width, bucket.num_rows)


class SparseSearchEngine:
    """Batched BM25/TF-IDF search over a :class:`SparseIndex` on TPU."""

    def __init__(
        self,
        index: SparseIndex,
        device=None,
        backend: str = "xla",
        batch_sizes: Sequence[int] = DEFAULT_BATCH_SIZES,
        cache_queries: bool = True,
        query_cache_limit: int = 1000,
    ):
        self.index = index
        self.device = device if device is not None else jax.devices()[0]
        if backend not in ("xla", "pallas"):
            raise ValueError(f"Unknown backend: {backend}")
        self.backend = backend
        self.batch_sizes = tuple(sorted(batch_sizes))
        self.tokenizer = Tokenizer(index.vocabulary)
        self._vocab_rows = index.vocab_size + 1  # last row absorbs padding
        self._buckets = [
            _DeviceBucket(b, self.device) for b in index.ell.buckets
        ]
        # Query cache: (query_text, top_k) -> (ids, scores), insert-only with
        # a cap, matching reference retrieval.py:287-289.
        self._query_cache: Optional[Dict[Tuple[str, int], Tuple[np.ndarray, np.ndarray]]] = (
            {} if cache_queries else None
        )
        self._cache_limit = query_cache_limit
        self._cache_lock = threading.RLock()

    # ------------------------------------------------------------------
    # Device path
    # ------------------------------------------------------------------

    def _score_topk_fn(self):
        if self.backend == "pallas":
            from osr_tpu.ops.pallas.scoring import score_and_topk_bucket_pallas

            return score_and_topk_bucket_pallas
        return score_and_topk_bucket

    def search_token_batch(
        self,
        term_ids: np.ndarray,  # (B, Q) int32, pad = vocab_size
        term_weights: np.ndarray,  # (B, Q) float32, pad = 0
        top_k: int,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Device search over an already-encoded query batch.

        Returns (scores (B, k), global_doc_indices (B, k)) as NumPy, sorted
        descending. Entries padded (when corpus < k) carry -inf scores.
        """
        scores_dev, ids_dev = self.search_token_batch_device(
            jnp.asarray(term_ids), jnp.asarray(term_weights), top_k
        )
        return np.asarray(scores_dev), np.asarray(ids_dev)

    def search_token_batch_device(
        self, term_ids: jax.Array, term_weights: jax.Array, top_k: int
    ) -> Tuple[jax.Array, jax.Array]:
        qw = build_query_matrix(
            term_ids, term_weights, vocab_rows=self._vocab_rows
        )
        fn = self._score_topk_fn()
        parts_scores: List[jax.Array] = []
        parts_ids: List[jax.Array] = []
        for db in self._buckets:
            s, i = fn(
                qw,
                db.term_ids,
                db.weights,
                db.valid,
                db.doc_perm,
                chunk_rows=db.chunk_rows,
                k=top_k,
            )
            parts_scores.append(s)
            parts_ids.append(i)
        if len(parts_scores) == 1:
            return parts_scores[0], parts_ids[0]
        return merge_topk(parts_scores, parts_ids, top_k)

    # ------------------------------------------------------------------
    # Host path
    # ------------------------------------------------------------------

    def _pick_batch_size(self, n: int) -> int:
        for b in self.batch_sizes:
            if n <= b:
                return b
        return self.batch_sizes[-1]

    def encode_queries(
        self, texts: Sequence[str]
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Tokenize + pad a list of query strings to (B, Q) arrays."""
        encoded = self.tokenizer.encode_batch(texts)
        b = self._pick_batch_size(len(texts))
        q = _round_up(max((len(e) for e in encoded), default=1) or 1, 8)
        tids = np.full((b, q), self.index.vocab_size, dtype=np.int32)
        wts = np.zeros((b, q), dtype=np.float32)
        for row, pairs in enumerate(encoded):
            for col, (tid, cnt) in enumerate(pairs):
                tids[row, col] = tid
                wts[row, col] = cnt
        return tids, wts

    def search(
        self, queries: Mapping[str, str], top_k: int = 10
    ) -> Dict[str, Dict[str, float]]:
        """Reference-compatible search API: {qid: {doc_id: score}}.

        Matches reference retriever duck-type ``search(queries, top_k)``
        (reference retriever_registry.py:228): empty queries and queries with
        no in-vocabulary terms return {}; results keep only scores > 0,
        sorted descending.
        """
        results: Dict[str, Dict[str, float]] = {}
        pending: List[Tuple[str, str]] = []

        for qid, text in queries.items():
            text = (text or "").strip()
            if not text:
                results[qid] = {}
                continue
            if self._query_cache is not None:
                with self._cache_lock:
                    hit = self._query_cache.get((text, top_k))
                if hit is not None:
                    results[qid] = self._to_result(*hit)
                    continue
            pending.append((qid, text))

        max_b = self.batch_sizes[-1]
        for i in range(0, len(pending), max_b):
            chunk = pending[i : i + max_b]
            texts = [t for _, t in chunk]
            tids, wts = self.encode_queries(texts)
            scores, ids = self.search_token_batch(tids, wts, top_k)
            for row, (qid, text) in enumerate(chunk):
                row_ids, row_scores = ids[row], scores[row]
                if self._query_cache is not None:
                    with self._cache_lock:
                        if len(self._query_cache) < self._cache_limit:
                            self._query_cache[(text, top_k)] = (
                                row_ids,
                                row_scores,
                            )
                results[qid] = self._to_result(row_ids, row_scores)
        return results

    def _to_result(
        self, ids: np.ndarray, scores: np.ndarray
    ) -> Dict[str, float]:
        doc_ids = self.index.doc_ids
        return {
            doc_ids[int(i)]: float(s)
            for i, s in zip(ids, scores)
            if s > 0
        }

    def clear_cache(self) -> None:
        if self._query_cache is not None:
            with self._cache_lock:
                self._query_cache.clear()

    def stats(self) -> Dict[str, object]:
        s = self.index.stats()
        s["backend"] = self.backend
        s["device"] = str(self.device)
        if self._query_cache is not None:
            s["query_cache_size"] = len(self._query_cache)
        return s


class DenseSearchEngine:
    """INT8-quantized (or fp32/bf16) dense retrieval on the MXU.

    Replaces the reference's ``QuantizedEmbeddingRetriever`` scoring loop
    (reference retriever_registry.py:90-117,465-524): similarity is an int8
    matmul with ``preferred_element_type=int32`` and a fused per-row dequant
    epilogue — the configuration the MXU natively accelerates (the
    reference's Numba int8 loop measured 0.19x vs fp32; see BASELINE.md).
    """

    def __init__(
        self,
        doc_ids: Sequence[str],
        embeddings: np.ndarray,  # (N, dim) float32
        quantization: str = "symmetric",  # 'symmetric' | 'asymmetric' | 'none'
        device=None,
    ):
        from osr_tpu.ops import quantize as qz

        self.doc_ids = list(doc_ids)
        self.quantization = quantization
        self.device = device if device is not None else jax.devices()[0]
        self.dim = embeddings.shape[1]
        put = lambda a: jax.device_put(jnp.asarray(a), self.device)
        if quantization == "symmetric":
            values, scales = qz.quantize_symmetric(jnp.asarray(embeddings))
            self._docs = put(values)
            self._scales = put(scales)
            self._mins = None
        elif quantization == "asymmetric":
            values, scales, mins = qz.quantize_asymmetric(jnp.asarray(embeddings))
            self._docs = put(values)
            self._scales = put(scales)
            self._mins = put(mins)
        elif quantization == "none":
            self._docs = put(embeddings.astype(np.float32))
            self._scales = None
            self._mins = None
        else:
            raise ValueError(f"Unknown quantization: {quantization}")

    def search_vectors(
        self, query_vectors: np.ndarray, top_k: int = 10
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Return (scores (B, k), doc_indices (B, k)) for fp32 query vectors."""
        from osr_tpu.ops import quantize as qz

        q = jnp.asarray(query_vectors, dtype=jnp.float32)
        if self.quantization == "symmetric":
            scores, ids = qz.int8_search_symmetric(
                q, self._docs, self._scales, k=top_k
            )
        elif self.quantization == "asymmetric":
            scores, ids = qz.int8_search_asymmetric(
                q, self._docs, self._scales, self._mins, k=top_k
            )
        else:
            scores, ids = qz.fp_search(q, self._docs, k=top_k)
        return np.asarray(scores), np.asarray(ids)

    def search(
        self,
        query_vectors: Mapping[str, np.ndarray],
        top_k: int = 10,
        min_score: float = 0.0,
    ) -> Dict[str, Dict[str, float]]:
        qids = list(query_vectors.keys())
        if not qids:
            return {}
        batch = np.stack([np.asarray(query_vectors[q]) for q in qids])
        scores, ids = self.search_vectors(batch, top_k=top_k)
        return {
            qid: {
                self.doc_ids[int(i)]: float(s)
                for i, s in zip(ids[row], scores[row])
                if s > min_score
            }
            for row, qid in enumerate(qids)
        }
