"""The retrieval engine — the single scoring path of the framework.

The reference implements its engine three times (reference
rag_system/core/retrieval.py, rag_system/core/retriever_registry.py,
rag_system/pipeline/evaluate_rag_pipeline.py — see SURVEY.md §0.3); this is
the one implementation everything here uses.

Host/device split:

- host: tokenization, query batching/padding, result-dict assembly, the
  query cache (reference retrieval.py:287-289 semantics: capped insert-only
  cache keyed on (query text, top_k)).
- device: the whole batched search step — query scatter, dense-head MXU
  matmul, sparse-tail gathers, top-k — as ONE jit dispatch (see
  osr_tpu/ops/bm25.py), with batches pipelined asynchronously so fixed
  per-dispatch host/device latency overlaps across batches.

Batches are padded to a small fixed menu of sizes so the jitted step
compiles once per batch-size and is reused for the lifetime of the engine.
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
from osr_tpu.retrieval.encoding import encode_query_batch
from osr_tpu.ops.bm25 import (
    chunk_rows_for_width,
    hybrid_score_topk,
    hybrid_scores,
)

logger = logging.getLogger(__name__)

DEFAULT_BATCH_SIZES = (8, 32, 128)



class _DeviceIndex:
    """Device-resident arrays of a :class:`HybridLayout`."""

    def __init__(self, layout, device, head_dtype="f32"):
        put = lambda a: jax.device_put(a, device)
        head = layout.head_weights
        if head_dtype == "bf16":
            import ml_dtypes

            # Host-side cast: never stages the f32 head on another device.
            head = head.astype(ml_dtypes.bfloat16)
        elif head_dtype != "f32":
            raise ValueError(f"Unknown head_dtype: {head_dtype}")
        self.head_weights = put(head)
        self.valid = put(layout.valid)
        self.doc_map = put(layout.doc_map)
        tail_ids: List[jax.Array] = []
        tail_w: List[jax.Array] = []
        meta: List[Tuple[int, int]] = []
        for b in layout.buckets:
            if b.term_ids is None:
                continue
            tail_ids.append(put(b.term_ids))
            tail_w.append(put(b.weights))
            meta.append(
                (b.row_offset, chunk_rows_for_width(b.width, b.num_rows))
            )
        self.tail_term_ids = tuple(tail_ids)
        self.tail_weights = tuple(tail_w)
        self.tail_meta = tuple(meta)


class SparseSearchEngine:
    """Batched BM25/TF-IDF search over a :class:`SparseIndex` on TPU."""

    def __init__(
        self,
        index: SparseIndex,
        device=None,
        batch_sizes: Sequence[int] = DEFAULT_BATCH_SIZES,
        cache_queries: bool = True,
        query_cache_limit: int = 1000,
        topk_mode: str = "exact",  # 'fast' halves top-k sort cost, see ops/topk.py
        head_dtype: str = "f32",  # 'bf16' halves head HBM; ranking-preserving
    ):
        self.index = index
        self.device = device if device is not None else jax.devices()[0]
        self.batch_sizes = tuple(sorted(batch_sizes))
        self.topk_mode = topk_mode
        self.head_dtype = head_dtype
        self.tokenizer = Tokenizer(index.vocabulary)
        self._vocab_rows = index.vocab_size + 1  # last row absorbs padding
        self._dev = _DeviceIndex(index.layout, self.device, head_dtype)
        # Query cache: (query_text, top_k) -> (ids, scores), insert-only with
        # a cap, matching reference retrieval.py:287-289.
        self._query_cache: Optional[
            Dict[Tuple[str, int], Tuple[np.ndarray, np.ndarray]]
        ] = ({} if cache_queries else None)
        self._cache_limit = query_cache_limit
        self._cache_lock = threading.RLock()

    # ------------------------------------------------------------------
    # Device path
    # ------------------------------------------------------------------

    def search_token_batch_device(
        self, term_ids: jax.Array, term_weights: jax.Array, top_k: int
    ) -> Tuple[jax.Array, jax.Array]:
        """Async: returns device arrays (scores (B, k), global doc ids)."""
        d = self._dev
        return hybrid_score_topk(
            term_ids,
            term_weights,
            d.head_weights,
            d.tail_term_ids,
            d.tail_weights,
            d.valid,
            d.doc_map,
            vocab_rows=self._vocab_rows,
            k=top_k,
            tail_meta=d.tail_meta,
            topk_mode=self.topk_mode,
        )

    def search_token_batch(
        self, term_ids: np.ndarray, term_weights: np.ndarray, top_k: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        s, i = self.search_token_batch_device(
            jnp.asarray(term_ids), jnp.asarray(term_weights), top_k
        )
        return np.asarray(s), np.asarray(i)

    def score_all(self, texts: Sequence[str]) -> np.ndarray:
        """Dense (len(texts), num_docs) score matrix — the test/oracle API.

        Chunks by the engine's largest batch size, so any number of texts
        is accepted.
        """
        d = self._dev
        layout = self.index.layout
        out = np.zeros((len(texts), self.index.num_docs), dtype=np.float32)
        max_b = self.batch_sizes[-1]
        for i in range(0, len(texts), max_b):
            chunk = texts[i : i + max_b]
            tids, wts = self.encode_queries(chunk)
            scores = hybrid_scores(
                jnp.asarray(tids),
                jnp.asarray(wts),
                d.head_weights,
                d.tail_term_ids,
                d.tail_weights,
                vocab_rows=self._vocab_rows,
                tail_meta=d.tail_meta,
            )  # (R, B)
            scores = np.asarray(scores).T  # (B, R)
            out[i : i + len(chunk), layout.doc_map[layout.valid]] = scores[
                : len(chunk), layout.valid
            ]
        return out

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
        """Tokenize + pad a list of query strings to (B, Q) arrays.

        ``len(texts)`` must not exceed the engine's largest batch size
        (raises ValueError otherwise); search() chunks for you.
        """
        return encode_query_batch(
            self.tokenizer,
            texts,
            self._pick_batch_size(len(texts)),
            self.index.vocab_size,
        )

    def search(
        self, queries: Mapping[str, str], top_k: int = 10
    ) -> Dict[str, Dict[str, float]]:
        """Reference-compatible search API: {qid: {doc_id: score}}.

        Matches the reference retriever duck-type ``search(queries, top_k)``
        (reference retriever_registry.py:228): empty queries and queries with
        no in-vocabulary terms return {}; results keep only scores > 0,
        sorted descending. Batches are dispatched asynchronously and results
        collected afterwards, so host work and device work overlap.
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
        in_flight = []  # (chunk, device scores, device ids)
        done = []

        def collect(entry):
            chunk, s_dev, i_dev = entry
            done.append((chunk, np.asarray(s_dev), np.asarray(i_dev)))

        for i in range(0, len(pending), max_b):
            chunk = pending[i : i + max_b]
            tids, wts = self.encode_queries([t for _, t in chunk])
            s_dev, i_dev = self.search_token_batch_device(
                jnp.asarray(tids), jnp.asarray(wts), top_k
            )
            in_flight.append((chunk, s_dev, i_dev))
            # Bounded pipeline: keep a few batches in flight so host and
            # device overlap without unbounded queueing.
            if len(in_flight) > 4:
                collect(in_flight.pop(0))
        while in_flight:
            collect(in_flight.pop(0))

        for chunk, scores, ids in done:
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
            doc_ids[int(i)]: float(s) for i, s in zip(ids, scores) if s > 0
        }

    def clear_cache(self) -> None:
        if self._query_cache is not None:
            with self._cache_lock:
                self._query_cache.clear()

    def stats(self) -> Dict[str, object]:
        s = self.index.stats()
        s["device"] = str(self.device)
        if self._query_cache is not None:
            s["query_cache_size"] = len(self._query_cache)
        return s


class DenseSearchEngine:
    """INT8-quantized (or fp32) dense retrieval on the MXU.

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
        backend: str = "xla",  # 'pallas' routes symmetric int8 similarity
        #                         through the fused Mosaic kernel
    ):
        from osr_tpu.ops import quantize as qz

        self.doc_ids = list(doc_ids)
        self.quantization = quantization
        self.backend = backend
        if backend == "pallas" and quantization != "symmetric":
            raise ValueError("backend='pallas' requires symmetric quantization")
        self.device = device if device is not None else jax.devices()[0]
        self.dim = embeddings.shape[1]
        if backend == "pallas":
            # The Pallas matmul tiles at 128 rows; pad docs with zero-scale
            # rows (their similarity dequantizes to exactly 0).
            pad = (-embeddings.shape[0]) % 128
            if pad:
                embeddings = np.pad(
                    np.asarray(embeddings, np.float32), ((0, pad), (0, 0))
                )
            self._n_real = len(self.doc_ids)
        # Stage on the TARGET device first, then quantize there (the jitted
        # quantizer runs on its input's device) — never materializes the
        # fp32 embeddings on the default device.
        emb_dev = jax.device_put(
            np.asarray(embeddings, dtype=np.float32), self.device
        )
        if quantization == "symmetric":
            self._docs, self._scales = qz.quantize_symmetric(emb_dev)
            if backend == "pallas" and len(self.doc_ids) < emb_dev.shape[0]:
                self._scales = self._scales.at[len(self.doc_ids) :].set(0.0)
            self._mins = None
        elif quantization == "asymmetric":
            self._docs, self._scales, self._mins = qz.quantize_asymmetric(
                emb_dev
            )
        elif quantization == "none":
            self._docs = emb_dev
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
            if self.backend == "pallas":
                return self._search_pallas(q, top_k)
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

    def _search_pallas(self, q: jax.Array, top_k: int):
        """Symmetric int8 search through the fused Mosaic similarity kernel
        (osr_tpu/ops/pallas/matmul.py): quantize queries, one pallas_call
        for the dequantized similarity matrix, lax.top_k over real docs."""
        from jax import lax

        from osr_tpu.ops import quantize as qz
        from osr_tpu.ops.pallas.matmul import int8_similarity_pallas

        b = q.shape[0]
        pad_b = (-b) % 128
        if pad_b:
            q = jnp.pad(q, ((0, pad_b), (0, 0)))
        q8, qs = qz.quantize_symmetric(q)
        sims = int8_similarity_pallas(q8, self._docs, qs, self._scales)
        sims = sims[:b, : self._n_real]
        kk = min(top_k, self._n_real)
        scores, ids = lax.top_k(sims, kk)
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
