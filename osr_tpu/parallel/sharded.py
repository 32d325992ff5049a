"""Multi-chip sharded retrieval via shard_map + collectives.

The distributed layer the reference lacks (SURVEY.md §2.4, §5.8): index rows
are sharded across the ``d`` mesh axis, queries across the ``q`` axis. Each
chip scores its document-row shard (dense head matmul + sparse-tail gather,
see osr_tpu/ops/bm25.py) and selects a local top-k *with global doc ids*;
one ``all_gather`` over ICI moves only O(B x n_d x k) candidates, and a
final top-k merges them. Document text fetch stays host-side.

Exactness: per-shard top-k + merge returns exactly the global top-k (each of
the true top-k docs lives on some shard, where it ranks within the local
top-k). Verified against the single-device engine in tests/test_sharded.py.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Mapping, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from osr_tpu.index.builder import SparseIndex
from osr_tpu.index.tokenizer import Tokenizer
from osr_tpu.ops.bm25 import (
    bucket_scores,
    build_query_matrix,
    chunk_rows_for_width,
)
from osr_tpu.retrieval.encoding import encode_query_batch
from osr_tpu.parallel.mesh import DOC_AXIS, QUERY_AXIS

NEG_INF = float("-inf")


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "vocab_rows", "k", "bucket_meta"),
)
def sharded_hybrid_score_topk(
    q_term_ids: jax.Array,  # (B, Q) int32, sharded over q
    q_weights: jax.Array,  # (B, Q) float32, sharded over q
    heads: Tuple[jax.Array, ...],  # per bucket (rows_i, F), sharded over d
    term_ids: Tuple[jax.Array, ...],  # per bucket (rows_i, K_i) (K may be 0)
    weights: Tuple[jax.Array, ...],
    valids: Tuple[jax.Array, ...],  # per bucket (rows_i,) bool
    doc_maps: Tuple[jax.Array, ...],  # per bucket (rows_i,) GLOBAL doc ids
    *,
    mesh: Mesh,
    vocab_rows: int,
    k: int,
    bucket_meta: Tuple[Tuple[bool, int], ...],  # (has_tail, chunk_rows)
) -> Tuple[jax.Array, jax.Array]:
    """The full sharded search step in ONE program: per-shard scoring of
    every bucket, local top-k with global ids, all-gather candidate
    exchange over ICI, final merge."""

    def local(qt, qwts, heads, tis, ws, vs, dmaps):
        qw = build_query_matrix(qt, qwts, vocab_rows=vocab_rows)
        cand_scores = []
        cand_ids = []
        # Per-bucket local top-k first: the merge input is bounded at
        # (B, n_buckets*k) instead of keeping every bucket's full
        # (rows_local, B) score matrix live through one concatenation.
        for head, ti, w, v, dmap, (has_tail, chunk_rows) in zip(
            heads, tis, ws, vs, dmaps, bucket_meta
        ):
            scores = bucket_scores(
                qw,
                head,
                ti if has_tail else None,
                w if has_tail else None,
                chunk_rows=chunk_rows,
            )  # (rows_local, B)
            scores = jnp.where(v[:, None], scores, NEG_INF)
            kb = min(k, scores.shape[0])
            s_b, rows_b = lax.top_k(scores.T, kb)  # (B_local, kb)
            cand_scores.append(s_b)
            cand_ids.append(dmap[rows_b])
        all_cand_s = jnp.concatenate(cand_scores, axis=1)
        all_cand_i = jnp.concatenate(cand_ids, axis=1)
        kk = min(k, all_cand_s.shape[1])
        local_scores, pos = lax.top_k(all_cand_s, kk)
        local_ids = jnp.take_along_axis(all_cand_i, pos, axis=-1)
        # Candidate exchange over ICI: (B_local, n_d * kk) per query shard.
        all_scores = lax.all_gather(local_scores, DOC_AXIS, axis=1, tiled=True)
        all_ids = lax.all_gather(local_ids, DOC_AXIS, axis=1, tiled=True)
        kk2 = min(k, all_scores.shape[1])
        top_scores, pos = lax.top_k(all_scores, kk2)
        return top_scores, jnp.take_along_axis(all_ids, pos, axis=-1)

    n = len(heads)
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(QUERY_AXIS, None),
            P(QUERY_AXIS, None),
            (P(DOC_AXIS, None),) * n,
            (P(DOC_AXIS, None),) * n,
            (P(DOC_AXIS, None),) * n,
            (P(DOC_AXIS),) * n,
            (P(DOC_AXIS),) * n,
        ),
        out_specs=(P(QUERY_AXIS, None), P(QUERY_AXIS, None)),
        check_vma=False,
    )(q_term_ids, q_weights, heads, term_ids, weights, valids, doc_maps)


class _ShardedBucket:
    """One layout bucket (head slice + optional tail) sharded over ``d``."""

    def __init__(self, layout, bucket, mesh: Mesh):
        n_d = mesh.shape[DOC_AXIS]
        lo, hi = bucket.row_offset, bucket.row_offset + bucket.num_rows
        rows = _round_up(bucket.num_rows, n_d)
        pad = rows - bucket.num_rows

        head = np.pad(layout.head_weights[lo:hi], ((0, pad), (0, 0)))
        valid = np.pad(layout.valid[lo:hi], (0, pad))
        doc_map = np.pad(layout.doc_map[lo:hi], (0, pad))
        self.has_tail = bucket.term_ids is not None and bucket.width > 0
        if self.has_tail:
            term_ids = np.pad(bucket.term_ids, ((0, pad), (0, 0)))
            weights = np.pad(bucket.weights, ((0, pad), (0, 0)))
        else:
            term_ids = np.zeros((rows, 0), dtype=np.int32)
            weights = np.zeros((rows, 0), dtype=np.float32)

        shard_rows = NamedSharding(mesh, P(DOC_AXIS, None))
        shard_vec = NamedSharding(mesh, P(DOC_AXIS))
        self.head = jax.device_put(head, shard_rows)
        self.term_ids = jax.device_put(term_ids, shard_rows)
        self.weights = jax.device_put(weights, shard_rows)
        self.valid = jax.device_put(valid, shard_vec)
        self.doc_map = jax.device_put(doc_map, shard_vec)
        self.chunk_rows = chunk_rows_for_width(
            max(bucket.width, 1), max(rows // n_d, 1)
        )


class ShardedSparseSearchEngine:
    """Document-sharded, query-data-parallel BM25/TF-IDF search.

    Same host API as :class:`osr_tpu.retrieval.engine.SparseSearchEngine`,
    but the index lives sharded across every chip of ``mesh``.
    """

    def __init__(
        self,
        index: SparseIndex,
        mesh: Mesh,
        batch_sizes: Sequence[int] = (8, 32, 128),
    ):
        self.index = index
        self.mesh = mesh
        self.n_q = mesh.shape[QUERY_AXIS]
        self.batch_sizes = tuple(
            _round_up(b, self.n_q) for b in sorted(batch_sizes)
        )
        self.tokenizer = Tokenizer(index.vocabulary)
        self._vocab_rows = index.vocab_size + 1
        self._buckets = [
            _ShardedBucket(index.layout, b, mesh)
            for b in index.layout.buckets
        ]
        self._qshard = NamedSharding(mesh, P(QUERY_AXIS, None))

    def _pick_batch_size(self, n: int) -> int:
        for b in self.batch_sizes:
            if n <= b:
                return b
        return self.batch_sizes[-1]

    def encode_queries(
        self, texts: Sequence[str]
    ) -> Tuple[np.ndarray, np.ndarray]:
        return encode_query_batch(
            self.tokenizer,
            texts,
            self._pick_batch_size(len(texts)),
            self.index.vocab_size,
        )

    def search_token_batch(
        self, term_ids: np.ndarray, term_weights: np.ndarray, top_k: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        qt = jax.device_put(term_ids, self._qshard)
        qwts = jax.device_put(term_weights, self._qshard)
        bs = self._buckets
        s, i = sharded_hybrid_score_topk(
            qt,
            qwts,
            tuple(b.head for b in bs),
            tuple(b.term_ids for b in bs),
            tuple(b.weights for b in bs),
            tuple(b.valid for b in bs),
            tuple(b.doc_map for b in bs),
            mesh=self.mesh,
            vocab_rows=self._vocab_rows,
            k=top_k,
            bucket_meta=tuple((b.has_tail, b.chunk_rows) for b in bs),
        )
        return np.asarray(s), np.asarray(i)

    def search(
        self, queries: Mapping[str, str], top_k: int = 10
    ) -> Dict[str, Dict[str, float]]:
        results: Dict[str, Dict[str, float]] = {}
        pending = [
            (qid, (text or "").strip()) for qid, text in queries.items()
        ]
        doc_ids = self.index.doc_ids
        max_b = self.batch_sizes[-1]
        for i in range(0, len(pending), max_b):
            chunk = pending[i : i + max_b]
            tids, wts = self.encode_queries([t for _, t in chunk])
            scores, ids = self.search_token_batch(tids, wts, top_k)
            for row, (qid, text) in enumerate(chunk):
                if not text:
                    results[qid] = {}
                    continue
                results[qid] = {
                    doc_ids[int(d)]: float(s)
                    for d, s in zip(ids[row], scores[row])
                    if s > 0
                }
        return results


class ShardedDenseSearchEngine:
    """Document-sharded INT8 dense retrieval: each chip scores its embedding
    shard on the MXU; candidates merge via all_gather over ICI."""

    def __init__(self, doc_ids: Sequence[str], embeddings: np.ndarray, mesh: Mesh):
        from osr_tpu.ops import quantize as qz

        self.doc_ids = list(doc_ids)
        self.mesh = mesh
        n_d = mesh.shape[DOC_AXIS]
        n = embeddings.shape[0]
        rows = _round_up(n, n_d)
        emb = np.pad(embeddings.astype(np.float32), ((0, rows - n), (0, 0)))
        values, scales = qz.quantize_symmetric(jnp.asarray(emb))
        # Padding rows quantize to zeros; force their scale to 0 so scores
        # are exactly 0 (they can still never beat real positive scores).
        scales = scales.at[n:].set(0.0)
        valid = np.arange(rows) < n
        self._docs = jax.device_put(
            values, NamedSharding(mesh, P(DOC_AXIS, None))
        )
        self._scales = jax.device_put(scales, NamedSharding(mesh, P(DOC_AXIS)))
        self._valid = jax.device_put(valid, NamedSharding(mesh, P(DOC_AXIS)))
        self._qshard = NamedSharding(mesh, P(QUERY_AXIS, None))
        self.n_rows = rows

    @functools.partial(jax.jit, static_argnames=("self", "k"))
    def _search(self, queries: jax.Array, *, k: int):
        from osr_tpu.ops import quantize as qz

        mesh = self.mesh
        n_d = mesh.shape[DOC_AXIS]
        rows_local = self.n_rows // n_d

        def local(q, docs, scales, valid):
            q_int8, q_scales = qz.quantize_symmetric(q)
            sims = qz.int8_dot_product_batch(q_int8, docs, q_scales, scales)
            sims = jnp.where(valid[None, :], sims, NEG_INF)
            kk = min(k, rows_local)
            s, idx = lax.top_k(sims, kk)
            base = lax.axis_index(DOC_AXIS) * rows_local
            ids = idx + base
            s_all = lax.all_gather(s, DOC_AXIS, axis=1, tiled=True)
            i_all = lax.all_gather(ids, DOC_AXIS, axis=1, tiled=True)
            kk2 = min(k, s_all.shape[1])
            top, pos = lax.top_k(s_all, kk2)
            return top, jnp.take_along_axis(i_all, pos, axis=-1)

        return shard_map(
            local,
            mesh=mesh,
            in_specs=(
                P(QUERY_AXIS, None),
                P(DOC_AXIS, None),
                P(DOC_AXIS),
                P(DOC_AXIS),
            ),
            out_specs=(P(QUERY_AXIS, None), P(QUERY_AXIS, None)),
            check_vma=False,
        )(queries, self._docs, self._scales, self._valid)

    def search_vectors(
        self, query_vectors: np.ndarray, top_k: int = 10
    ) -> Tuple[np.ndarray, np.ndarray]:
        q = jax.device_put(
            np.asarray(query_vectors, dtype=np.float32), self._qshard
        )
        # Clamp to the REAL doc count: with k > N the merge would have to
        # fill slots with -inf padding rows whose ids exceed len(doc_ids).
        s, i = self._search(q, k=min(top_k, len(self.doc_ids)))
        return np.asarray(s), np.asarray(i)
