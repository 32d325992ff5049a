"""Multi-chip sharded retrieval via shard_map + collectives.

The distributed layer the reference lacks (SURVEY.md §2.4, §5.8): index rows
are sharded across the ``d`` mesh axis, queries across the ``q`` axis. Each
chip scores its document-row shard of the dense head with one MXU matmul
and selects a local top-k *with global doc ids*; one ``all_gather`` over
ICI moves only O(B x n_d x k) candidates, and a final top-k merges them.

The tail-touched candidate list (computed on the host, globally —
osr_tpu/index/postings.py) is replicated to every chip; each chip gathers
the head scores of the candidates that fall in ITS (row range, query range)
and a ``psum`` over both mesh axes reassembles the full flat vector (each
candidate is owned by exactly one chip, so the sum is exact). The final
head-topk/candidate merge runs on the host, identical to the single-device
engine. Document text fetch stays host-side.

Exactness: per-shard top-k + merge returns exactly the global top-k (each
true top-k doc lives on some shard, where it ranks within the local top-k);
the candidate channel is exact by construction. Verified against the
single-device engine in tests/test_sharded.py.
"""

from __future__ import annotations

import functools
from typing import Dict, Mapping, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from osr_tpu.index.builder import SparseIndex
from osr_tpu.index.postings import merge_host, tail_candidates_flat
from osr_tpu.index.tokenizer import Tokenizer
from osr_tpu.ops.bm25 import NEG_INF, head_scores, scatter_query_head
from osr_tpu.retrieval.encoding import (
    EncodedBatch,
    QueryEncoder,
    encode_query_batch,
)
from osr_tpu.index.layout import _round_up
from osr_tpu.parallel.mesh import DOC_AXIS, QUERY_AXIS


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "head_terms", "k"),
)
def sharded_search(
    q_head_ids: jax.Array,  # (B, Q) int32, sharded over q
    q_head_weights: jax.Array,  # (B, Q) float32, sharded over q
    cand_flat_rows: jax.Array,  # (M,) int32 GLOBAL rows, replicated
    cand_flat_cols: jax.Array,  # (M,) int32 GLOBAL query index, replicated
    head: jax.Array,  # (R_padded, F), sharded over d
    head_scales,  # (F,) f32 or None, replicated
    valid: jax.Array,  # (R_padded,) bool, sharded over d
    *,
    mesh: Mesh,
    head_terms: int,
    k: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """The sharded device step in ONE program: per-shard head matmul, local
    top-k with global ids, all-gather merge over ICI, and the flat
    candidate head-score gather reassembled with a psum."""
    r_padded = head.shape[0]
    n_d = mesh.shape[DOC_AXIS]
    n_q = mesh.shape[QUERY_AXIS]
    b_total = q_head_ids.shape[0]
    b_local = b_total // n_q

    def local(qt, qwts, crows, ccols, head_l, scales, valid_l):
        rows_local = r_padded // n_d
        qhead = scatter_query_head(qt, qwts, head_terms=head_terms)
        hs = head_scores(head_l, scales, qhead)  # (B_local, rows_local)
        hs = jnp.where(valid_l[None, :], hs, NEG_INF)
        row_lo = lax.axis_index(DOC_AXIS) * rows_local
        col_lo = lax.axis_index(QUERY_AXIS) * b_local

        kk = min(k, rows_local)
        if rows_local >= 4096 and rows_local // 128 > 2 * kk:
            from osr_tpu.ops.topk import block_topk

            s, idx = block_topk(hs, k=kk)  # exact; see ops/topk.py
        else:
            s, idx = lax.top_k(hs, kk)  # (B_local, kk) local rows
        ids = idx.astype(jnp.int32) + row_lo
        s_all = lax.all_gather(s, DOC_AXIS, axis=1, tiled=True)
        i_all = lax.all_gather(ids, DOC_AXIS, axis=1, tiled=True)
        kk2 = min(k, s_all.shape[1])
        top, pos = lax.top_k(s_all, kk2)
        top_ids = jnp.take_along_axis(i_all, pos, axis=1)

        # Flat candidate gather: this chip owns candidates whose row is in
        # its d-shard AND whose query is in its q-shard; elsewhere
        # contribute 0 and let the psum reassemble the full vector.
        lrow = crows - row_lo
        lcol = ccols - col_lo
        mine = (
            (lrow >= 0)
            & (lrow < rows_local)
            & (lcol >= 0)
            & (lcol < b_local)
        )
        vals = hs[
            jnp.clip(lcol, 0, b_local - 1),
            jnp.clip(lrow, 0, rows_local - 1),
        ]
        cand_head = lax.psum(
            jnp.where(mine, vals, 0.0), (DOC_AXIS, QUERY_AXIS)
        )
        return top, top_ids, cand_head

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(QUERY_AXIS, None),
            P(QUERY_AXIS, None),
            P(),
            P(),
            P(DOC_AXIS, None),
            P(),
            P(DOC_AXIS),
        ),
        out_specs=(P(QUERY_AXIS, None), P(QUERY_AXIS, None), P()),
        check_vma=False,
    )(
        q_head_ids,
        q_head_weights,
        cand_flat_rows,
        cand_flat_cols,
        head,
        head_scales,
        valid,
    )


class ShardedSparseSearchEngine:
    """Document-sharded, query-data-parallel BM25/TF-IDF search.

    Same host API as :class:`osr_tpu.retrieval.engine.SparseSearchEngine`,
    but the dense head lives sharded across every chip of ``mesh``; the
    postings tail stays host-resident (it is scored on the host either way).
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
        n_d = mesh.shape[DOC_AXIS]
        self.batch_sizes = tuple(
            _round_up(b, self.n_q) for b in sorted(batch_sizes)
        )
        self.tokenizer = Tokenizer(index.vocabulary)
        self.encoder = QueryEncoder(self.tokenizer)
        layout = index.layout
        r = layout.num_rows
        self.r_padded = _round_up(r, n_d * 8)
        pad = self.r_padded - r

        head = np.pad(np.asarray(layout.head), ((0, pad), (0, 0)))
        valid = np.pad(layout.valid, (0, pad))
        shard_rows = NamedSharding(mesh, P(DOC_AXIS, None))
        shard_vec = NamedSharding(mesh, P(DOC_AXIS))
        repl = NamedSharding(mesh, P())
        self._repl = repl
        self._head = jax.device_put(head, shard_rows)
        self._scales = (
            jax.device_put(layout.head_scales, repl)
            if layout.head_scales is not None
            else None
        )
        self._valid = jax.device_put(valid, shard_vec)
        self._qshard = NamedSharding(mesh, P(QUERY_AXIS, None))

    def encode_queries(self, texts: Sequence[str]) -> EncodedBatch:
        from osr_tpu.retrieval.encoding import pick_batch_size

        return encode_query_batch(
            self.encoder,
            texts,
            pick_batch_size(self.batch_sizes, len(texts)),
            self.index.layout.head_terms,
        )

    def search_token_batch(
        self, texts: Sequence[str], top_k: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        enc = self.encode_queries(texts)
        layout = self.index.layout
        cand = tail_candidates_flat(
            layout.post_ptr,
            layout.post_rows,
            layout.post_weights,
            enc.tail_ids,
            enc.tail_counts,
            enc.tail_ptr,
            enc.head_ids.shape[0],
            num_rows=layout.num_rows,
            pad_to_menu=True,
        )
        head_s, head_r, cand_head = sharded_search(
            jax.device_put(enc.head_ids, self._qshard),
            jax.device_put(enc.head_weights, self._qshard),
            jax.device_put(cand.rows, self._repl),
            jax.device_put(cand.cols, self._repl),
            self._head,
            self._scales,
            self._valid,
            mesh=self.mesh,
            head_terms=layout.head_terms,
            k=top_k,
        )
        return merge_host(
            np.asarray(head_s),
            np.asarray(head_r),
            cand,
            np.asarray(cand_head),
            layout.num_rows,
            top_k,
        )

    def search(
        self, queries: Mapping[str, str], top_k: int = 10
    ) -> Dict[str, Dict[str, float]]:
        results: Dict[str, Dict[str, float]] = {}
        pending = [
            (qid, (text or "").strip()) for qid, text in queries.items()
        ]
        doc_ids = self.index.doc_ids
        n_docs = len(doc_ids)
        max_b = self.batch_sizes[-1]
        for i in range(0, len(pending), max_b):
            chunk = pending[i : i + max_b]
            scores, ids = self.search_token_batch(
                [t for _, t in chunk], top_k
            )
            for row, (qid, text) in enumerate(chunk):
                if not text:
                    results[qid] = {}
                    continue
                results[qid] = {
                    doc_ids[int(d)]: float(s)
                    for d, s in zip(ids[row], scores[row])
                    if s > 0 and 0 <= int(d) < n_docs
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
        # Shard the fp32 corpus BEFORE quantizing: per-row absmax
        # quantization is row-local, so under the document sharding it runs
        # shard-parallel and no single chip ever holds the full fp32
        # matrix (the whole point of sharding at HBM-limiting sizes).
        doc_sharding = NamedSharding(mesh, P(DOC_AXIS, None))
        # device_put from host NumPy with a sharding transfers shard-by-
        # shard — no single-device staging of the fp32 matrix.
        emb_sharded = jax.device_put(emb, doc_sharding)
        values, scales = qz.quantize_symmetric(emb_sharded)
        # Padding rows quantize to zeros; force their scale to 0 so scores
        # are exactly 0 (they can still never beat real positive scores).
        scales = scales.at[n:].set(0.0)
        valid = np.arange(rows) < n
        self._docs = jax.device_put(values, doc_sharding)
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
        q = np.asarray(query_vectors, dtype=np.float32)
        nq = q.shape[0]
        # Pad the batch to a multiple of the query-DP axis — shard_map
        # rejects a query axis not divisible by it (zero rows are inert:
        # their top-k is dropped by the slice below).
        n_q = self.mesh.shape[QUERY_AXIS]
        pad = (-nq) % n_q
        if pad:
            q = np.pad(q, ((0, pad), (0, 0)))
        q = jax.device_put(q, self._qshard)
        # Clamp to the REAL doc count: with k > N the merge would have to
        # fill slots with -inf padding rows whose ids exceed len(doc_ids).
        s, i = self._search(q, k=min(top_k, len(self.doc_ids)))
        return np.asarray(s)[:nq], np.asarray(i)[:nq]
