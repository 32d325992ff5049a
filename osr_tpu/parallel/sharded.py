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

Option parity with the single-device engine (VERDICT r2 item 4): the
sharded sparse engine supports the Pallas head backend (the Mosaic
matmul+blockmax kernel runs per-shard inside shard_map), exact
block-pruned and approximate top-k modes, the insert-only query cache,
SPLADE ``search_weighted``, and the async pipelined ``search`` that
overlaps host tail work with device dispatches. The sharded dense engine
supports symmetric/asymmetric/none quantization and the Pallas int8
similarity backend.

Exactness: per-shard top-k + merge returns exactly the global top-k (each
true top-k doc lives on some shard, where it ranks within the local top-k);
the candidate channel is exact by construction. Verified against the
single-device engine in tests/test_sharded.py.
"""

from __future__ import annotations

import functools
import threading
from typing import Dict, List, Mapping, Optional, Sequence, Tuple

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
    encode_weighted_batch,
)
from osr_tpu.index.layout import _round_up
from osr_tpu.parallel.mesh import DOC_AXIS, QUERY_AXIS


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "head_terms", "k", "topk_mode", "head_backend", "interpret",
        "narrow_m",
    ),
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
    topk_mode: str = "exact",  # 'exact' | 'approx'
    head_backend: str = "xla",  # 'xla' | 'pallas'
    interpret: bool = False,  # Pallas interpret mode (CPU-mesh tests)
    narrow_m: int = 0,  # per-block top-m narrowing; 0 = full-width
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """The sharded device step in ONE program: per-shard head matmul
    (Mosaic kernel per shard on the Pallas backend), local top-k with
    global ids, all-gather merge over ICI, and the flat candidate
    head-score gather reassembled with a psum."""
    r_padded = head.shape[0]
    n_d = mesh.shape[DOC_AXIS]
    n_q = mesh.shape[QUERY_AXIS]
    b_total = q_head_ids.shape[0]
    b_local = b_total // n_q

    def local(qt, qwts, crows, ccols, head_l, scales, valid_l):
        rows_local = r_padded // n_d
        qhead = scatter_query_head(qt, qwts, head_terms=head_terms)
        kk = min(k, rows_local)
        use_prune = (
            topk_mode != "approx"
            and rows_local >= 4096
            and rows_local // 128 > 2 * kk
        )
        bmax = None
        if head_backend == "pallas":
            from osr_tpu.ops.pallas.head import (
                masked_head_scores,
                masked_head_scores_blockmax,
            )

            if use_prune:
                hs, bmax = masked_head_scores_blockmax(
                    head_l, scales, qhead, valid_l, interpret=interpret
                )
            elif head_l.dtype == jnp.uint8:
                # int4 without block pruning (small shards / approx):
                # the XLA decode path — masked_head_scores has no int4
                # kernel (see pallas/head.py).
                hs = head_scores(head_l, scales, qhead)
                hs = jnp.where(valid_l[None, :], hs, NEG_INF)
            else:
                hs = masked_head_scores(
                    head_l, scales, qhead, valid_l, interpret=interpret
                )
        else:
            hs = head_scores(head_l, scales, qhead)
            hs = jnp.where(valid_l[None, :], hs, NEG_INF)
        row_lo = lax.axis_index(DOC_AXIS) * rows_local
        col_lo = lax.axis_index(QUERY_AXIS) * b_local

        if topk_mode == "approx":
            s, idx = lax.approx_max_k(hs, kk, recall_target=0.95)
            idx = idx.astype(jnp.int32)
        elif use_prune:
            from osr_tpu.ops.topk import (
                block_topk_from_max,
                block_topk_narrow,
            )

            if bmax is None:
                # XLA backend: reduce the block maxima here (the Pallas
                # backend fuses this into the matmul kernel).
                pad = (-hs.shape[1]) % 128
                hp = (
                    jnp.pad(hs, ((0, 0), (0, pad)), constant_values=NEG_INF)
                    if pad
                    else hs
                )
                bmax = hp.reshape(hs.shape[0], -1, 128).max(axis=2)
            if narrow_m:
                # Bit-identical narrowed selection with compiled tie-safe
                # fallback (ops/topk.py:block_topk_narrow); local-only,
                # so the lax.cond stays clear of the collectives below.
                s, idx = block_topk_narrow(
                    hs, bmax, k=kk, block_m=narrow_m
                )
            else:
                s, idx = block_topk_from_max(hs, bmax, k=kk)
        else:
            s, idx = lax.top_k(hs, kk)  # (B_local, kk) local rows
            idx = idx.astype(jnp.int32)
        ids = idx + row_lo
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


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "head_terms", "k", "narrow_m", "interpret"),
)
def sharded_search_extract(
    q_head_ids: jax.Array,  # (B, Q) int32, sharded over q
    q_head_weights: jax.Array,  # (B, Q) float32, sharded over q
    head: jax.Array,  # (R_padded, F), sharded over d
    head_scales,  # (F,) f32 or None, replicated
    valid: jax.Array,  # (R_padded,) bool, sharded over d
    *,
    mesh: Mesh,
    head_terms: int,
    k: int,
    narrow_m: int = 8,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Extract-mode sharded step for the HOST-merge path: per-shard fused
    matmul + per-block top-m extraction (the local (B_local, R_local)
    score matrix never exists in HBM), exact local top-k from the
    (B, G, m) candidates, all-gather merge over ICI, and a pmax-combined
    tie-safety flag as a (B, 1) f32 column. Candidate head scores are
    computed host-side by the caller (postings.prepare_host_merge) —
    there is no score matrix left to gather from, which is the point.
    When the flag is nonzero the caller re-dispatches the standard
    :func:`sharded_search` program (exactness contract as in the flat
    engine's extract path — ops/bm25.py:fused_search_extract)."""
    r_padded = head.shape[0]
    n_d = mesh.shape[DOC_AXIS]

    def local(qt, qwts, head_l, scales, valid_l):
        from osr_tpu.ops.pallas.head import masked_head_blocktopm
        from osr_tpu.ops.topk import blocktopm_topk

        rows_local = r_padded // n_d
        qhead = scatter_query_head(qt, qwts, head_terms=head_terms)
        vals, rows = masked_head_blocktopm(
            head_l, scales, qhead, valid_l, m=narrow_m, interpret=interpret
        )
        kk = min(k, rows_local)
        top, top_rows, unsafe = blocktopm_topk(vals, rows, k=kk)
        ids = top_rows + lax.axis_index(DOC_AXIS) * rows_local
        s_all = lax.all_gather(top, DOC_AXIS, axis=1, tiled=True)
        i_all = lax.all_gather(ids, DOC_AXIS, axis=1, tiled=True)
        kk2 = min(k, s_all.shape[1])
        tops, pos = lax.top_k(s_all, kk2)
        tids = jnp.take_along_axis(i_all, pos, axis=1)
        flag = lax.pmax(
            unsafe.astype(jnp.float32), (DOC_AXIS, QUERY_AXIS)
        )
        return (
            tops,
            tids,
            jnp.broadcast_to(flag[None, None], (tops.shape[0], 1)),
        )

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(QUERY_AXIS, None),
            P(QUERY_AXIS, None),
            P(DOC_AXIS, None),
            P(),
            P(DOC_AXIS),
        ),
        out_specs=(
            P(QUERY_AXIS, None),
            P(QUERY_AXIS, None),
            P(QUERY_AXIS, None),
        ),
        check_vma=False,
    )(q_head_ids, q_head_weights, head, head_scales, valid)


class ShardedSparseSearchEngine:
    """Document-sharded, query-data-parallel BM25/TF-IDF search.

    Same host API and options as
    :class:`osr_tpu.retrieval.engine.SparseSearchEngine` — topk_mode,
    head_backend, query cache, ``search_weighted``, pipelined ``search`` —
    but the dense head lives sharded across every chip of ``mesh``; the
    postings tail stays host-resident (it is scored on the host either
    way).
    """

    def __init__(
        self,
        index: SparseIndex,
        mesh: Mesh,
        batch_sizes: Sequence[int] = (8, 32, 128, 256, 512),
        topk_mode: str = "exact",  # 'approx' uses lax.approx_max_k
        head_backend: str = "auto",  # 'xla' | 'pallas' | 'auto'
        cache_queries: bool = True,
        query_cache_limit: int = 1000,
        pallas_interpret: bool = False,  # CPU-mesh tests of the kernels
        narrow_m: int = 0,  # per-block top-m narrowing; 0 = full-width
        narrow_backend: str = "xla",  # 'extract' = Mosaic top-m kernel
    ):
        from osr_tpu.utils.compile_cache import enable_persistent_cache

        enable_persistent_cache()
        self.index = index
        self.mesh = mesh
        self.narrow_m = int(narrow_m)
        if narrow_backend not in ("xla", "extract"):
            raise ValueError(f"Unknown narrow_backend: {narrow_backend}")
        self.narrow_backend = narrow_backend
        self.n_q = mesh.shape[QUERY_AXIS]
        n_d = mesh.shape[DOC_AXIS]
        self.batch_sizes = tuple(
            _round_up(b, self.n_q) for b in sorted(batch_sizes)
        )
        if topk_mode not in ("exact", "approx"):
            raise ValueError(f"Unknown topk_mode: {topk_mode}")
        self.topk_mode = topk_mode
        layout = index.layout
        dev0 = mesh.devices.flat[0]
        pallas_ok_dtype = layout.head_dtype == "int8" or (
            layout.head_dtype == "int4"
            and layout.head.shape[1] % 128 == 0
        )
        if pallas_ok_dtype:
            # Same VMEM-width guard as the flat engine: very wide heads
            # (F ≳ 5600) overflow even the smallest query tile — route
            # them to XLA rather than raising inside shard_map tracing.
            from osr_tpu.ops.pallas.head import head_tile_fits

            pallas_ok_dtype = head_tile_fits(128, layout.head_terms)
        if head_backend == "auto":
            # Same policy as the single-device engine, per SHARD: the
            # Mosaic kernel applies on real TPUs with an int8/int4 head
            # and a local shard big enough that tile padding doesn't
            # dominate.
            head_backend = (
                "pallas"
                if (
                    pallas_ok_dtype
                    and getattr(dev0, "platform", "") == "tpu"
                    and layout.num_rows // n_d >= 4096
                )
                else "xla"
            )
        if head_backend == "pallas" and not pallas_ok_dtype:
            raise ValueError(
                "head_backend='pallas' requires an int8 or (aligned) "
                "int4 head whose width fits the kernel's VMEM budget "
                f"(head_terms={layout.head_terms}; see pallas/head.py:"
                "head_tile_fits)"
            )
        if head_backend not in ("xla", "pallas"):
            raise ValueError(f"Unknown head_backend: {head_backend}")
        self.head_backend = head_backend
        self.pallas_interpret = pallas_interpret
        self.tokenizer = Tokenizer(index.vocabulary)
        self.encoder = QueryEncoder(self.tokenizer)
        r = layout.num_rows
        if head_backend == "pallas":
            from osr_tpu.ops.pallas.head import TILE_R_BM

            # Tile-align every LOCAL shard so the Mosaic kernel never
            # pads (a pad inside the jitted step copies the whole shard).
            self.r_padded = _round_up(r, n_d * TILE_R_BM)
        else:
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
        self._query_cache: Optional[
            Dict[Tuple[str, int], Tuple[np.ndarray, np.ndarray]]
        ] = ({} if cache_queries else None)
        self._cache_limit = query_cache_limit
        self._cache_lock = threading.RLock()
        # Extract mode computes candidate head scores HOST-side (there is
        # no device score matrix to gather from); prepare the shared
        # host-merge state only when that mode can actually engage.
        self._host_merge = None
        if self.narrow_backend == "extract" and self.narrow_m > 0:
            from osr_tpu.index.postings import prepare_host_merge

            self._host_merge = prepare_host_merge(layout, want_head_t=True)

    def _use_extract(self, top_k: int) -> bool:
        """Same applicability rule as the flat engine's extract path,
        evaluated on the LOCAL shard size."""
        if not (
            self.narrow_backend == "extract"
            and self.narrow_m > 0
            and self.topk_mode == "exact"
            and self.head_backend == "pallas"
        ):
            return False
        rows_local = self.r_padded // self.mesh.shape[DOC_AXIS]
        kk = min(top_k, rows_local)
        return rows_local >= 4096 and rows_local // 128 > 2 * kk

    def encode_queries(self, texts: Sequence[str]) -> EncodedBatch:
        from osr_tpu.retrieval.encoding import pick_batch_size

        return encode_query_batch(
            self.encoder,
            texts,
            pick_batch_size(self.batch_sizes, len(texts)),
            self.index.layout.head_terms,
        )

    # ------------------------------------------------------------------
    # Async device path (mirrors SparseSearchEngine's split)
    # ------------------------------------------------------------------

    def search_encoded_device(self, enc: EncodedBatch, top_k: int):
        """Dispatch the sharded device step; returns an in-flight handle
        for :meth:`finish_batch` (device results are NOT fetched here, so
        host work on later batches overlaps device/ICI work)."""
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
        q_ids = jax.device_put(enc.head_ids, self._qshard)
        q_wts = jax.device_put(enc.head_weights, self._qshard)
        if self._use_extract(top_k):
            from osr_tpu.index.postings import (
                cand_head_scores_host,
                merge_tau_slack,
            )

            out = sharded_search_extract(
                q_ids,
                q_wts,
                self._head,
                self._scales,
                self._valid,
                mesh=self.mesh,
                head_terms=layout.head_terms,
                k=top_k,
                narrow_m=self.narrow_m,
                interpret=self.pallas_interpret,
            )
            host_head, host_dtype, head_t, slack = self._host_merge
            cand_head = cand_head_scores_host(
                host_head,
                host_dtype,
                layout.head_scales,
                cand,
                enc.head_flat_ids,
                enc.head_flat_counts,
                enc.head_ptr,
                head_t=head_t,
            )
            tau_slack = merge_tau_slack(
                slack,
                enc.head_flat_ids,
                enc.head_flat_counts,
                enc.head_ptr,
            )
            # q arrays ride in the handle for the rare tie-unsafe
            # fallback re-dispatch of the standard program.
            from osr_tpu.retrieval.engine import _prefetch

            for arr in out:  # (tops, tids, flag): stream D2H at dispatch
                _prefetch(arr)
            return cand, ("extract", out, q_ids, q_wts), cand_head, tau_slack
        out = sharded_search(
            q_ids,
            q_wts,
            jax.device_put(cand.rows, self._repl),
            jax.device_put(cand.cols, self._repl),
            self._head,
            self._scales,
            self._valid,
            mesh=self.mesh,
            head_terms=layout.head_terms,
            k=top_k,
            topk_mode=self.topk_mode,
            head_backend=self.head_backend,
            interpret=self.pallas_interpret,
            narrow_m=self.narrow_m,
        )
        from osr_tpu.retrieval.engine import _prefetch

        for arr in out:  # (head_s, head_r, cand_head)
            _prefetch(arr)
        return cand, out, None, None

    def finish_batch(
        self, in_flight, top_k: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        cand, out, cand_head_host, tau_slack = in_flight
        if isinstance(out, tuple) and out[0] == "extract":
            _, (tops, tids, flag), q_ids, q_wts = out
            if float(np.asarray(flag)[0, 0]) != 0.0:
                # Tie-safety flag (rare): some shard's narrowed candidate
                # set could miss a true top-k member — re-dispatch the
                # standard full-width sharded program for this batch.
                head_s, head_r, cand_head = sharded_search(
                    q_ids,
                    q_wts,
                    jax.device_put(cand.rows, self._repl),
                    jax.device_put(cand.cols, self._repl),
                    self._head,
                    self._scales,
                    self._valid,
                    mesh=self.mesh,
                    head_terms=self.index.layout.head_terms,
                    k=top_k,
                    topk_mode=self.topk_mode,
                    head_backend=self.head_backend,
                    interpret=self.pallas_interpret,
                    narrow_m=0,
                )
                head_s = np.asarray(head_s)
                return merge_host(
                    head_s,
                    np.asarray(head_r),
                    cand,
                    np.asarray(cand_head),
                    self.index.layout.num_rows,
                    top_k,
                    tau_slack=np.zeros(head_s.shape[0], dtype=np.float32),
                )
            head_s = np.asarray(tops)
            return merge_host(
                head_s,
                np.asarray(tids),
                cand,
                cand_head_host,
                self.index.layout.num_rows,
                top_k,
                # Host-computed candidate head scores: the sound per-query
                # rounding bound applies (postings.merge_tau_slack).
                tau_slack=tau_slack,
            )
        head_s, head_r, cand_head = out
        head_s = np.asarray(head_s)
        return merge_host(
            head_s,
            np.asarray(head_r),
            cand,
            np.asarray(cand_head),
            self.index.layout.num_rows,
            top_k,
            # cand_head is gathered from the same device score matrix as
            # head_s (no host/device discrepancy) — zero slack is sound.
            tau_slack=np.zeros(head_s.shape[0], dtype=np.float32),
        )

    def search_token_batch(
        self, texts: Sequence[str], top_k: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        enc = self.encode_queries(texts)
        return self.finish_batch(
            self.search_encoded_device(enc, top_k), top_k
        )

    def search(
        self, queries: Mapping[str, str], top_k: int = 10
    ) -> Dict[str, Dict[str, float]]:
        """Reference-compatible {qid: {doc_id: score}} search with the
        same pipelining and query-cache semantics as the single-device
        engine (reference retrieval.py:287-289 cache contract)."""
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

        from osr_tpu.retrieval.pipeline_util import run_pipelined

        done: List = []
        run_pipelined(
            pending,
            self.batch_sizes[-1],
            lambda chunk: self.search_encoded_device(
                self.encode_queries([t for _, t in chunk]), top_k
            ),
            lambda chunk, handle: done.append(
                (chunk, *self.finish_batch(handle, top_k))
            ),
        )

        for chunk, scores, ids in done:
            ids_l = ids.tolist()
            scores_l = scores.tolist()
            for row, (qid, text) in enumerate(chunk):
                if self._query_cache is not None:
                    with self._cache_lock:
                        if len(self._query_cache) < self._cache_limit:
                            self._query_cache[(text, top_k)] = (
                                ids[row],
                                scores[row],
                            )
                results[qid] = self._rows_to_result(
                    ids_l[row], scores_l[row]
                )
        return results

    def search_weighted(
        self,
        queries: Mapping[str, Mapping[str, float]],
        top_k: int = 10,
    ) -> Dict[str, Dict[str, float]]:
        """Learned-sparse (SPLADE) search over the sharded index: queries
        are {term: weight} mappings used verbatim. Same contract as the
        single-device engine's search_weighted."""
        from osr_tpu.retrieval.encoding import pick_batch_size

        results: Dict[str, Dict[str, float]] = {}
        qids = [q for q, vec in queries.items() if vec]
        for q, vec in queries.items():
            if not vec:
                results[q] = {}
        max_b = self.batch_sizes[-1]
        for i in range(0, len(qids), max_b):
            chunk = qids[i : i + max_b]
            enc = encode_weighted_batch(
                self.index.vocabulary,
                [queries[q] for q in chunk],
                pick_batch_size(self.batch_sizes, len(chunk)),
                self.index.layout.head_terms,
            )
            scores, ids = self.finish_batch(
                self.search_encoded_device(enc, top_k), top_k
            )
            for row, qid in enumerate(chunk):
                results[qid] = self._to_result(ids[row], scores[row])
        return results

    def _to_result(self, ids, scores) -> Dict[str, float]:
        return self._rows_to_result(ids.tolist(), scores.tolist())

    def _rows_to_result(self, ids, scores) -> Dict[str, float]:
        doc_ids = self.index.doc_ids
        n = len(doc_ids)
        return {
            doc_ids[i]: s
            for i, s in zip(ids, scores)
            if s > 0 and 0 <= i < n
        }

    def clear_cache(self) -> None:
        if self._query_cache is not None:
            with self._cache_lock:
                self._query_cache.clear()


class ShardedDenseSearchEngine:
    """Document-sharded INT8/fp32 dense retrieval: each chip scores its
    embedding shard on the MXU; candidates merge via all_gather over ICI.

    Option parity with :class:`DenseSearchEngine`: symmetric/asymmetric/
    int4/none quantization and the fused Pallas int8/int4 similarity
    backends."""

    def __init__(
        self,
        doc_ids: Sequence[str],
        embeddings: np.ndarray,
        mesh: Mesh,
        quantization: str = "symmetric",  # | 'asymmetric' | 'int4' | 'none'
        backend: str = "xla",  # 'pallas' = fused Mosaic int8/int4 similarity
        pallas_interpret: bool = False,
    ):
        from osr_tpu.ops import quantize as qz
        from osr_tpu.utils.compile_cache import enable_persistent_cache

        enable_persistent_cache()
        if quantization not in ("symmetric", "asymmetric", "int4", "none"):
            raise ValueError(f"Unknown quantization: {quantization}")
        if backend not in ("xla", "pallas"):
            raise ValueError(f"Unknown backend: {backend}")
        if backend == "pallas" and quantization not in ("symmetric", "int4"):
            raise ValueError(
                "backend='pallas' requires symmetric or int4 quantization"
            )
        if (
            backend == "pallas"
            and quantization == "int4"
            and (embeddings.shape[1] // 2) % 128
        ):
            raise ValueError(
                "pallas int4 needs a lane-aligned packed width: dim/2 must "
                f"be a multiple of 128 (dim={embeddings.shape[1]}); use "
                "backend='xla'"
            )
        self.doc_ids = list(doc_ids)
        self.mesh = mesh
        self.quantization = quantization
        self.backend = backend
        self.pallas_interpret = pallas_interpret
        n_d = mesh.shape[DOC_AXIS]
        n = embeddings.shape[0]
        # Pallas tiles at 128 rows per shard; align local shards.
        row_mult = n_d * (128 if backend == "pallas" else 1)
        rows = _round_up(n, row_mult)
        emb = np.pad(embeddings.astype(np.float32), ((0, rows - n), (0, 0)))
        # Shard the fp32 corpus BEFORE quantizing: per-row quantization is
        # row-local, so under the document sharding it runs shard-parallel
        # and no single chip ever holds the full fp32 matrix (the whole
        # point of sharding at HBM-limiting sizes).
        doc_sharding = NamedSharding(mesh, P(DOC_AXIS, None))
        vec_sharding = NamedSharding(mesh, P(DOC_AXIS))
        emb_sharded = jax.device_put(emb, doc_sharding)
        self._mins = None
        if quantization == "symmetric":
            values, scales = qz.quantize_symmetric(emb_sharded)
            # Padding rows quantize to zeros; force their scale to 0 so
            # scores are exactly 0 (never beat real positive scores).
            scales = scales.at[n:].set(0.0)
            self._docs = jax.device_put(values, doc_sharding)
            self._scales = jax.device_put(scales, vec_sharding)
        elif quantization == "int4":
            # Per-row nibble packing is row-local, so it shards exactly
            # like symmetric int8 — each chip holds D/2 bytes per row.
            values, scales = qz.quantize_symmetric_int4(emb_sharded)
            scales = scales.at[n:].set(0.0)
            self._docs = jax.device_put(values, doc_sharding)
            self._scales = jax.device_put(scales, vec_sharding)
        elif quantization == "asymmetric":
            values, scales, mins = qz.quantize_asymmetric(emb_sharded)
            scales = scales.at[n:].set(0.0)
            mins = mins.at[n:].set(0.0)
            self._docs = jax.device_put(values, doc_sharding)
            self._scales = jax.device_put(scales, vec_sharding)
            self._mins = jax.device_put(mins, vec_sharding)
        else:
            self._docs = emb_sharded
            self._scales = None
        valid = np.arange(rows) < n
        self._valid = jax.device_put(valid, vec_sharding)
        self._qshard = NamedSharding(mesh, P(QUERY_AXIS, None))
        self.n_rows = rows

    @functools.partial(jax.jit, static_argnames=("self", "k"))
    def _search(self, queries: jax.Array, *, k: int):
        from osr_tpu.ops import quantize as qz

        mesh = self.mesh
        n_d = mesh.shape[DOC_AXIS]
        rows_local = self.n_rows // n_d
        quantization = self.quantization
        backend = self.backend
        interpret = self.pallas_interpret
        dim = queries.shape[1]

        def local(q, docs, scales, mins, valid):
            if quantization in ("symmetric", "int4"):
                q_int8, q_scales = qz.quantize_symmetric(q)
                if backend == "pallas":
                    from osr_tpu.ops.pallas.matmul import (
                        int4_similarity_pallas,
                        int8_similarity_pallas,
                    )

                    b = q_int8.shape[0]
                    pad_b = (-b) % 128
                    if pad_b:
                        q_int8 = jnp.pad(q_int8, ((0, pad_b), (0, 0)))
                        q_scales = jnp.pad(q_scales, (0, pad_b))
                    sim_fn = (
                        int4_similarity_pallas
                        if quantization == "int4"
                        else int8_similarity_pallas
                    )
                    sims = sim_fn(
                        q_int8, docs, q_scales, scales,
                        interpret=interpret,
                    )[:b]
                else:
                    d_int8 = (
                        qz.unpack_int4_signed(docs)
                        if quantization == "int4"
                        else docs
                    )
                    sims = qz.int8_dot_product_batch(
                        q_int8, d_int8, q_scales, scales
                    )
            elif quantization == "asymmetric":
                # q.d expansion over per-vector affine dequant — see
                # ops/quantize.py:int8_search_asymmetric; doc-side terms
                # are shard-local so the expansion shards cleanly.
                uq, qs, qm = qz.quantize_asymmetric(q)
                acc = lax.dot_general(
                    uq.astype(jnp.int32),
                    docs.astype(jnp.int32),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32)
                sum_uq = jnp.sum(uq.astype(jnp.float32), axis=-1)
                sum_ud = jnp.sum(docs.astype(jnp.float32), axis=-1)
                sims = (
                    acc * qs[:, None] * scales[None, :]
                    + (qs * sum_uq)[:, None] * mins[None, :]
                    + qm[:, None] * (scales * sum_ud)[None, :]
                    + dim * qm[:, None] * mins[None, :]
                )
            else:
                sims = lax.dot_general(
                    q,
                    docs,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            sims = jnp.where(valid[None, :], sims, NEG_INF)
            kk = min(k, rows_local)
            # Local selection via the block-max-pruned exact path for wide
            # shards (same crossover as ops/quantize.py:_select_topk).
            s, idx = qz._select_topk(sims, kk)
            base = lax.axis_index(DOC_AXIS) * rows_local
            ids = idx + base
            s_all = lax.all_gather(s, DOC_AXIS, axis=1, tiled=True)
            i_all = lax.all_gather(ids, DOC_AXIS, axis=1, tiled=True)
            kk2 = min(k, s_all.shape[1])
            top, pos = lax.top_k(s_all, kk2)
            return top, jnp.take_along_axis(i_all, pos, axis=-1)

        scales_spec = P() if self._scales is None else P(DOC_AXIS)
        mins_spec = P() if self._mins is None else P(DOC_AXIS)
        return shard_map(
            local,
            mesh=mesh,
            in_specs=(
                P(QUERY_AXIS, None),
                P(DOC_AXIS, None),
                scales_spec,
                mins_spec,
                P(DOC_AXIS),
            ),
            out_specs=(P(QUERY_AXIS, None), P(QUERY_AXIS, None)),
            check_vma=False,
        )(
            queries,
            self._docs,
            (
                self._scales
                if self._scales is not None
                else jnp.zeros(1, jnp.float32)
            ),
            (
                self._mins
                if self._mins is not None
                else jnp.zeros(1, jnp.float32)
            ),
            self._valid,
        )

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


class ShardedHybridEngine:
    """Sharded weighted late fusion — the multi-chip form of the flat
    ``HybridRetriever`` (reference ms_marco hybrid experiment, reference
    rag_system/configs/ms_marco_paper_results.yaml: sparse 0.3 + dense
    0.7). Both sharded engines score the same document sharding; fusion
    runs on their (scores, ids) arrays host-side
    (osr_tpu/retrieval/fusion.py) after the sparse dispatch and the dense
    device step have been in flight together."""

    def __init__(
        self,
        index: SparseIndex,
        embeddings: np.ndarray,
        mesh: Mesh,
        sparse_weight: float = 0.3,
        dense_weight: float = 0.7,
        fusion_depth: int = 100,
        fusion: str = "weighted",
        rrf_k: float = 60.0,
        query_embedding_fn=None,
        batch_sizes: Sequence[int] = (8, 32, 128, 256, 512),
        quantization: str = "symmetric",
        head_backend: str = "auto",
        dense_backend: str = "xla",
        pallas_interpret: bool = False,
    ):
        if fusion not in ("weighted", "rrf"):
            raise ValueError(f"unknown fusion mode: {fusion!r}")
        self.sparse_weight = sparse_weight
        self.dense_weight = dense_weight
        self.fusion_depth = fusion_depth
        self.fusion = fusion
        self.rrf_k = rrf_k
        self.sparse = ShardedSparseSearchEngine(
            index,
            mesh,
            batch_sizes=batch_sizes,
            head_backend=head_backend,
            cache_queries=False,
            pallas_interpret=pallas_interpret,
        )
        self.dense = ShardedDenseSearchEngine(
            index.doc_ids,
            embeddings,
            mesh,
            quantization=quantization,
            backend=dense_backend,
            pallas_interpret=pallas_interpret,
        )
        dim = embeddings.shape[1]
        if query_embedding_fn is not None:
            self._embed_batch = lambda texts: np.stack(
                [
                    np.asarray(query_embedding_fn(t), dtype=np.float32)
                    for t in texts
                ]
            )
        else:
            from osr_tpu.index.dense import synthetic_query_embeddings

            self._embed_batch = lambda texts: synthetic_query_embeddings(
                texts, dim
            )

    def search(
        self, queries: Mapping[str, str], top_k: int = 10
    ) -> Dict[str, Dict[str, float]]:
        from osr_tpu.retrieval.fusion import (
            fuse_topk_arrays,
            fused_rows_to_results,
        )

        sp = self.sparse
        results: Dict[str, Dict[str, float]] = {}
        pending: List[Tuple[str, str]] = []
        for qid, text in queries.items():
            text = (text or "").strip()
            if text:
                pending.append((qid, text))
            else:
                results[qid] = {}

        from osr_tpu.retrieval.results import as_object_names

        # O(N) object-array build once per ENGINE, not per batch.
        doc_ids = getattr(self, "_doc_names", None)
        if doc_ids is None or len(doc_ids) != len(sp.index.doc_ids):
            doc_ids = self._doc_names = as_object_names(
                sp.index.doc_ids
            )
        depth = self.fusion_depth
        max_b = sp.batch_sizes[-1]
        for i in range(0, len(pending), max_b):
            chunk = pending[i : i + max_b]
            texts = [t for _, t in chunk]
            # Sparse first (async dispatch + host tail work), then the
            # dense step rides the mesh while the sparse merge finishes.
            enc = sp.encode_queries(texts)
            s_handle = sp.search_encoded_device(enc, depth)
            vecs = self._embed_batch(texts)
            d_scores, d_ids = self.dense.search_vectors(vecs, top_k=depth)
            s_scores, s_ids = sp.finish_batch(s_handle, depth)
            n = len(chunk)  # sparse rows are padded to the batch bucket
            f_sc, f_ids = fuse_topk_arrays(
                s_scores[:n],
                s_ids[:n],
                d_scores,
                d_ids,
                self.sparse_weight,
                self.dense_weight,
                top_k,
                mode=self.fusion,
                rrf_k=self.rrf_k,
            )
            results.update(
                fused_rows_to_results(
                    [q for q, _ in chunk], f_sc, f_ids, doc_ids
                )
            )
        return results
