"""The retrieval engine — the single scoring path of the framework.

The reference implements its engine three times (reference
rag_system/core/retrieval.py, rag_system/core/retriever_registry.py,
rag_system/pipeline/evaluate_rag_pipeline.py — see SURVEY.md §0.3); this is
the one implementation everything here uses.

Host/device split (see osr_tpu/index/layout.py for the why):

- host: tokenization, query batching/padding, TAIL scoring (term-major
  postings walk over the query's rare terms — osr_tpu/index/postings.py),
  result-dict assembly, the query cache (reference retrieval.py:287-289
  semantics: capped insert-only cache keyed on (query text, top_k)).
- device: the dense-head MXU matmul, exact block-pruned top-k and the
  candidate merge — ONE jit dispatch (osr_tpu/ops/bm25.py:fused_search),
  with batches pipelined asynchronously so host tail work overlaps device
  head work across batches.

Batches are padded to a small fixed menu of sizes so the jitted step
compiles once per batch-size and is reused for the lifetime of the engine.
"""

from __future__ import annotations

import functools
import logging
import threading
from typing import Dict, List, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from osr_tpu.index.builder import SparseIndex
from osr_tpu.index.postings import (
    FlatCandidates,
    cand_head_scores_host,
    dense_tail_scores,
    filter_candidates_by_tau,
    merge_host,
    merge_tau_slack,
    prepare_host_merge,
    tail_candidates_flat,
)
from osr_tpu.index.tokenizer import Tokenizer
from osr_tpu.retrieval.encoding import (
    EncodedBatch,
    QueryEncoder,
    encode_query_batch,
)
from osr_tpu.ops.bm25 import (
    dense_head_scores,
    fused_search_packed,
    pack_query_batch,
    unpack_topk,
)

logger = logging.getLogger(__name__)


def _prefetch(arr) -> None:
    """Enqueue an async device->host copy of a result array at DISPATCH
    time. The copy is queued behind the program that produces ``arr``, so
    the tunnel streams the result back while the host works on other
    batches; by collect time ``np.asarray`` finds the bytes already local
    (measured on the v5e tunnel: a ready 2.7 MB packed fetch drops from
    ~95 ms blocking to ~0.2 ms — tools/profile_hybrid.py r5 notes).
    Safe no-op on backends without the API."""
    try:
        arr.copy_to_host_async()
    except (AttributeError, NotImplementedError):  # pragma: no cover
        pass


# The 256/512 buckets matter on remote-TPU links: a fixed ~30 ms per
# transfer means a 512-query workload pays 1 round trip instead of 4.
# The 256 step bounds padded device work at 2x for any workload size
# (129 queries pad to 256, not 512 — the head matmul scales with padded
# B, which dominates at 1M+ docs where a pass far exceeds the 30 ms
# round trip). Each bucket compiles once per machine (persistent cache).
DEFAULT_BATCH_SIZES = (8, 32, 128, 256, 512)


# Auto row-chunking engages when the (B_max, R) f32 score matrix would
# exceed this budget: per-chunk score buffers are freed between dispatches,
# so HBM peak = head + ONE chunk of scores instead of head + B x R
# (the 1M-doc B=2048 OOM in DEVELOPMENT.md's capacity model). 6 GiB keeps
# every case that fits 16 GB HBM un-chunked (per-chunk top-k repeats the
# selection work, measured ~-15% QPS per extra chunk at 1M docs) while
# still splitting the 8 GB B=2048 x 1M case into two.
SCORE_BUDGET_BYTES = 6 << 30

# Total device-HBM budget for head + one transient score chunk. v5e
# advertises 16 GB; the measured usable window on this host's tunnel
# runtime sits between 11.0 GiB (5M-doc F=2048 run, fits) and 13.6 GiB
# (5M-doc F=4096 int4 head 9.54 GiB + 4.1 GiB chunk, RESOURCE_EXHAUSTED
# — bench_results/tpu_evidence_scale5m.log). 12 GiB is the safe side of
# that bracket; the auto-chunker shrinks chunks so head + chunk stays
# under it, instead of applying the fixed 6 GiB score budget that only
# models the score matrix and OOMs once the head itself is huge.
HBM_SEARCH_BUDGET_BYTES = 12 << 30


class _DeviceIndex:
    """Device-resident arrays of a :class:`HybridLayout` (head side only —
    postings stay host-resident by design).

    ``row_align`` > 1 pads the head rows (and valid mask) ONCE at upload —
    the Pallas kernels need tile-aligned R, and padding inside the jitted
    search step would copy the full head matrix every batch.

    ``chunk_rows`` splits the head into row chunks uploaded as separate
    arrays (each padded to ``row_align``); the engine then runs the fused
    search per chunk and merges on device, bounding the transient score
    matrix to (B, chunk_rows). All chunks share one shape, so the chunked
    program compiles ONCE and is reused for every chunk."""

    def __init__(self, layout, device, row_align: int = 1, chunk_rows=None):
        put = lambda a: jax.device_put(a, device)
        head, valid = layout.head, layout.valid
        self.head_scales = (
            put(layout.head_scales) if layout.head_scales is not None else None
        )
        # Cached so the host-merge path never re-uploads an empty buffer
        # (every transfer through a remote-TPU tunnel has a fixed cost).
        self.empty_i32 = put(np.zeros(0, dtype=np.int32))
        self.chunks = None
        self.chunk_bases = None
        if chunk_rows and head.shape[0] > chunk_rows:
            if head.shape[0] >= (1 << 24):
                # Chunk bases (and the packed top-k rows they offset) ride
                # in f32 — exact only below 2^24 rows. Fail loudly rather
                # than silently corrupting row ids past 16.7M docs; above
                # that, shard the corpus (parallel/sharded.py).
                raise ValueError(
                    f"chunked scoring packs row ids as f32 and supports "
                    f"< 2^24 rows per chip (got {head.shape[0]}); shard "
                    "the corpus across devices instead"
                )
            cr = max(int(chunk_rows), row_align)
            cr += (-cr) % max(row_align, 1)
            n_chunks = -(-head.shape[0] // cr)
            # Equalize chunk sizes: every chunk is padded to ``cr`` for
            # the shared compile shape, so a short tail chunk would
            # waste (cr - tail) head rows of HBM — at 1M docs, F=4096,
            # chunks of 786k the waste alone OOMed the chip.
            cr = -(-head.shape[0] // n_chunks)
            cr += (-cr) % max(row_align, 1)
            chunks = []
            bases = np.zeros(n_chunks, dtype=np.float32)
            for ci in range(n_chunks):
                lo = ci * cr
                h = head[lo : lo + cr]
                v = valid[lo : lo + cr]
                pad = cr - h.shape[0]
                if pad:
                    h = np.pad(h, ((0, pad), (0, 0)))
                    v = np.pad(v, (0, pad))
                chunks.append((put(h), put(v)))
                bases[ci] = lo  # exact as f32 below 2^24 rows
            self.chunks = chunks
            self.chunk_bases = put(bases)
            self.head = None
            self.valid = None
            return
        pad_r = (-head.shape[0]) % row_align
        if pad_r:
            head = np.pad(head, ((0, pad_r), (0, 0)))
            valid = np.pad(valid, (0, pad_r))
        self.head = put(head)
        self.valid = put(valid)


class SparseSearchEngine:
    """Batched BM25/TF-IDF search over a :class:`SparseIndex` on TPU."""

    def __init__(
        self,
        index: SparseIndex,
        device=None,
        batch_sizes: Sequence[int] = DEFAULT_BATCH_SIZES,
        cache_queries: bool = True,
        query_cache_limit: int = 1000,
        topk_mode: str = "exact",  # 'approx' uses lax.approx_max_k (r=0.95)
        merge_backend: str = "auto",  # 'host' | 'device' | 'auto'
        head_backend: str = "auto",  # 'xla' | 'pallas' | 'auto'
        score_chunk_rows=None,  # None = auto by SCORE_BUDGET_BYTES; 0 = off
        narrow_m: int = 0,  # per-block top-m narrowing; 0 = full-width
        narrow_backend: str = "xla",  # 'extract' = Mosaic top-m kernel
        cand_filter_per_query: int = 2048,  # defer+filter threshold; 0 = off
    ):
        from osr_tpu.utils.compile_cache import enable_persistent_cache

        enable_persistent_cache()
        self.index = index
        self.device = device if device is not None else jax.devices()[0]
        self.batch_sizes = tuple(sorted(batch_sizes))
        if topk_mode not in ("exact", "approx"):
            # Round 1's 'fast' mode was folded into 'exact' (the
            # block-pruned selection made exact as fast); reject unknown
            # strings rather than silently running a different mode.
            raise ValueError(f"Unknown topk_mode: {topk_mode}")
        self.topk_mode = topk_mode
        # Exact-selection narrowing (ops/topk.py:block_topk_narrow): select
        # each pruned block's top-m before the final top-k so the final
        # sort covers k*m instead of k*128 candidates; a compiled tie-safe
        # fallback keeps the result bit-identical. 0 disables. The default
        # stays full-width until the TPU measurement
        # (tools/profile_narrow.py) lands; flip if it wins there.
        self.narrow_m = int(narrow_m)
        # 'extract': the Mosaic per-block top-m extraction kernel
        # (ops/pallas/head.py:masked_head_blocktopm) — the (B, R) score
        # matrix never reaches HBM; applies on the host-merge,
        # non-chunked, exact, Pallas path with narrow_m > 0, else the
        # engine silently uses the standard program. Unsafe batches
        # (tie-safety flag) re-dispatch the standard program host-side.
        if narrow_backend not in ("xla", "extract"):
            raise ValueError(f"Unknown narrow_backend: {narrow_backend}")
        self.narrow_backend = narrow_backend
        # Candidate tail-filter gate (postings.py:filter_candidates_by_tau):
        # above this mean candidates/query the host-merge path defers the
        # candidate head-dot to collect time and filters first — at 10M
        # docs ~90% of candidates provably cannot reach the final top-k.
        # Below it (FiQA-scale: ~500/query), the dispatch-time head-dot
        # overlaps the device step and filtering would buy nothing.
        self.cand_filter_per_query = int(cand_filter_per_query)
        layout0 = index.layout
        if layout0.num_rows >= (1 << 24):
            # The packed top-k result carries row ids as f32 VALUES
            # (ops/bm25.py:fused_search_packed) — exact only below 2^24.
            raise ValueError(
                f"single-chip engine supports < 2^24 docs (got "
                f"{layout0.num_rows}); shard the corpus across devices "
                "(parallel/sharded.py)"
            )
        pallas_ok_dtype = layout0.head_dtype == "int8" or (
            layout0.head_dtype == "int4"
            # int4 Pallas needs a lane-aligned packed width (the packed
            # layout can't be padded post-hoc; see pallas/head.py).
            and layout0.head.shape[1] % 128 == 0
        )
        if pallas_ok_dtype:
            # The Mosaic kernel's VMEM model rejects very wide heads
            # (F ≳ 5600 overflows even the smallest query tile) — the
            # auto path must know to route those to XLA.
            from osr_tpu.ops.pallas.head import head_tile_fits

            pallas_ok_dtype = head_tile_fits(128, layout0.head_terms)
        if head_backend == "auto":
            # The Mosaic kernel runs at parity with the XLA chain and
            # produces identical results (tests/test_pallas_kernels.py;
            # measured on v5e) while owning the matmul+block-max fusion
            # instead of relying on XLA's heuristics — prefer it wherever
            # it applies (real TPU, int8/int4 head). CPU test runs fall
            # back to XLA (Mosaic has no CPU target; interpret is
            # test-only).
            head_backend = (
                "pallas"
                if (
                    pallas_ok_dtype
                    and getattr(self.device, "platform", "") == "tpu"
                    # Tiny corpora: tile padding would dominate and XLA
                    # compiles such shapes instantly — not worth a Mosaic
                    # compile of a one-off odd shape.
                    and index.layout.num_rows >= 4096
                )
                else "xla"
            )
        if head_backend == "pallas" and not pallas_ok_dtype:
            raise ValueError(
                "head_backend='pallas' requires an int8 or (aligned) "
                "int4 head whose width fits the kernel's VMEM budget "
                f"(head_terms={layout0.head_terms}; see pallas/head.py:"
                "head_tile_fits)"
            )
        if head_backend not in ("xla", "pallas"):
            raise ValueError(f"Unknown head_backend: {head_backend}")
        self.head_backend = head_backend
        self.tokenizer = Tokenizer(index.vocabulary)
        self.encoder = QueryEncoder(self.tokenizer)
        if merge_backend == "auto":
            # Host merge needs the C++ runtime to be fast; without it the
            # device-side flat gather is the better (and tested) fallback.
            try:
                import osr_tpu.native  # noqa: F401

                merge_backend = "host"
            except ImportError:
                merge_backend = "device"
        if merge_backend not in ("host", "device"):
            raise ValueError(f"Unknown merge_backend: {merge_backend}")
        self.merge_backend = merge_backend
        if head_backend == "pallas":
            from osr_tpu.ops.pallas.head import TILE_R_BM

            row_align = TILE_R_BM  # TILE_R (256) divides TILE_R_BM (1024)
        else:
            row_align = 1
        head_bytes = index.layout.head.nbytes
        max_b = self.batch_sizes[-1]
        # Transient bytes per chunk ROW: the (B, Rc) f32 score slab, plus
        # — on the XLA int4 fallback only — the (Rc, F) bf16 unpacked
        # head copy that ops/bm25.py:head_scores materializes per batch
        # (r4 advisor finding: it was unbudgeted, so a wide int4 head
        # routed to XLA could RESOURCE_EXHAUSTED despite auto-chunking).
        chunk_row_bytes = 4 * max_b
        if self.head_backend == "xla" and index.layout.head_dtype == "int4":
            chunk_row_bytes += 2 * index.layout.head_terms
        explicit_chunk = score_chunk_rows is not None
        if score_chunk_rows is None:
            # Auto: bound the per-chunk transients by the fixed score
            # budget AND by what the head leaves free of the total search
            # budget (a 9.5 GiB 5M x F=4096 int4 head leaves ~2.5 GiB
            # for the chunk, not 6).
            budget = min(
                SCORE_BUDGET_BYTES,
                max(HBM_SEARCH_BUDGET_BYTES - head_bytes, 64 << 20),
            )
            if index.layout.num_rows * chunk_row_bytes > budget:
                score_chunk_rows = max(budget // chunk_row_bytes, 4096)
            else:
                score_chunk_rows = 0
        if score_chunk_rows and self.merge_backend != "host":
            # The chunked path computes candidate head scores on the host
            # (the device-merge gather would need per-chunk row remaps
            # and per-chunk candidate uploads — tunnel-hostile); without
            # the host merge, fall back to single-sweep scoring — which
            # is LARGER than the chunked plan it replaces, so say so.
            logger.warning(
                "score chunking (%d rows/chunk) disabled: merge_backend="
                "%r has no chunked path — the full-width (B=%d, R=%d) "
                "sweep will run instead and may exceed the %.1f GiB "
                "search budget",
                score_chunk_rows,
                self.merge_backend,
                max_b,
                index.layout.num_rows,
                HBM_SEARCH_BUDGET_BYTES / 2**30,
            )
            score_chunk_rows = 0
        elif (
            explicit_chunk
            and score_chunk_rows
            and head_bytes + score_chunk_rows * chunk_row_bytes
            > HBM_SEARCH_BUDGET_BYTES
        ):
            # After the merge gate on purpose (r4 advisor finding): this
            # describes the chunked plan that actually runs.
            logger.warning(
                "score_chunk_rows=%d models %.1f GiB of head+chunk HBM, "
                "over the %.1f GiB search budget — expect "
                "RESOURCE_EXHAUSTED at dispatch",
                score_chunk_rows,
                (head_bytes + score_chunk_rows * chunk_row_bytes) / 2**30,
                HBM_SEARCH_BUDGET_BYTES / 2**30,
            )
        self._dev = _DeviceIndex(
            index.layout,
            self.device,
            row_align=row_align,
            chunk_rows=score_chunk_rows or None,
        )
        # Host-side merge state (head view, term-major copy, prefilter
        # slack) — shared with the sharded engine's extract mode; the
        # rationale for every term lives in postings.prepare_host_merge.
        (
            self._host_head,
            self._host_head_dtype,
            self._head_t,
            self._slack_per_term,
        ) = prepare_host_merge(
            index.layout, want_head_t=merge_backend == "host"
        )
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

    def _tail_candidates(
        self, enc: EncodedBatch, batch_size: int
    ) -> FlatCandidates:
        layout = self.index.layout
        return tail_candidates_flat(
            layout.post_ptr,
            layout.post_rows,
            layout.post_weights,
            enc.tail_ids,
            enc.tail_counts,
            enc.tail_ptr,
            batch_size,
            num_rows=layout.num_rows,
            pad_to_menu=self.merge_backend == "device",
        )

    def _use_extract(self, top_k: int) -> bool:
        """The extraction-kernel path applies exactly where the standard
        program would take the block-pruned exact selection, on the
        host-merge Pallas path (no device candidate gather to serve)."""
        r = self._dev.head.shape[0] if self._dev.head is not None else 0
        kk = min(top_k, r) if r else 0
        return (
            self.narrow_backend == "extract"
            and self.narrow_m > 0
            and self.merge_backend == "host"
            and self.topk_mode == "exact"
            and self.head_backend == "pallas"
            and r >= 4096
            and r // 128 > 2 * kk
        )

    def _use_extract_chunked(self, top_k: int) -> bool:
        """Chunked analogue of :meth:`_use_extract`: at 1M+ docs the
        (B, Rc) score write + re-read is chunk-multiplied, so removing it
        per chunk is where the extraction kernel pays most. Chunks below
        the kernel's shape floor fall back to the standard program
        per-chunk inside :meth:`_dispatch_chunked`."""
        if not (
            self.narrow_backend == "extract"
            and self.narrow_m > 0
            and self.merge_backend == "host"
            and self.topk_mode == "exact"
            and self.head_backend == "pallas"
        ):
            return False
        # Chunk sizes are equalized (every chunk padded to one shared
        # shape — see _DeviceIndex), so one chunk's floor check covers
        # them all.
        rc = self._dev.chunks[0][0].shape[0]
        return rc >= 4096 and rc // 128 > 2 * min(top_k, rc)

    def _dispatch_chunked(
        self,
        packed_q: jax.Array,
        top_k: int,
        extract: bool = False,
        std_backend: Optional[str] = None,
    ) -> jax.Array:
        """Chunked scoring: one fused dispatch per row chunk (equal
        shapes — ONE compile) + a device-side merge, so the score matrix
        never exists at full R and only one packed result crosses the
        tunnel. With ``extract=True`` (callers gate on
        :meth:`_use_extract_chunked`; chunk shapes are equalized, so the
        kernel floor holds for every chunk when it holds for one), the
        extraction kernel skips each chunk's (B, Rc) score write
        entirely and the result carries a trailing tie-safety flag
        column (max over chunks; finish_batch re-dispatches the
        standard chunked program when it is set)."""
        from osr_tpu.ops.bm25 import (
            fused_search_extract,
            merge_packed_chunks,
        )

        d = self._dev
        interp = getattr(self.device, "platform", "") != "tpu"
        if std_backend is None:
            std_backend = self.head_backend
        packeds = []
        flags = []
        for head_c, valid_c in d.chunks:
            if packeds:
                # Serialize chunk dispatches: async enqueue reserves
                # each chunk's (B, Rc) score workspace up front, so
                # two in-flight chunks would hold BOTH buffers —
                # measured HBM OOM at F=4096, B=2048, 1M docs.
                # Blocking bounds live workspace to ~one chunk (the
                # device executes serially anyway; cost is one
                # dispatch round-trip per extra chunk).
                packeds[-1].block_until_ready()
            if extract:
                px = fused_search_extract(
                    packed_q,
                    head_c,
                    d.head_scales,
                    valid_c,
                    head_terms=self.index.layout.head_terms,
                    k=top_k,
                    narrow_m=self.narrow_m,
                    interpret=interp,
                )
                flags.append(px[:, -1])
                packeds.append(px[:, :-1])
            else:
                packeds.append(
                    fused_search_packed(
                        packed_q,
                        d.empty_i32,
                        d.empty_i32,
                        head_c,
                        d.head_scales,
                        valid_c,
                        head_terms=self.index.layout.head_terms,
                        k=top_k,
                        topk_mode=self.topk_mode,
                        head_backend=std_backend,
                        narrow_m=self.narrow_m,
                    )[0]
                )
        merged = merge_packed_chunks(jnp.stack(packeds), d.chunk_bases)
        if not extract:
            return merged
        flag = jnp.max(jnp.stack(flags, axis=0), axis=0)[:, None]
        return jnp.concatenate([merged, flag], axis=1)

    def search_encoded_device(self, enc: EncodedBatch, top_k: int):
        """Async: dispatch the device step AND run every host stage that
        does not depend on device results (tail candidates + candidate head
        scores) so only fetch+merge remain in :meth:`finish_batch` — the
        single-core host computes while the device/tunnel works.

        Returns an opaque in-flight handle for :meth:`finish_batch`."""
        d = self._dev
        cand = self._tail_candidates(enc, enc.head_ids.shape[0])
        if self.merge_backend == "device":
            flat_rows = jnp.asarray(cand.rows)
            flat_cols = jnp.asarray(cand.cols)
        else:
            # Host merge: the candidates' head scores are computed from the
            # host-resident head matrix; the device moves ONLY one packed
            # query array up and one packed top-k array down (a remote-TPU
            # tunnel charges a large fixed cost per transfer op).
            flat_rows = flat_cols = d.empty_i32
        packed_q = jnp.asarray(
            pack_query_batch(enc.head_ids, enc.head_weights)
        )
        if d.chunks is not None:
            if self._use_extract_chunked(top_k):
                out = (
                    (
                        "extract",
                        self._dispatch_chunked(packed_q, top_k, extract=True),
                        packed_q,
                    ),
                    None,
                )
            else:
                out = (self._dispatch_chunked(packed_q, top_k), None)
        elif self._use_extract(top_k):
            from osr_tpu.ops.bm25 import fused_search_extract

            packed_x = fused_search_extract(
                packed_q,
                d.head,
                d.head_scales,
                d.valid,
                head_terms=self.index.layout.head_terms,
                k=top_k,
                narrow_m=self.narrow_m,
                interpret=getattr(self.device, "platform", "") != "tpu",
            )
            # Keep packed_q in the handle: the rare unsafe batch
            # re-dispatches the standard full-width program from it.
            out = (("extract", packed_x, packed_q), None)
        else:
            out = fused_search_packed(
                packed_q,
                flat_rows,
                flat_cols,
                d.head,
                d.head_scales,
                d.valid,
                head_terms=self.index.layout.head_terms,
                k=top_k,
                topk_mode=self.topk_mode,
                head_backend=self.head_backend,
                narrow_m=self.narrow_m,
            )
        # Prefetch the packed result (and the candidate gather on the
        # device-merge path): the D2H copy queues behind the search
        # program, so the tunnel streams results back during later
        # batches' host work instead of blocking finish_batch.
        p = out[0]
        _prefetch(p[1] if isinstance(p, tuple) else p)
        if self.merge_backend == "device" and out[1] is not None:
            _prefetch(out[1])
        layout = self.index.layout
        if self.merge_backend == "device":
            cand_head = None  # comes back from the device with the top-k
            # Device cand_head is gathered from the SAME score matrix as
            # the head top-k — zero discrepancy, zero slack.
            tau_slack = np.zeros(enc.head_ids.shape[0], dtype=np.float32)
        else:
            tau_slack = merge_tau_slack(
                self._slack_per_term,
                enc.head_flat_ids,
                enc.head_flat_counts,
                enc.head_ptr,
            )
            nq_real = max(1, len(enc.head_ptr) - 1)
            if (
                self.cand_filter_per_query
                and cand.total
                >= self.cand_filter_per_query * nq_real
            ):
                # Large candidate loads (1M+ doc corpora): defer the
                # head-dot to finish_batch, where the device head top-k
                # enables the exact tau filter
                # (postings.py:filter_candidates_by_tau). The host is the
                # critical path in this regime, so losing dispatch-time
                # overlap costs nothing next to ~90% less head-dot work.
                cand_head = ("tau_filter", enc)
            else:
                cand_head = cand_head_scores_host(
                    self._host_head,
                    self._host_head_dtype,
                    layout.head_scales,
                    cand,
                    enc.head_flat_ids,
                    enc.head_flat_counts,
                    enc.head_ptr,
                    head_t=self._head_t,
                )
        return cand, out, cand_head, tau_slack

    def finish_batch(
        self, in_flight, top_k: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Collect device results and run the exact host merge."""
        cand, (packed, cand_head_dev), cand_head, tau_slack = in_flight
        if cand_head is None:
            cand_head = np.asarray(cand_head_dev)
        if isinstance(packed, tuple) and packed[0] == "extract":
            _, packed_x, packed_q = packed
            arr = np.asarray(packed_x)  # (B, 2k'+1): [scores|rows|flag]
            if arr[0, -1] != 0.0:
                # Tie-safety flag: some block's m-th value reached the
                # candidate tau, so the narrowed candidate set COULD miss
                # a true top-k member. Re-dispatch the standard
                # full-width program for this batch (rare; costs one
                # extra round trip, never correctness).
                d = self._dev
                if d.chunks is not None:
                    repacked = self._dispatch_chunked(
                        packed_q,
                        top_k,
                        std_backend=(
                            self.head_backend
                            if getattr(self.device, "platform", "")
                            == "tpu"
                            else "xla"
                        ),
                    )
                else:
                    repacked, _ = fused_search_packed(
                        packed_q,
                        d.empty_i32,
                        d.empty_i32,
                        d.head,
                        d.head_scales,
                        d.valid,
                        head_terms=self.index.layout.head_terms,
                        k=top_k,
                        topk_mode=self.topk_mode,
                        # Off-TPU (interpret-mode tests) the non-interpret
                        # Mosaic path can't run; the XLA chain is
                        # numerically identical (tests/test_pallas_kernels).
                        head_backend=(
                            self.head_backend
                            if getattr(self.device, "platform", "") == "tpu"
                            else "xla"
                        ),
                    )
                head_s, head_r = unpack_topk(np.asarray(repacked))
            else:
                kk = (arr.shape[1] - 1) // 2
                head_s = arr[:, :kk]
                head_r = arr[:, kk:-1].astype(np.int32)
        else:
            head_s, head_r = unpack_topk(np.asarray(packed))
        if isinstance(cand_head, tuple) and cand_head[0] == "tau_filter":
            enc = cand_head[1]
            cand = filter_candidates_by_tau(
                cand,
                head_s,
                head_r,
                top_k,
                tau_slack,
                self.index.layout.num_rows,
            )
            cand_head = cand_head_scores_host(
                self._host_head,
                self._host_head_dtype,
                self.index.layout.head_scales,
                cand,
                enc.head_flat_ids,
                enc.head_flat_counts,
                enc.head_ptr,
                head_t=self._head_t,
            )
        return merge_host(
            head_s,
            head_r,
            cand,
            cand_head,
            self.index.layout.num_rows,
            top_k,
            tau_slack=tau_slack,
        )

    def search_token_batch(
        self, texts: Sequence[str], top_k: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Encode + search one batch of query strings synchronously."""
        enc = self.encode_queries(texts)
        in_flight = self.search_encoded_device(enc, top_k)
        return self.finish_batch(in_flight, top_k)

    def score_all(self, texts: Sequence[str]) -> np.ndarray:
        """Dense (len(texts), num_docs) score matrix — the test/oracle API.

        Chunks by the engine's largest batch size, so any number of texts
        is accepted. Head scores come from the device (in the layout's head
        dtype); tail scores are added host-side exactly.
        """
        d = self._dev
        layout = self.index.layout
        out = np.zeros((len(texts), self.index.num_docs), dtype=np.float32)
        max_b = self.batch_sizes[-1]
        for i in range(0, len(texts), max_b):
            chunk = texts[i : i + max_b]
            enc = self.encode_queries(chunk)
            if d.chunks is not None:
                # Row-chunked index: score per chunk and concatenate
                # (chunks are contiguous; only the last carries padding).
                parts = [
                    np.asarray(
                        dense_head_scores(
                            jnp.asarray(enc.head_ids),
                            jnp.asarray(enc.head_weights),
                            head_c,
                            d.head_scales,
                            head_terms=layout.head_terms,
                        )
                    )
                    for head_c, _ in d.chunks
                ]
                hs = np.concatenate(parts, axis=1)
            else:
                hs = dense_head_scores(
                    jnp.asarray(enc.head_ids),
                    jnp.asarray(enc.head_weights),
                    d.head,
                    d.head_scales,
                    head_terms=layout.head_terms,
                )  # (B, R)
            scores = np.asarray(hs)[: len(chunk), : self.index.num_docs]
            tail = dense_tail_scores(
                layout.post_ptr,
                layout.post_rows,
                layout.post_weights,
                enc.tail_ids,
                enc.tail_counts,
                enc.tail_ptr,
                layout.num_rows,
            )[:, : self.index.num_docs]
            out[i : i + len(chunk)] = scores + tail
        return out

    # ------------------------------------------------------------------
    # Host path
    # ------------------------------------------------------------------

    def _pick_batch_size(self, n: int) -> int:
        from osr_tpu.retrieval.encoding import pick_batch_size

        return pick_batch_size(self.batch_sizes, n)

    def encode_queries(self, texts: Sequence[str]) -> EncodedBatch:
        """Tokenize + pad a list of query strings (head/tail split).

        ``len(texts)`` must not exceed the engine's largest batch size
        (raises ValueError otherwise); search() chunks for you.
        """
        return encode_query_batch(
            self.encoder,
            texts,
            self._pick_batch_size(len(texts)),
            self.index.layout.head_terms,
        )

    def search(
        self, queries: Mapping[str, str], top_k: int = 10
    ) -> Dict[str, Dict[str, float]]:
        """Reference-compatible search API: {qid: {doc_id: score}}.

        Matches the reference retriever duck-type ``search(queries, top_k)``
        (reference retriever_registry.py:228): empty queries and queries with
        no in-vocabulary terms return {}; results keep only scores > 0,
        sorted descending. Batches are dispatched asynchronously and results
        collected afterwards, so host work (tokenize + tail postings) and
        device work overlap.
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

        from osr_tpu.retrieval.pipeline_util import run_pipelined

        done = []
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

        from osr_tpu.retrieval.results import assemble_result_dicts

        for chunk, scores, ids in done:
            # Batch-vectorized result assembly (retrieval/results.py):
            # measured 2x over a per-element filtering dict-comp at bench
            # shape (B=6648, k=50), which is ~10% of a whole TPU pass.
            n = len(self.index.doc_ids)
            mask = (scores > 0) & (ids >= 0) & (ids < n)
            dicts = assemble_result_dicts(
                self._doc_ids_object(), ids, scores, mask
            )
            for row, (qid, text) in enumerate(chunk):
                if self._query_cache is not None:
                    with self._cache_lock:
                        if len(self._query_cache) < self._cache_limit:
                            self._query_cache[(text, top_k)] = (
                                ids[row],
                                scores[row],
                            )
                results[qid] = dicts[row]
        return results

    def search_weighted(
        self,
        queries: Mapping[str, Mapping[str, float]],
        top_k: int = 10,
    ) -> Dict[str, Dict[str, float]]:
        """Learned-sparse (SPLADE) search: queries are {term: weight}
        mappings used verbatim (no tokenization/counting). Same result
        contract as :meth:`search`."""
        from osr_tpu.retrieval.encoding import encode_weighted_batch

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
                self._pick_batch_size(len(chunk)),
                self.index.layout.head_terms,
            )
            handle = self.search_encoded_device(enc, top_k)
            scores, ids = self.finish_batch(handle, top_k)
            from osr_tpu.retrieval.results import assemble_result_dicts

            n = len(self.index.doc_ids)
            mask = (scores > 0) & (ids >= 0) & (ids < n)
            dicts = assemble_result_dicts(
                self._doc_ids_object(), ids, scores, mask
            )
            results.update(zip(chunk, dicts))
        return results

    def _doc_ids_object(self) -> np.ndarray:
        """Object-dtype doc-id array for vectorized (B, k) -> name gathers
        (built lazily once; ~50x faster than a Python list-index loop)."""
        cached = getattr(self, "_doc_ids_obj", None)
        if cached is None or len(cached) != len(self.index.doc_ids):
            cached = np.array(self.index.doc_ids, dtype=object)
            self._doc_ids_obj = cached
        return cached

    def _to_result(
        self, ids: np.ndarray, scores: np.ndarray
    ) -> Dict[str, float]:
        return self._rows_to_result(ids.tolist(), scores.tolist())

    def _rows_to_result(self, ids, scores) -> Dict[str, float]:
        """ids/scores are plain Python lists (one query's top-k)."""
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

    def stats(self) -> Dict[str, object]:
        s = self.index.stats()
        s["device"] = str(self.device)
        s["topk_mode"] = self.topk_mode
        if self._dev.chunks is not None:
            s["score_chunks"] = len(self._dev.chunks)
        if self._query_cache is not None:
            s["query_cache_size"] = len(self._query_cache)
        return s


@functools.partial(jax.jit, static_argnames=("n_real", "k"))
def _pallas_dense_step(
    q: jax.Array,  # (B, D) fp32 queries
    docs_int8: jax.Array,  # (Npad, D) int8, rows padded to 128
    scales: jax.Array,  # (Npad,) per-doc scales (padding rows are 0)
    *,
    n_real: int,
    k: int,
) -> jax.Array:
    """One-dispatch dense search step for the Pallas backend: symmetric
    query quantization, fused Mosaic int8 (or VMEM-decoded int4)
    similarity, exact block-pruned top-k over the real rows, packed
    (B, 2k) result (scores ‖ indices as f32 values — exact for
    n_real < 2^24). ``docs_int8`` may be the (Npad, D/2) uint8
    nibble-packed corpus (quantize.py:quantize_symmetric_int4), selected
    by its dtype."""
    from osr_tpu.ops import quantize as qz
    from osr_tpu.ops.pallas.matmul import (
        int4_similarity_pallas,
        int8_similarity_pallas,
    )

    b = q.shape[0]
    pad_b = (-b) % 128
    if pad_b:
        q = jnp.pad(q, ((0, pad_b), (0, 0)))
    q8, qs = qz.quantize_symmetric(q)
    sim_fn = (
        int4_similarity_pallas
        if docs_int8.dtype == jnp.uint8
        else int8_similarity_pallas
    )
    sims = sim_fn(q8, docs_int8, qs, scales)
    sims = sims[:b, :n_real]
    vals, ids = qz._select_topk(sims, k)
    return qz._pack_result(vals, ids)


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
        quantization: str = "symmetric",  # 'symmetric' | 'asymmetric'
        #                                    | 'int4' | 'none'
        device=None,
        backend: str = "xla",  # 'pallas' routes symmetric int8/int4
        #                         similarity through the fused Mosaic kernel
    ):
        from osr_tpu.ops import quantize as qz
        from osr_tpu.utils.compile_cache import enable_persistent_cache

        enable_persistent_cache()
        self.doc_ids = list(doc_ids)
        self.quantization = quantization
        self.backend = backend
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
        self.device = device if device is not None else jax.devices()[0]
        self.dim = embeddings.shape[1]
        self._chunks = None  # row-chunked scoring: from_quantized only
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
        elif quantization == "int4":
            # Nibble-packed corpus: half the resident HBM of int8 at ~int4
            # ranking quality (the same trade the sparse head's int4 mode
            # makes — see tests/test_int4.py / bench_results README).
            self._docs, self._scales = qz.quantize_symmetric_int4(emb_dev)
            if backend == "pallas" and len(self.doc_ids) < emb_dev.shape[0]:
                self._scales = self._scales.at[len(self.doc_ids) :].set(0.0)
            self._mins = None
        elif quantization == "int4_grouped":
            # Per-(row, 128-column-group) scales: per-row int4 measured
            # -24% nDCG@10 on embeddings (one outlier crushes the row);
            # group scales bound the outlier's blast radius
            # (ops/quantize.py:quantize_symmetric_int4_grouped). Same
            # packed bytes; scales cost D/128 f32 per row extra.
            self._docs, self._scales = qz.quantize_symmetric_int4_grouped(
                emb_dev
            )
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

    @classmethod
    def from_quantized(
        cls,
        doc_ids: Sequence[str],
        docs_q: np.ndarray,  # int8 (N, D) | uint8 (N, D/2) int4-packed
        scales: np.ndarray,  # (N,) float32 per-row
        quantization: str = "symmetric",  # 'symmetric' | 'int4'
        device=None,
        backend: str = "xla",
        score_chunk_rows: Optional[int] = None,
    ) -> "DenseSearchEngine":
        """Build from HOST-pre-quantized rows (ops/quantize.py:
        quantize_symmetric_np / quantize_symmetric_int4_np): at corpus
        scale only the packed bytes travel to the device — the fp32
        matrix (4x/8x the bytes) never exists on it. The regular
        constructor's quantize-on-device path stays for small corpora.

        ``score_chunk_rows`` bounds device HBM the way the sparse
        engine's chunked scoring does (engine ``score_chunk_rows``): the
        (B, N) f32 similarity matrix is the capacity wall, so the corpus
        splits into row chunks scored by one shared compiled program and
        the per-chunk top-k merge on the host. Chunk-local ids also keep
        the packed-f32 id transport exact past 2^24 total docs."""
        from osr_tpu.utils.compile_cache import enable_persistent_cache

        enable_persistent_cache()
        docs_q = np.asarray(docs_q)
        scales = np.asarray(scales, np.float32)
        if quantization == "symmetric":
            if docs_q.dtype != np.int8:
                raise ValueError(f"symmetric rows must be int8: {docs_q.dtype}")
            dim = docs_q.shape[1]
        elif quantization == "int4":
            if docs_q.dtype != np.uint8:
                raise ValueError(f"int4 rows must be uint8: {docs_q.dtype}")
            dim = 2 * docs_q.shape[1]
        elif quantization == "int4_grouped":
            if docs_q.dtype != np.uint8:
                raise ValueError(f"int4 rows must be uint8: {docs_q.dtype}")
            if scales.ndim != 2:
                raise ValueError(
                    "int4_grouped needs (N, G) per-group scales "
                    f"(got shape {scales.shape})"
                )
            dim = 2 * docs_q.shape[1]
            if dim % scales.shape[1]:
                raise ValueError(
                    f"dim {dim} not divisible by {scales.shape[1]} groups"
                )
            if backend == "pallas":
                raise ValueError(
                    "int4_grouped has no Pallas kernel (per-group scales "
                    "don't fold into the rank-1 epilogue); use "
                    "backend='xla'"
                )
        else:
            raise ValueError(
                "from_quantized supports symmetric/int4/int4_grouped, "
                f"got {quantization}"
            )
        if len(doc_ids) != docs_q.shape[0] or len(doc_ids) != scales.shape[0]:
            raise ValueError("doc_ids/rows/scales length mismatch")
        if backend == "pallas" and quantization == "int4" and (dim // 2) % 128:
            raise ValueError(
                "pallas int4 needs a lane-aligned packed width: dim/2 must "
                f"be a multiple of 128 (dim={dim}); use backend='xla'"
            )
        self = cls.__new__(cls)
        self.doc_ids = list(doc_ids)
        self.quantization = quantization
        self.backend = backend
        self.device = device if device is not None else jax.devices()[0]
        self.dim = dim
        self._mins = None
        self._chunks = None
        n = len(self.doc_ids)
        if score_chunk_rows and n > score_chunk_rows:
            # Full chunks share ONE compiled program; the last keeps its
            # natural size (a second compile at most) so its top-k runs
            # over exactly its real rows — padding it with zero-score
            # rows could displace legitimately negative-scored docs from
            # the chunk-local top-k (the same tie-safety reasoning as the
            # sparse engine's exactness argument).
            rows = score_chunk_rows
            if rows >= (1 << 24):
                # Chunk-local ids ride packed in f32 — exact only below
                # 2^24 rows per chunk (same transport as the sparse
                # engine's chunk bases).
                raise ValueError(
                    f"score_chunk_rows must be < 2^24 (got {rows})"
                )
            if backend == "pallas":
                rows = -(-rows // 128) * 128
            self._chunks = []
            for base in range(0, n, rows):
                cn = min(rows, n - base)
                dq = docs_q[base : base + cn]
                sc = scales[base : base + cn]
                if backend == "pallas" and cn % 128:
                    pad = (-cn) % 128  # lane alignment only, zero-scale
                    dq = np.pad(dq, ((0, pad), (0, 0)))
                    sc = np.pad(sc, (0, pad))
                self._chunks.append(
                    (
                        jax.device_put(dq, self.device),
                        jax.device_put(sc, self.device),
                        base,
                        cn,
                    )
                )
            self._chunk_rows = rows
            return self
        if backend == "pallas":
            pad = (-docs_q.shape[0]) % 128
            if pad:
                docs_q = np.pad(docs_q, ((0, pad), (0, 0)))
                scales = np.pad(scales, (0, pad))  # zero-scale pad rows
            self._n_real = len(self.doc_ids)
        self._docs = jax.device_put(docs_q, self.device)
        self._scales = jax.device_put(scales, self.device)
        return self

    def dispatch_vectors(self, query_vectors: np.ndarray, top_k: int):
        """Async half of :meth:`search_vectors`: enqueue the device step
        and return an opaque in-flight handle without blocking. JAX
        dispatch is asynchronous, so the caller can overlap host work (or
        another engine's device step — the hybrid fast path) with this
        search and fetch later via :meth:`collect_vectors`."""
        from osr_tpu.ops import quantize as qz

        q = jnp.asarray(query_vectors, dtype=jnp.float32)
        if self._chunks is not None:
            # Row-chunked scoring (from_quantized at corpus scale): all
            # chunk dispatches go out back-to-back — JAX queues them
            # asynchronously, so device work pipelines — and the
            # per-chunk top-k candidates merge on the host in collect.
            if self.quantization == "int4":
                search_fn = qz.int4_search_symmetric
            elif self.quantization == "int4_grouped":
                search_fn = functools.partial(
                    qz.int4_search_symmetric_grouped,
                    group_size=self.dim // self._chunks[0][1].shape[1],
                )
            else:
                search_fn = qz.int8_search_symmetric
            parts = []
            for docs, scales, base, cn in self._chunks:
                kk = min(top_k, cn)
                if self.backend == "pallas":
                    out = _pallas_dense_step(
                        q, docs, scales, n_real=cn, k=kk
                    )
                else:
                    out = search_fn(q, docs, scales, k=kk, packed=True)
                _prefetch(out)
                parts.append((out, base, kk))
            return ("chunked", (parts, top_k))
        if (
            self.quantization in ("symmetric", "int4")
            and self.backend == "pallas"
        ):
            if len(self.doc_ids) >= (1 << 24):
                # The Mosaic step packs doc indices as f32 VALUES — exact
                # only below 2^24 rows. Fail loudly instead of silently
                # corrupting indices; the XLA backends fall back to the
                # unpacked two-transfer result above that size.
                raise ValueError(
                    f"pallas dense backend packs indices as f32 and "
                    f"supports < 2^24 docs (got {len(self.doc_ids)}); "
                    "use backend='xla'"
                )
            # Fused Mosaic path (osr_tpu/ops/pallas/matmul.py): quantize +
            # similarity + exact block-pruned top-k + result pack, all in
            # ONE jitted program — a single dispatch per batch.
            out = _pallas_dense_step(
                q, self._docs, self._scales, n_real=self._n_real, k=top_k
            )
            _prefetch(out)
            return ("packed", out)
        packed = len(self.doc_ids) < (1 << 24)
        if self.quantization == "symmetric":
            out = qz.int8_search_symmetric(
                q, self._docs, self._scales, k=top_k, packed=packed
            )
        elif self.quantization == "int4":
            out = qz.int4_search_symmetric(
                q, self._docs, self._scales, k=top_k, packed=packed
            )
        elif self.quantization == "int4_grouped":
            out = qz.int4_search_symmetric_grouped(
                q, self._docs, self._scales, k=top_k, packed=packed,
                group_size=self.dim // self._scales.shape[1],
            )
        elif self.quantization == "asymmetric":
            out = qz.int8_search_asymmetric(
                q, self._docs, self._scales, self._mins, k=top_k, packed=packed
            )
        else:
            out = qz.fp_search(q, self._docs, k=top_k, packed=packed)
        if packed:
            _prefetch(out)
        else:
            _prefetch(out[0])
            _prefetch(out[1])
        return ("packed" if packed else "pair", out)

    def collect_vectors(
        self, in_flight
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Blocking half of :meth:`search_vectors`: fetch a handle from
        :meth:`dispatch_vectors` as (scores (B, k), doc_indices (B, k))."""
        kind, out = in_flight
        if kind == "chunked":
            parts, top_k = out
            vals_parts, ids_parts = [], []
            for packed, base, kk in parts:
                arr = np.asarray(packed)
                vals_parts.append(arr[:, :kk])
                ids_parts.append(arr[:, kk:].astype(np.int64) + base)
            vals = np.concatenate(vals_parts, axis=1)
            ids = np.concatenate(ids_parts, axis=1)
            k = min(top_k, vals.shape[1])
            # Deterministic merge: by descending score, ascending doc id
            # on ties (matches the ascending-id bias of block-pruned
            # selection within a single sweep).
            order = np.lexsort((ids, -vals), axis=1)[:, :k]
            return (
                np.take_along_axis(vals, order, axis=1),
                np.take_along_axis(ids, order, axis=1).astype(np.int32),
            )
        if kind == "packed":
            arr = np.asarray(out)
            kk = arr.shape[-1] // 2
            return arr[:, :kk].copy(), arr[:, kk:].astype(np.int32)
        return np.asarray(out[0]), np.asarray(out[1])

    def search_vectors(
        self, query_vectors: np.ndarray, top_k: int = 10
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Return (scores (B, k), doc_indices (B, k)) for fp32 query vectors.

        Results come back as ONE packed (B, 2k) f32 transfer (scores ‖
        indices-as-values) whenever the corpus is small enough for f32 to
        carry indices exactly (< 2^24 rows): the dev tunnel charges a fixed
        ~30 ms per transfer, so one fetch instead of two halves the fixed
        transfer cost per batch (DEVELOPMENT.md pitfalls).
        """
        return self.collect_vectors(
            self.dispatch_vectors(query_vectors, top_k)
        )

    def search(
        self,
        query_vectors: Mapping[str, np.ndarray],
        top_k: int = 10,
        min_score: float = 0.0,
    ) -> Dict[str, Dict[str, float]]:
        qids = list(query_vectors.keys())
        if not qids:
            return {}
        from osr_tpu.retrieval.results import (
            as_object_names,
            assemble_result_dicts,
        )

        batch = np.stack([np.asarray(query_vectors[q]) for q in qids])
        scores, ids = self.search_vectors(batch, top_k=top_k)
        cached = getattr(self, "_doc_ids_obj", None)
        if cached is None or len(cached) != len(self.doc_ids):
            cached = self._doc_ids_obj = as_object_names(self.doc_ids)
        n = len(self.doc_ids)
        mask = (scores > min_score) & (ids >= 0) & (ids < n)
        dicts = assemble_result_dicts(cached, ids, scores, mask)
        return dict(zip(qids, dicts))
