"""Batched sparse scoring on TPU (the BM25/TF-IDF kernel), v2.

TPU-native replacement for the reference's Numba CSR kernels
``simd_bm25_score`` / ``simd_tfidf_score`` (reference
rag_system/core/retrieval.py:41-76, rag_system/pipeline/
evaluate_rag_pipeline.py:57-121), operating on the flat hybrid layout of
osr_tpu/index/layout.py:

- **Head** (common terms): ONE MXU matmul per query batch. The head is
  int8 with per-column scales by default; the scale vector folds into the
  query side (``(A diag(s)) @ q == A @ (s*q)``), so the contraction runs
  int8 x bf16 on the MXU with f32 accumulation. ``f32`` mode runs at
  HIGHEST precision for exact-formula parity tests.
- **Tail** (rare terms): scored on the host (osr_tpu/index/postings.py)
  into per-query candidate lists, passed in as fixed-shape arrays.
- **Merge**: exact, on the HOST. The true top-k is contained in (head
  top-k) UNION (tail-touched candidates) — proof in the fused_search
  docstring. The device contributes the head top-k and a flat gather of
  the candidates' head scores; the host (osr_tpu/index/postings.py:
  merge_host) sums, dedups and reselects. Measured on v5e: any padded
  per-query (B, C) gather/scatter formulation of the merge costs
  ~25 ns/element in XLA (~100 ms/batch) while the host does the same
  random access at ~ns — the split follows the hardware.
- **Top-k** over head scores: ``exact`` uses ``lax.top_k`` (the transpose
  fuses); ``approx`` uses the TPU-native ``lax.approx_max_k``
  PartialReduce (recall 0.95, ~3x faster at 57k rows).

The whole device step (query scatter, head matmul, dequant, mask, top-k,
candidate gather) is ONE jit dispatch; measured per-stage costs on v5e are
recorded in DEVELOPMENT.md.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# A NumPy scalar, NOT jnp.float32(...): a module-level jnp constant would
# materialize a device array and initialize the JAX backend at import time
# (hanging every `import osr_tpu` when a remote-TPU tunnel is unreachable).
# np.float32 traces identically (strongly-typed f32) inside jit.
NEG_INF = np.float32(-np.inf)


@functools.partial(jax.jit, static_argnames=("head_terms",))
def scatter_query_head(
    term_ids: jax.Array,  # (B, Q) int32; ids >= head_terms are dropped
    term_weights: jax.Array,  # (B, Q) float32, padded with 0
    *,
    head_terms: int,
) -> jax.Array:
    """Scatter padded sparse queries into a dense (B, F) float32 matrix.

    Entries must be count-aggregated (one per unique term, like the
    reference's Counter-built query TF vector, reference retrieval.py:
    241-249), so (term, query) pairs are unique and XLA uses the vectorized
    scatter. Padding/tail ids (>= F) are discarded by mode='drop'.

    Query-major orientation: everything downstream (matmul output, mask,
    top-k) is laid out (B, R) so ``lax.top_k`` consumes the score matrix
    with NO transpose — measured on v5e, a (R, B) orientation costs ~100 ms
    of un-fused transpose at B=6656 (DEVELOPMENT.md).
    """
    batch, q = term_ids.shape
    qw = jnp.zeros((batch, head_terms), dtype=jnp.float32)
    rows = jnp.broadcast_to(
        jnp.arange(batch, dtype=jnp.int32)[:, None], (batch, q)
    )
    return qw.at[rows.reshape(-1), term_ids.reshape(-1)].add(
        term_weights.reshape(-1).astype(jnp.float32),
        mode="drop",
        unique_indices=True,
    )


def head_scores(
    head: jax.Array,  # (R, F) int8 | bf16 | f32
    head_scales: Optional[jax.Array],  # (F,) f32, int8 mode only
    qhead: jax.Array,  # (B, F) f32 query counts
) -> jax.Array:
    """(B, R) f32 head scores — one MXU matmul, contracting F on both
    operands so the output is query-major (no transpose anywhere).

    int8 mode: per-column scales are applied to the query counts, the
    scaled queries round to bf16 (query counts are small integers, and the
    scale multiplication adds <=0.4% relative error), and the contraction
    runs with f32 accumulation. f32 mode runs HIGHEST precision for exact
    score parity with the formula oracle; bf16 mode stores true weights in
    bf16 (~0.4% relative) with exact bf16 query counts.
    """
    contract_f = (((1,), (1,)), ((), ()))  # (B, F) x (R, F) -> (B, R)
    if head.shape[1] == 0:
        return jnp.zeros((qhead.shape[0], head.shape[0]), dtype=jnp.float32)
    if head.dtype == jnp.uint8:
        # int4 block-packed head (index/layout.py:unpack_int4): decode the
        # nibbles on device, then score exactly like int8. This XLA path
        # materializes a transient (R, F) bf16 copy per batch — the Pallas
        # kernel (ops/pallas/head.py int4 variant) decodes in VMEM and is
        # the production path; this one is the reference/fallback.
        p32 = head.astype(jnp.int32)
        unpacked = jnp.concatenate([p32 & 0xF, p32 >> 4], axis=1)[
            :, : head_scales.shape[0]
        ]
        q = (qhead * head_scales[None, :]).astype(jnp.bfloat16)
        return lax.dot_general(
            q,
            unpacked.astype(jnp.bfloat16),
            dimension_numbers=contract_f,
            preferred_element_type=jnp.float32,
        )
    if head.dtype == jnp.int8:
        q = (qhead * head_scales[None, :]).astype(jnp.bfloat16)
        return lax.dot_general(
            q,
            head.astype(jnp.bfloat16),
            dimension_numbers=contract_f,
            preferred_element_type=jnp.float32,
        )
    if head.dtype == jnp.bfloat16:
        return lax.dot_general(
            qhead.astype(jnp.bfloat16),
            head,
            dimension_numbers=contract_f,
            preferred_element_type=jnp.float32,
        )
    return lax.dot_general(
        qhead,
        head,
        dimension_numbers=contract_f,
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "head_terms",
        "k",
        "topk_mode",
        "head_backend",
        "narrow_m",
    ),
)
def fused_search(
    q_head_ids: jax.Array,  # (B, Qh) int32, padding >= head_terms
    q_head_weights: jax.Array,  # (B, Qh) f32
    cand_flat_rows: jax.Array,  # (M,) int32 candidate rows, query-major
    cand_flat_cols: jax.Array,  # (M,) int32 owning query per candidate
    head: jax.Array,  # (R, F)
    head_scales: Optional[jax.Array],  # (F,) or None
    valid: jax.Array,  # (R,) bool
    *,
    head_terms: int,
    k: int,
    topk_mode: str = "exact",  # 'exact' | 'approx'
    head_backend: str = "xla",  # 'pallas' = fused Mosaic int8 kernel
    narrow_m: int = 0,  # per-block top-m narrowing; 0 = full-width
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """The batched device search step in one dispatch.

    Returns (head_top_scores (B, k'), head_top_rows (B, k'),
    cand_head_scores (M,)), k' = min(k, R). The final exact merge of the
    head top-k with the tail-touched candidates happens on the HOST
    (osr_tpu/index/postings.py:merge_host) because per-(row, query) lookups
    are ~ns on the host but ~25 ns/element as an XLA gather; only the flat
    M-element candidate gather (real candidates, not padded-per-query)
    stays on device, where the head scores live.

    Exactness of the split (proof): tail weights are strictly positive
    (layout.py forces non-positive-IDF terms into the head), so every
    document's total score >= its head score. If a document is neither
    tail-touched nor in the head top-k, the k head-top documents all have
    head scores — hence totals — at or above its total, so it cannot be in
    the true top-k. Head-top entries that ARE tail-touched carry an
    understated head-only score; the host merge masks them and uses their
    exact totals from the candidate channel.
    """
    qhead = scatter_query_head(
        q_head_ids, q_head_weights, head_terms=head_terms
    )
    r = head.shape[0]
    kk = min(k, r)
    use_block_prune = (
        topk_mode != "approx" and r >= 4096 and r // 128 > 2 * kk
    )
    bmax = None
    if head_backend == "pallas":
        if head.dtype not in (jnp.int8, jnp.uint8):
            raise ValueError(
                "head_backend='pallas' requires an int8 or int4 head"
            )
        from osr_tpu.ops.pallas.head import (
            masked_head_scores,
            masked_head_scores_blockmax,
        )

        if use_block_prune:
            # Fused scores+blockmax: the pruned selection's block-max pass
            # never re-reads the (B, R) matrix from HBM.
            hs, bmax = masked_head_scores_blockmax(
                head, head_scales, qhead, valid
            )
        elif head.dtype == jnp.uint8:
            # int4 without block pruning (tiny corpora / approx mode):
            # the XLA decode path — not worth a second Mosaic kernel.
            hs = head_scores(head, head_scales, qhead)
            hs = jnp.where(valid[None, :], hs, NEG_INF)
        else:
            hs = masked_head_scores(head, head_scales, qhead, valid)
    else:
        hs = head_scores(head, head_scales, qhead)  # (B, R)
        hs = jnp.where(valid[None, :], hs, NEG_INF)
    if topk_mode == "approx":
        head_top, head_rows = lax.approx_max_k(
            hs, kk, recall_target=0.95
        )
        head_rows = head_rows.astype(jnp.int32)
    elif use_block_prune:
        # Exact block-max-pruned selection: 75 ms vs 105 ms for plain
        # lax.top_k at (B=6656, R=57,640, k=50) on v5e (osr_tpu/ops/topk.py:
        # block_topk for the exactness argument and measurements).
        from osr_tpu.ops.topk import (
            block_topk,
            block_topk_from_max,
            block_topk_narrow,
        )

        if bmax is not None:
            if narrow_m:
                # Per-block top-m narrowed selection (tie-safe fallback
                # compiled in; bit-identical — ops/topk.py:block_topk_narrow).
                head_top, head_rows = block_topk_narrow(
                    hs, bmax, k=kk, block_m=narrow_m
                )
            else:
                head_top, head_rows = block_topk_from_max(hs, bmax, k=kk)
        else:
            head_top, head_rows = block_topk(hs, k=kk)
    else:
        head_top, head_rows = lax.top_k(hs, kk)
        head_rows = head_rows.astype(jnp.int32)
    cand_head = hs[cand_flat_cols, cand_flat_rows]  # (M,)
    return head_top, head_rows, cand_head


def pack_query_batch(
    head_ids: "np.ndarray", head_weights: "np.ndarray"
) -> "np.ndarray":
    """Pack (B, Q) int32 ids + (B, Q) f32 weights into ONE (B, Q, 2) int32
    array (weights bitcast). Host<->device transfers through a remote-TPU
    tunnel pay a large fixed cost per operation; one packed upload replaces
    two."""
    import numpy as np

    return np.ascontiguousarray(
        np.stack([head_ids, head_weights.view(np.int32)], axis=-1)
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "head_terms",
        "k",
        "topk_mode",
        "head_backend",
        "narrow_m",
    ),
)
def fused_search_packed(
    q_packed: jax.Array,  # (B, Qh, 2) int32: [ids, bitcast f32 weights]
    cand_flat_rows: jax.Array,  # (M,) int32
    cand_flat_cols: jax.Array,  # (M,) int32
    head: jax.Array,
    head_scales: Optional[jax.Array],
    valid: jax.Array,
    *,
    head_terms: int,
    k: int,
    topk_mode: str = "exact",
    head_backend: str = "xla",
    narrow_m: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """Transfer-minimal variant of :func:`fused_search`: one packed input
    array, and the head top-k packed into one (B, 2k) f32 output (rows
    bitcast into the second half). Candidate head scores are the second
    output (only fetched on the device-merge path)."""
    ids = q_packed[..., 0]
    weights = lax.bitcast_convert_type(q_packed[..., 1], jnp.float32)
    top, rows, cand_head = fused_search(
        ids,
        weights,
        cand_flat_rows,
        cand_flat_cols,
        head,
        head_scales,
        valid,
        head_terms=head_terms,
        k=k,
        topk_mode=topk_mode,
        head_backend=head_backend,
        narrow_m=narrow_m,
    )
    # Rows travel as f32 VALUES, not bitcasts: int32 bit patterns of small
    # integers are f32 denormals, which the TPU flushes to zero. Values are
    # exact for row counts below 2^24 (16.7M documents per chip).
    packed = jnp.concatenate([top, rows.astype(jnp.float32)], axis=1)
    return packed, cand_head


@functools.partial(
    jax.jit, static_argnames=("head_terms", "k", "narrow_m", "interpret")
)
def fused_search_extract(
    q_packed: jax.Array,  # (B, Qh, 2) int32: [ids, bitcast f32 weights]
    head: jax.Array,  # (R, F) int8 or (R, F/2) uint8 int4-packed
    head_scales: jax.Array,  # (F,) f32
    valid: jax.Array,  # (R,) bool
    *,
    head_terms: int,
    k: int,
    narrow_m: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Extraction-kernel variant of :func:`fused_search_packed` for the
    HOST-merge path (candidate head scores are computed host-side there,
    so the device's only jobs are the head matmul and the top-k).

    The Mosaic kernel (ops/pallas/head.py:masked_head_blocktopm) extracts
    each 128-row block's top-``narrow_m`` (values, lanes) in the matmul
    epilogue — the (B, R) f32 score matrix never exists in HBM, which
    removes its write, the block-max re-read, AND the k*128-lane
    candidate gather of the blockmax path. Selection finishes on-device
    over the (B, G, m) candidates (ops/topk.py:blocktopm_topk).

    Returns ONE packed (B, 2k'+1) f32 array: [top scores | rows as f32
    values | tie-safety flag broadcast]. When flag != 0 the caller MUST
    re-dispatch the standard full-width program (the candidate set could
    miss a true positive-scored top-k member); with the flag clear the
    engine's FINAL results are exactly the standard program's (entries
    with non-positive scores may order differently in the packed head
    top-k, but the result contract filters score <= 0 —
    ops/topk.py:blocktopm_topk for the argument). Exact mode only."""
    from osr_tpu.ops.pallas.head import masked_head_blocktopm
    from osr_tpu.ops.topk import blocktopm_topk

    ids = q_packed[..., 0]
    weights = lax.bitcast_convert_type(q_packed[..., 1], jnp.float32)
    qhead = scatter_query_head(ids, weights, head_terms=head_terms)
    vals, rows = masked_head_blocktopm(
        head, head_scales, qhead, valid, m=narrow_m, interpret=interpret
    )
    top, top_rows, unsafe = blocktopm_topk(vals, rows, k=k)
    flag = jnp.broadcast_to(
        unsafe.astype(jnp.float32)[None, None], (top.shape[0], 1)
    )
    return jnp.concatenate(
        [top, top_rows.astype(jnp.float32), flag], axis=1
    )


def unpack_topk(packed: "np.ndarray") -> Tuple["np.ndarray", "np.ndarray"]:
    """Split the packed (B, 2k) f32 result into (scores, int32 rows)."""
    import numpy as np

    k = packed.shape[1] // 2
    return packed[:, :k], packed[:, k:].astype(np.int32)


@jax.jit
def merge_packed_chunks(
    packed_stack: jax.Array,  # (C, B, 2k) per-chunk packed top-k
    bases: jax.Array,  # (C,) f32 chunk row offsets (exact below 2^24)
) -> jax.Array:
    """Merge per-row-chunk packed top-k results into one global (B, 2k).

    The chunked scoring path (engine ``score_chunk_rows``) runs the fused
    search once per row chunk so the (B, R) score matrix never exists at
    full R in HBM — per-chunk buffers are freed between dispatches, which
    is what lifts the 1M-doc B=2048 OOM (DEVELOPMENT.md HBM capacity
    model). Exactness: every global top-k document ranks within the
    top-k of its own chunk, so the union of per-chunk top-k contains the
    global top-k; ties at the k-th boundary resolve in chunk-major order
    (ascending row), like the single-sweep selection's block-rank order —
    membership among exactly-equal scores can differ, as with any top-k.
    """
    c, b, two_k = packed_stack.shape
    k = two_k // 2
    scores = packed_stack[:, :, :k]
    rows = packed_stack[:, :, k:] + bases[:, None, None]
    scores = jnp.moveaxis(scores, 0, 1).reshape(b, c * k)
    rows = jnp.moveaxis(rows, 0, 1).reshape(b, c * k)
    top, pos = lax.top_k(scores, k)
    sel_rows = jnp.take_along_axis(rows, pos, axis=1)
    return jnp.concatenate([top, sel_rows], axis=1)


@functools.partial(jax.jit, static_argnames=("head_terms",))
def dense_head_scores(
    q_head_ids: jax.Array,
    q_head_weights: jax.Array,
    head: jax.Array,
    head_scales: Optional[jax.Array],
    *,
    head_terms: int,
) -> jax.Array:
    """(B, R) head scores for the oracle/score_all path (host adds tail)."""
    qhead = scatter_query_head(
        q_head_ids, q_head_weights, head_terms=head_terms
    )
    return head_scores(head, head_scales, qhead)
