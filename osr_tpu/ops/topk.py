"""Top-k selection on TPU.

Replaces the reference's Numba ``fast_topk_selection`` (argpartition +
partial sort, reference rag_system/core/retrieval.py:79-93 and the
int32-stabilized variant in evaluate_rag_pipeline.py:124-159) and the top-k
algorithm zoo in reference tests/topk_selection.py:15-265 (heap, quickselect,
partial selection sort, sampling-based approximate).

On TPU one canonical primitive covers them all: ``lax.top_k`` compiles to an
efficient sorting network on the VPU. Two extras are provided:

- :func:`merge_topk` — hierarchical merge of per-bucket / per-shard partial
  top-k results (the building block for bucketed indexes and for the
  multi-chip all-gather merge in osr_tpu/parallel/sharded.py).
- :func:`approx_topk_threshold` — the sampling-threshold approximate variant
  (semantics of reference tests/topk_selection.py:152-199): estimate the
  k-th value from a strided sample, prefilter, then exact top-k. On TPU this
  is mainly useful to cut the sort width for very large N.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax


@functools.partial(jax.jit, static_argnames=("k",))
def topk(scores: jax.Array, *, k: int) -> Tuple[jax.Array, jax.Array]:
    """Exact descending top-k along the last axis: (values, indices)."""
    kk = min(k, scores.shape[-1])
    return lax.top_k(scores, kk)


@functools.partial(jax.jit, static_argnames=("k", "overfetch"))
def fast_topk(
    scores: jax.Array, *, k: int, overfetch: int = 2
) -> Tuple[jax.Array, jax.Array]:
    """Two-stage top-k: coarse bf16 selection, exact f32 re-rank.

    TPU's sort-based TopK cost is dominated by data width; selecting
    ``overfetch*k`` candidates on a bfloat16 copy halves the sorted bytes,
    then the candidates' full-precision scores are gathered and re-ranked
    exactly. Returned *scores* are always exact f32. Membership at the k-th
    boundary can differ from exact top-k only if more than
    ``(overfetch-1)*k`` entries collide within one bf16 ulp of the boundary
    value — measured recall 1.0 on benchmark data; the engine's default
    remains exact (``topk_mode='exact'``)."""
    n = scores.shape[-1]
    kk = min(k, n)
    cf = min(kk * overfetch, n)
    _, coarse_idx = lax.top_k(scores.astype(jnp.bfloat16), cf)
    cand = jnp.take_along_axis(scores, coarse_idx, axis=-1)
    vals, pos = lax.top_k(cand, kk)
    return vals, jnp.take_along_axis(coarse_idx, pos, axis=-1)


@functools.partial(jax.jit, static_argnames=("k", "block_cols"))
def block_topk(
    scores: jax.Array,  # (B, R): queries along rows, candidates along lanes
    *,
    k: int,
    block_cols: int = 128,
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k per query via block-max pruning (query-major).

    ``lax.top_k`` over the full R candidates is sort-cost-bound (~114 ms
    at R=57,640, B=6656 on v5e with the full output consumed). Instead:
    (1) reduce each 128-lane block to its max — a bandwidth-bound pass;
    (2) select the top-k BLOCKS per query — a cheap top-k over R/128
    values; (3) gather those blocks (a contiguous-lane ``take_along_axis``
    on the second-to-minor axis — fast, unlike coordinate gathers) and run
    the exact top-k over k*128 candidates. Measured 75 ms vs 105 ms at the
    shapes above; the win grows with R.

    Exactness: a document in the true top-k has score s; its block's max is
    >= s. If that block were not among the k selected blocks, all k selected
    blocks would have max >= s, each contributing a document scoring >= s —
    so the document ranks at best k+1-th, a contradiction (exact ties can
    swap membership among equal-scored documents, as with any top-k).

    Returns (values (B, k'), candidate indices (B, k')), k' = min(k, R).
    """
    b, r = scores.shape
    pad = (-r) % block_cols
    padded = (
        jnp.pad(scores, ((0, 0), (0, pad)), constant_values=-jnp.inf)
        if pad
        else scores
    )
    g = (r + pad) // block_cols
    block_max = padded.reshape(b, g, block_cols).max(axis=2)  # (B, G)
    return block_topk_from_max(
        scores, block_max, k=k, block_cols=block_cols
    )


@functools.partial(jax.jit, static_argnames=("k", "block_cols"))
def block_topk_from_max(
    scores: jax.Array,  # (B, R)
    block_max: jax.Array,  # (B, G) precomputed per-block maxima
    *,
    k: int,
    block_cols: int = 128,
) -> Tuple[jax.Array, jax.Array]:
    """:func:`block_topk` steps 2-3 with the block maxima supplied by the
    caller — the fused Pallas head kernel
    (osr_tpu/ops/pallas/head.py:masked_head_scores_blockmax) reduces them
    while the score tile is still in VMEM, so the bandwidth-bound pass that
    re-reads the (B, R) score matrix from HBM disappears. Exactness
    argument identical to :func:`block_topk`."""
    b, r = scores.shape
    kk = min(k, r)
    pad = (-r) % block_cols
    if pad:
        scores = jnp.pad(
            scores, ((0, 0), (0, pad)), constant_values=-jnp.inf
        )
    g = (r + pad) // block_cols
    if block_max.shape[1] != g:
        raise ValueError(
            f"block_max has {block_max.shape[1]} blocks, expected {g}"
        )
    xr = scores.reshape(b, g, block_cols)
    nb = min(kk, g)
    _, top_blocks = lax.top_k(block_max, nb)  # (B, nb)
    cand = jnp.take_along_axis(xr, top_blocks[:, :, None], axis=1)
    vals, pos = lax.top_k(cand.reshape(b, nb * block_cols), kk)
    blk = jnp.take_along_axis(top_blocks, pos // block_cols, axis=1)
    rows = blk * block_cols + pos % block_cols
    return vals, rows.astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("k", "block_cols", "block_m")
)
def block_topk_narrow(
    scores: jax.Array,  # (B, R)
    block_max: jax.Array,  # (B, G) precomputed per-block maxima
    *,
    k: int,
    block_cols: int = 128,
    block_m: int = 8,
) -> Tuple[jax.Array, jax.Array]:
    """:func:`block_topk_from_max` with per-block top-m narrowing.

    The full-width final selection sorts k*block_cols candidates per query
    (measured 18.2 ms of the 41 ms device step at B=6656, R=57,640, k=50 —
    DEVELOPMENT.md r3 stage table). Most selected blocks contribute at
    most a handful of true top-k members, so: select each block's top
    ``block_m`` (one short per-block sort over ``block_cols`` lanes), then
    the final top-k over only k*block_m candidates.

    Exact, with a tie-safe fallback: a document missed by the narrowing
    ranks > m within its block, so its score <= that block's m-th value.
    If every selected block's m-th value is strictly below the candidate
    k-th value tau, no missed document can displace the candidate top-k —
    the result is exact. Otherwise (``>=`` comparison: ties are unsafe by
    construction) one ``lax.cond`` re-runs the full-width selection for
    the whole batch. Both branches live in the compiled program; the
    fallback fires only on data where >= block_m true top-k members share
    one 128-lane block.

    Bit-identical to :func:`block_topk_from_max` (not just set-equal):
    ``lax.top_k`` breaks ties by lower index, and the narrowed candidate
    order (block-major, lane-stable within a block) preserves the full
    path's tie order; when the safety check fires, the output IS the full
    path's. Verified in tests/test_topk.py.
    """
    b, r = scores.shape
    kk = min(k, r)
    pad = (-r) % block_cols
    if pad:
        scores = jnp.pad(
            scores, ((0, 0), (0, pad)), constant_values=-jnp.inf
        )
    g = (r + pad) // block_cols
    if block_max.shape[1] != g:
        raise ValueError(
            f"block_max has {block_max.shape[1]} blocks, expected {g}"
        )
    nb = min(kk, g)
    m = min(block_m, block_cols)
    if nb * m < kk:
        # Too few narrowed candidates to even fill k — narrowing cannot
        # apply (tiny corpora); use the full-width selection.
        return block_topk_from_max(
            scores[:, :r], block_max, k=k, block_cols=block_cols
        )
    xr = scores.reshape(b, g, block_cols)
    _, top_blocks = lax.top_k(block_max, nb)  # (B, nb)
    cand = jnp.take_along_axis(xr, top_blocks[:, :, None], axis=1)

    vals_m, pos_m = lax.top_k(cand, m)  # (B, nb, m) per-block top-m
    top_n, pos_n = lax.top_k(vals_m.reshape(b, nb * m), kk)
    tau = top_n[:, -1]  # (B,) candidate k-th value
    unsafe = jnp.any(vals_m[:, :, -1] >= tau[:, None])

    def narrow(_):
        blk = jnp.take_along_axis(top_blocks, pos_n // m, axis=1)
        lane = jnp.take_along_axis(
            pos_m.reshape(b, nb * m), pos_n, axis=1
        )
        return top_n, (blk * block_cols + lane).astype(jnp.int32)

    def full(_):
        vals, pos = lax.top_k(cand.reshape(b, nb * block_cols), kk)
        blk = jnp.take_along_axis(top_blocks, pos // block_cols, axis=1)
        rows = blk * block_cols + pos % block_cols
        return vals, rows.astype(jnp.int32)

    return lax.cond(unsafe, full, narrow, None)


@functools.partial(jax.jit, static_argnames=("k",))
def blocktopm_topk(
    vals: jax.Array,  # (B, G, m) per-block top-m values, desc per block
    rows: jax.Array,  # (B, G, m) int32 global row ids
    *,
    k: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Exact top-k from per-block top-m candidates (the Pallas
    extraction kernel's output — ops/pallas/head.py:masked_head_blocktopm).

    Returns (top values (B, k'), top rows (B, k'), unsafe (,) bool).
    Selection: top-k blocks by their per-block max (``vals[..., 0]``),
    then top-k over those blocks' k*m candidates — identical block set
    and candidate tie order as :func:`block_topk_narrow`.

    ``unsafe`` fires when some selected block's m-th value both reaches
    the candidate k-th value tau AND is positive. A narrowing-missed
    document (rank > m in its block) scores <= that m-th value, so with
    the flag clear every missed document either ranks strictly below
    tau or has a non-positive score — and the engines' result contract
    filters scores <= 0 (reference retrieval.py:260 semantics), so the
    FINAL result dict is exactly the full-width path's. (Among
    non-positive tied entries the packed head top-k itself may order
    differently; those entries never reach a result.) The caller must
    re-run the full-width program when the flag fires — it cannot be
    resolved here: the full score matrix was never materialized."""
    b, g, m = vals.shape
    kk = min(k, g * m)
    nb = min(k, g)
    bmax = vals[:, :, 0]
    _, top_blocks = lax.top_k(bmax, nb)  # (B, nb)
    cand_v = jnp.take_along_axis(
        vals, top_blocks[:, :, None], axis=1
    ).reshape(b, nb * m)
    cand_r = jnp.take_along_axis(
        rows, top_blocks[:, :, None], axis=1
    ).reshape(b, nb * m)
    kk = min(kk, nb * m)
    top, pos = lax.top_k(cand_v, kk)
    top_rows = jnp.take_along_axis(cand_r, pos, axis=1)
    tau = top[:, -1]
    mth = jnp.take_along_axis(vals[:, :, -1], top_blocks, axis=1)
    unsafe = jnp.any((mth >= tau[:, None]) & (mth > 0.0))
    return top, top_rows, unsafe


def merge_topk(
    scores_parts: Sequence[jax.Array],  # each (B, k_i)
    ids_parts: Sequence[jax.Array],  # each (B, k_i) global ids
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Merge partial top-k results (already globally-id'd) into a final top-k.

    Concatenates the candidate sets and re-selects; with P parts this costs
    O(B * sum k_i) — independent of corpus size.
    """
    all_scores = jnp.concatenate(list(scores_parts), axis=-1)
    all_ids = jnp.concatenate(list(ids_parts), axis=-1)
    kk = min(k, all_scores.shape[-1])
    top_scores, pos = lax.top_k(all_scores, kk)
    return top_scores, jnp.take_along_axis(all_ids, pos, axis=-1)


@functools.partial(jax.jit, static_argnames=("k", "sample_stride"))
def approx_topk_threshold(
    scores: jax.Array, *, k: int, sample_stride: int = 64
) -> Tuple[jax.Array, jax.Array]:
    """Sampling-threshold approximate top-k (reference
    tests/topk_selection.py:152-199 semantics, vectorized).

    Estimates the k-th largest value from a strided sample and masks scores
    below it before the exact selection. With a conservative threshold
    (sampled k-th value scaled down) recall@k stays >= the reference suite's
    90%-overlap acceptance bar (reference tests/topk_selection.py:329-343).
    """
    n = scores.shape[-1]
    kk = min(k, n)
    sample = scores[..., ::sample_stride]
    m = sample.shape[-1]
    if m < 4 * kk:
        # Too few samples to estimate the k-th value: the threshold could
        # mask true members with no way back. Fall back to exact selection.
        return lax.top_k(scores, kk)
    sk = min(max(1, (kk * m) // n + 1), m)
    thresh = lax.top_k(sample, sk)[0][..., -1:]
    # Conservative margin: keep anything within one sample-std of the
    # estimated threshold.
    margin = jnp.std(sample, axis=-1, keepdims=True)
    masked = jnp.where(scores >= thresh - margin, scores, -jnp.inf)
    return lax.top_k(masked, kk)
