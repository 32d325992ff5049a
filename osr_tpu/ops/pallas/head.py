"""Pallas (Mosaic) kernel for the fused sparse-head scoring matmul.

This is the BM25/TF-IDF batched scoring contraction of
osr_tpu/ops/bm25.py:head_scores — the north-star "int8/bf16 sparse-dense
matmul on the MXU" (the dense head IS the sparse term matrix over the
high-df id range, with the BM25 saturation precomputed into its values;
see osr_tpu/index/layout.py). One kernel fuses, per (query tile, row tile):

  1. int8 head tile load (HBM -> VMEM, no bf16 copy ever materialized
     in HBM — the XLA path's convert-then-dot reads 2x the bytes),
  2. upcast + MXU matmul against the per-column-SCALED bf16 query tile
     (the per-column int8 scales fold into the query side:
     ``(A diag(s)) @ q == A @ (s*q)``), contracting the term axis of BOTH
     operands so the output is query-major,
  3. f32 accumulation and the validity mask (-inf on padding rows),

writing the (B, R) f32 score matrix directly — the orientation
``lax.top_k`` consumes with no transpose (a (R, B) layout costs ~100 ms
of un-fused transpose at B=6656 on v5e; DEVELOPMENT.md). The whole head
dimension F (<= 4096 by layout policy) fits VMEM alongside the row tile,
so no K-loop is needed: VMEM use = TB*F bf16 + TR*F int8 + TB*TR f32
~= 1.7 MB at the default tiles.

Numerics match osr_tpu/ops/bm25.py:head_scores (int8 mode) exactly: same
bf16 operand rounding, f32 accumulation (tests/test_pallas_kernels.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_R = 256
TILE_B = 128


def _head_kernel(q_ref, head_ref, valid_ref, out_ref):
    """One (TILE_B, TILE_R) output tile: upcast-int8 matmul + mask."""
    acc = lax.dot_general(
        q_ref[:],
        head_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TILE_B, TILE_R)
    # f32 mask: Mosaic has no int8 vector comparison on this target.
    mask = valid_ref[:] > 0.5  # (1, TILE_R)
    out_ref[:] = jnp.where(mask, acc, -jnp.inf)


@functools.partial(jax.jit, static_argnames=("interpret",))
def head_scores_pallas(
    q_scaled: jax.Array,  # (B, F) bfloat16 (counts * per-column scales)
    head: jax.Array,  # (R, F) int8, R % TILE_R == 0, F % 128 == 0
    valid: jax.Array,  # (1, R) float32 (1.0 = real row)
    *,
    interpret: bool = False,
) -> jax.Array:
    """(B, R) f32 masked head scores. Shapes must be pre-padded (the
    engine-facing wrapper below handles padding)."""
    r, f = head.shape
    b = q_scaled.shape[0]
    grid = (b // TILE_B, r // TILE_R)
    return pl.pallas_call(
        _head_kernel,
        out_shape=jax.ShapeDtypeStruct((b, r), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (TILE_B, f),
                    lambda i, j: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (TILE_R, f),
                    lambda i, j: (j, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, TILE_R),
                    lambda i, j: (0, j),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (TILE_B, TILE_R),
                lambda i, j: (i, j),
                memory_space=pltpu.VMEM,
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * r * f * b,
            bytes_accessed=r * f + f * b * 2 + r * b * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q_scaled, head, valid)


BLOCK_COLS = 128  # row-block granularity of the exact pruned top-k
TILE_R_BM = 1024  # 8 blocks of 128 per tile: the f32 min sublane tile


def _pick_tile_b(b: int, f: int) -> int:
    """Widest query tile that divides the (pre-padded) batch AND fits
    VMEM at head width ``f``.

    The head tile is re-read from HBM once per QUERY tile, so head
    traffic scales as B/TILE_B x (R*F): at FiQA bench shape TILE_B=128
    moves 5.9 GB of head bytes while TILE_B=512 moves 1.5 GB — measured
    17.2 -> 13.4 ms for the whole fused kernel (tools/profile_fused.py).
    VMEM model (double-buffered pipeline): q tile bf16 + 2x head tile
    int8 + 2x out tile f32 + bmax; at F=4096 the 512 tile exceeds the
    16 MB scoped limit (measured 17.46 M), so wide heads drop to 256.
    """
    budget = 14 << 20  # leave headroom under the 16 MB scoped limit
    for tb in (512, 256, 128):
        if b % tb:
            continue
        need = (
            tb * f * 2  # query tile (resident per i)
            + 2 * TILE_R_BM * f  # head tile, double-buffered
            + 2 * tb * TILE_R_BM * 4  # scores out tile, double-buffered
            + 2 * 8 * tb * 4  # bmax out tile
        )
        if need <= budget:
            return tb
    # No candidate tile fits the VMEM model (very wide F): refuse to
    # launch a kernel the model predicts overflows the 16 MB scoped
    # limit — callers route such shapes to the XLA backend.
    raise ValueError(
        f"pallas head kernel: no query tile (512/256/128) dividing B={b} "
        f"fits the {budget >> 20} MB VMEM budget at F={f}; "
        "use head_backend='xla'"
    )


def _pick_tile_b_blocktopm(b: int, f: int) -> int:
    """Query-tile picker for the blocktopm kernel, whose VMEM profile
    differs from the plain head kernel's: no (tile_b, TILE_R_BM) HBM
    output tile, but the matmul accumulator + masked copy stay live as
    VALUES through the whole epilogue, and each block's scf.for keeps a
    3x(tile_b, 128) carry plus ~3 temporaries of the same shape."""
    budget = 13 << 20  # measured headroom under the 16 MB scoped limit
    for tb in (512, 256, 128):
        if b % tb:
            continue
        need = (
            tb * f * 2  # query tile (resident per i)
            + 2 * TILE_R_BM * f  # head tile, double-buffered
            + 2 * tb * TILE_R_BM * 4  # acc + masked working copy
            + 6 * tb * BLOCK_COLS * 4  # fori carry + round temporaries
        )
        if need <= budget:
            return tb
    raise ValueError(
        f"pallas blocktopm kernel: no query tile (512/256/128) dividing "
        f"B={b} fits the {budget >> 20} MB VMEM budget at F={f}; "
        "use narrow_backend='xla'"
    )


def head_tile_fits(b: int, f_logical: int) -> bool:
    """True when some query tile fits the VMEM model at this head width —
    the engine's head_backend='auto' routes to XLA when this is False
    (F ≳ 5600 overflows even the 128 tile)."""
    try:
        _pick_tile_b(b, f_logical)
        return True
    except ValueError:
        return False


def _decode_int4(packed_i32):
    """Block-packed int4 -> bf16 (index/layout.py:unpack_int4 semantics):
    UNSIGNED [0, 15] codes (the per-column scale carries the sign), so
    decoding is two masks and one lane-contiguous concat — ops run in
    int32 (Mosaic lacks int8 vector ops on this target)."""
    return jnp.concatenate(
        [packed_i32 & 0xF, packed_i32 >> 4], axis=1
    ).astype(jnp.bfloat16)


def _blockmax_epilogue(acc, valid_ref, out_ref, bmax_ref):
    mask = valid_ref[:] > 0.5  # (1, TILE_R_BM)
    masked = jnp.where(mask, acc, -jnp.inf)
    out_ref[:] = masked
    n_blocks = TILE_R_BM // BLOCK_COLS
    tile_max = jnp.concatenate(
        [
            jnp.max(
                masked[:, bi * BLOCK_COLS : (bi + 1) * BLOCK_COLS],
                axis=1,
                keepdims=True,
            )
            for bi in range(n_blocks)
        ],
        axis=1,
    )  # (tile_b, n_blocks)
    bmax_ref[:] = tile_max.T  # (n_blocks, tile_b)


def _head_blockmax_kernel(q_ref, head_ref, valid_ref, out_ref, bmax_ref):
    """(tile_b, TILE_R_BM) scores tile + its per-128-row-block maxima.

    The maxima output is TRANSPOSED, (G, B): each grid step then writes one
    full aligned (8, tile_b) block — Mosaic rejects sub-128-lane dynamic
    stores, and 8 blocks of 128 rows per tile is exactly the f32 minimum
    sublane tile, so no block is ever partially written.
    """
    acc = lax.dot_general(
        q_ref[:],
        head_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (tile_b, TILE_R_BM)
    _blockmax_epilogue(acc, valid_ref, out_ref, bmax_ref)


def _head_blockmax_kernel_i4(q_ref, head_ref, valid_ref, out_ref, bmax_ref):
    """int4 variant: the head tile arrives PACKED (TILE_R_BM, F/2) uint8 —
    half the HBM bytes of int8 — and decodes to bf16 in VMEM before the
    same matmul + blockmax epilogue."""
    dec = _decode_int4(head_ref[:].astype(jnp.int32))
    acc = lax.dot_general(
        q_ref[:],
        dec,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    _blockmax_epilogue(acc, valid_ref, out_ref, bmax_ref)


@functools.partial(jax.jit, static_argnames=("interpret",))
def head_scores_blockmax_pallas(
    q_scaled: jax.Array,  # (B, F) bfloat16 (F = 2 * F_packed for int4)
    head: jax.Array,  # (R, F) int8 OR (R, F/2) uint8 int4-packed;
    #                     R % TILE_R_BM == 0, widths % 128 == 0
    valid: jax.Array,  # (1, R) float32
    *,
    interpret: bool = False,
):
    """((B, R) f32 masked scores, (G, B) f32 per-block maxima, G = R/128)
    in ONE kernel — the separate block-max pass of the exact pruned top-k
    reads the whole (B, R) f32 score matrix back from HBM (~15 ms at FiQA
    scale on v5e); here the maxima reduce from the score tile while it is
    still in VMEM. A uint8 head is the block-packed int4 layout and
    decodes in VMEM (half the head HBM traffic of int8)."""
    r, f_head = head.shape
    b, f_logical = q_scaled.shape
    int4 = head.dtype == jnp.uint8
    kernel = _head_blockmax_kernel_i4 if int4 else _head_blockmax_kernel
    g = r // BLOCK_COLS
    n_blocks = TILE_R_BM // BLOCK_COLS
    tile_b = _pick_tile_b(b, f_logical)
    grid = (b // tile_b, r // TILE_R_BM)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, r), jnp.float32),
            jax.ShapeDtypeStruct((g, b), jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (tile_b, f_logical),
                    lambda i, j: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (TILE_R_BM, f_head),
                    lambda i, j: (j, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, TILE_R_BM),
                    lambda i, j: (0, j),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=(
                pl.BlockSpec(
                    (tile_b, TILE_R_BM),
                    lambda i, j: (i, j),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (n_blocks, tile_b),
                    lambda i, j: (j, i),
                    memory_space=pltpu.VMEM,
                ),
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * r * f_logical * b,
            bytes_accessed=(b // tile_b) * r * f_head + f_logical * b * 2
            + r * b * 4 + g * b * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q_scaled, head, valid)


def _blocktopm_epilogue(acc, valid_ref, vals_ref, lanes_ref, m):
    """Per-128-row-block top-m extraction, in VMEM, instead of writing the
    (tile_b, TILE_R_BM) score tile to HBM at all.

    m rounds of (row-max -> lowest-lane-of-max -> knock out that lane)
    per block. Ties resolve to the LOWEST lane, and equal values extract
    in lane order across rounds — exactly ``lax.top_k``'s tie order, which
    is what makes the downstream selection bit-identical to the
    full-width path (ops/topk.py:block_topk_narrow tie argument).

    The knockout rounds run in a ``lax.fori_loop`` whose carry is the
    block's (tile_b, 128) working state: Mosaic stack-allocates every
    Python-unrolled round's temporaries SIMULTANEOUSLY (~0.55 MB/round
    measured on real v5e — 19.4 MB at m=4 B=6656, 35.4 MB at m=8,
    against the 16 MB scoped limit; interpret mode hides this, and a
    VMEM-scratch round-trip did not help), whereas an scf.for body's
    temporaries are reused across iterations. Round results land in a
    (tile_b, 128)-carry vals/lanes pair via a lane-select against the
    round index, then only columns [:m] stay live across blocks.

    Outputs are TRANSPOSED (n_blocks*m, tile_b) for the same reason as
    the blockmax kernel's maxima: each grid step then writes one aligned
    (8k-sublane, full-lane) tile. Lane indices travel as f32 VALUES
    (0..127: exact)."""
    mask = valid_ref[:] > 0.5  # (1, TILE_R_BM)
    s_all = jnp.where(mask, acc, -jnp.inf)
    n_blocks = TILE_R_BM // BLOCK_COLS
    tb = acc.shape[0]
    # Mosaic's tpu.iota only produces integer vectors (a float iota fails
    # real-TPU lowering even though interpret mode accepts it); lanes
    # still travel as exact f32 values 0..127.
    iota_i = lax.broadcasted_iota(jnp.int32, (tb, BLOCK_COLS), 1)
    iota = iota_i.astype(jnp.float32)

    def round_body(ri, carry):
        s, vals, lanes = carry  # each (tb, BLOCK_COLS)
        v = jnp.max(s, axis=1, keepdims=True)  # (tb, 1)
        lane = jnp.min(
            jnp.where(s == v, iota, float(BLOCK_COLS)),
            axis=1,
            keepdims=True,
        )
        sel = iota_i == ri  # this round's result column
        vals = jnp.where(sel, v, vals)
        lanes = jnp.where(sel, lane, lanes)
        s = jnp.where(iota == lane, -jnp.inf, s)
        return s, vals, lanes

    zeros = jnp.zeros((tb, BLOCK_COLS), jnp.float32)
    val_cols = []
    lane_cols = []
    for bi in range(n_blocks):
        col = slice(bi * BLOCK_COLS, (bi + 1) * BLOCK_COLS)
        _, vals, lanes = lax.fori_loop(
            0, m, round_body, (s_all[:, col], zeros, zeros)
        )
        val_cols.append(vals[:, :m])
        lane_cols.append(lanes[:, :m])
    vals_ref[:] = jnp.concatenate(val_cols, axis=1).T
    lanes_ref[:] = jnp.concatenate(lane_cols, axis=1).T


def _make_blocktopm_kernel(m, int4):
    def kernel(q_ref, head_ref, valid_ref, vals_ref, lanes_ref):
        h = (
            _decode_int4(head_ref[:].astype(jnp.int32))
            if int4
            else head_ref[:].astype(jnp.bfloat16)
        )
        acc = lax.dot_general(
            q_ref[:],
            h,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        _blocktopm_epilogue(acc, valid_ref, vals_ref, lanes_ref, m)

    return kernel


@functools.partial(jax.jit, static_argnames=("m", "interpret"))
def head_blocktopm_pallas(
    q_scaled: jax.Array,  # (B, F) bfloat16
    head: jax.Array,  # (R, F) int8 OR (R, F/2) uint8 int4-packed
    valid: jax.Array,  # (1, R) float32
    *,
    m: int = 8,
    interpret: bool = False,
):
    """((G*m, B) f32 per-block top-m values, (G*m, B) f32 lanes), G=R/128.

    The matmul + masking + per-block top-m extraction in ONE kernel whose
    only HBM output is 2 * G*m*B floats — at m=8 that is 1/8 the bytes of
    the (B, R) score matrix, and the selection path never gathers score
    blocks from HBM again (vs blockmax: matmul writes (B,R) + maxima,
    then the pruned selection re-reads k*128 candidate lanes per query).
    The knockout rounds are an scf.for per block, not a Python unroll —
    see _blocktopm_epilogue for the measured Mosaic stack behavior."""
    r, f_head = head.shape
    b, f_logical = q_scaled.shape
    int4 = head.dtype == jnp.uint8
    g = r // BLOCK_COLS
    n_blocks = TILE_R_BM // BLOCK_COLS
    tile_b = _pick_tile_b_blocktopm(b, f_logical)
    grid = (b // tile_b, r // TILE_R_BM)
    kernel = _make_blocktopm_kernel(m, int4)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((g * m, b), jnp.float32),
            jax.ShapeDtypeStruct((g * m, b), jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (tile_b, f_logical),
                    lambda i, j: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (TILE_R_BM, f_head),
                    lambda i, j: (j, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, TILE_R_BM),
                    lambda i, j: (0, j),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=(
                pl.BlockSpec(
                    (n_blocks * m, tile_b),
                    lambda i, j: (j, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (n_blocks * m, tile_b),
                    lambda i, j: (j, i),
                    memory_space=pltpu.VMEM,
                ),
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * r * f_logical * b + (m + 4) * r * b,
            bytes_accessed=(b // tile_b) * r * f_head
            + f_logical * b * 2
            + 2 * g * m * b * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q_scaled, head, valid)


def masked_head_blocktopm(
    head: jax.Array,  # (R, F) int8 or (R, F/2) uint8 (int4-packed)
    head_scales: jax.Array,  # (F,) f32
    qhead: jax.Array,  # (B, F) f32 query counts
    valid: jax.Array,  # (R,) bool
    m: int = 8,
    interpret: bool = False,
):
    """Engine-facing fused matmul + per-block top-m: returns
    ((B, G, m) f32 values desc per block, (B, G, m) int32 GLOBAL row ids),
    G = R/128 blocks counted over the PADDED row range (padding rows are
    -inf and never selected while any real candidate remains)."""
    head, q, v, r, f, b = _pad_operands(
        head, head_scales, qhead, valid, TILE_R_BM
    )
    vals_t, lanes_t = head_blocktopm_pallas(
        q, head, v, m=m, interpret=interpret
    )
    g = head.shape[0] // BLOCK_COLS
    vals = vals_t.T.reshape(-1, g, m)[:b]
    lanes = lanes_t.T.reshape(-1, g, m)[:b]
    block_base = (
        jnp.arange(g, dtype=jnp.int32)[None, :, None] * BLOCK_COLS
    )
    rows = block_base + lanes.astype(jnp.int32)
    return vals, rows


def _pad_operands(head, head_scales, qhead, valid, tile_r):
    """Scale/round the query operand and tile-align all shapes.

    The engine pre-pads the head rows at upload (_DeviceIndex row_align),
    so the head pads here are no-ops on the hot path — this keeps the
    wrappers correct for direct/test callers with unaligned shapes.

    int4 heads (uint8, block-packed): the packed width must already be
    lane-aligned (pack-time padding would shift the hi-nibble block's
    logical offset); the query operand pads to 2x the packed width with
    zeros so its columns line up with the decoded [lo | hi] layout."""
    r, f_head = head.shape
    b = qhead.shape[0]
    int4 = head.dtype == jnp.uint8
    pad_r = (-r) % tile_r
    pad_b = (-b) % TILE_B
    q = (qhead * head_scales[None, :]).astype(jnp.bfloat16)
    if int4:
        if f_head % 128:
            raise ValueError(
                "int4 Pallas head needs a 128-aligned packed width "
                f"(got {f_head}); use the XLA backend for odd shapes"
            )
        pad_q = 2 * f_head - q.shape[1]
        if pad_q:
            q = jnp.pad(q, ((0, 0), (0, pad_q)))
    else:
        pad_f = (-f_head) % 128
        if pad_f:
            head = jnp.pad(head, ((0, 0), (0, pad_f)))
            q = jnp.pad(q, ((0, 0), (0, pad_f)))
    if pad_r:
        head = jnp.pad(head, ((0, pad_r), (0, 0)))
    if pad_b:
        q = jnp.pad(q, ((0, pad_b), (0, 0)))
    v = jnp.pad(valid.astype(jnp.float32), (0, pad_r))[None, :]
    return head, q, v, r, head.shape[1], b


def masked_head_scores_blockmax(
    head: jax.Array,  # (R, F) int8
    head_scales: jax.Array,  # (F,) f32
    qhead: jax.Array,  # (B, F) f32 query counts
    valid: jax.Array,  # (R,) bool
    interpret: bool = False,
):
    """Engine-facing fused scores+blockmax: returns
    ((B, R) f32 scores, (B, G) f32 block maxima), G = ceil(R / 128).
    Block g covers rows [g*128, (g+1)*128); rows beyond R are -inf
    (alignment padding is masked inside the kernel)."""
    head, q, v, r, f, b = _pad_operands(
        head, head_scales, qhead, valid, TILE_R_BM
    )
    out, bmax = head_scores_blockmax_pallas(q, head, v, interpret=interpret)
    g = -(-r // BLOCK_COLS)
    return out[:b, :r], bmax.T[:b, :g]


def masked_head_scores(
    head: jax.Array,  # (R, F) int8
    head_scales: jax.Array,  # (F,) f32
    qhead: jax.Array,  # (B, F) f32 query counts
    valid: jax.Array,  # (R,) bool
    interpret: bool = False,
) -> jax.Array:
    """Engine-facing wrapper: scale/round queries, pad to tiles, call the
    kernel, slice back. Drop-in for
    ``where(valid[None, :], ops.bm25.head_scores(...), -inf)`` in int8
    mode. int8 ONLY — int4 callers must use the blockmax variant or the
    XLA decode path (matmulling raw packed bytes would be garbage)."""
    if head.dtype == jnp.uint8:
        raise ValueError(
            "masked_head_scores has no int4 kernel; use "
            "masked_head_scores_blockmax or the XLA path"
        )
    head, q, v, r, f, b = _pad_operands(
        head, head_scales, qhead, valid, TILE_R
    )
    out = head_scores_pallas(q, head, v, interpret=interpret)
    return out[:b, :r]
