"""Pallas (Mosaic) kernel for the fused sparse-head scoring matmul.

This is the BM25/TF-IDF batched scoring contraction of
osr_tpu/ops/bm25.py:head_scores — the north-star "int8/bf16 sparse-dense
matmul on the MXU" (the dense head IS the sparse term matrix over the
high-df id range, with the BM25 saturation precomputed into its values;
see osr_tpu/index/layout.py). One kernel fuses, per (row tile, query tile):

  1. int8 head tile load (HBM -> VMEM, no bf16 copy ever materialized
     in HBM — the XLA path's convert-then-dot reads 2x the bytes),
  2. upcast + MXU matmul against the per-column-SCALED bf16 query tile
     (the per-column int8 scales fold into the query side:
     ``(A diag(s)) @ q == A @ (s*q)``),
  3. f32 accumulation and the validity mask (-inf on padding rows),

writing the (R, B) f32 score matrix directly. The whole head dimension F
(<= 4096 by layout policy) fits VMEM alongside the row tile, so no K-loop
is needed: VMEM use = TR*F int8 + F*TB bf16 + TR*TB f32 ~= 1.7 MB at the
default tiles.

Numerics match osr_tpu/ops/bm25.py:head_scores (int8 mode) exactly: same
bf16 operand rounding, f32 accumulation (tests/test_pallas_kernels.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_R = 256
TILE_B = 128


def _head_kernel(head_ref, q_ref, valid_ref, out_ref):
    """One (TILE_R, TILE_B) output tile: upcast-int8 matmul + mask."""
    acc = jnp.dot(
        head_ref[:].astype(jnp.bfloat16),
        q_ref[:],
        preferred_element_type=jnp.float32,
    )
    # f32 mask: Mosaic has no int8 vector comparison on this target.
    mask = valid_ref[:] > 0.5  # (TILE_R, 1)
    out_ref[:] = jnp.where(mask, acc, -jnp.inf)


@functools.partial(jax.jit, static_argnames=("interpret",))
def head_scores_pallas(
    head: jax.Array,  # (R, F) int8, R % TILE_R == 0, F % 128 == 0
    q_scaled: jax.Array,  # (F, B) bfloat16 (counts * per-column scales)
    valid: jax.Array,  # (R, 1) float32 (1.0 = real row)
    *,
    interpret: bool = False,
) -> jax.Array:
    """(R, B) f32 masked head scores. Shapes must be pre-padded (the
    engine-facing wrapper below handles padding)."""
    r, f = head.shape
    b = q_scaled.shape[1]
    grid = (r // TILE_R, b // TILE_B)
    return pl.pallas_call(
        _head_kernel,
        out_shape=jax.ShapeDtypeStruct((r, b), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (TILE_R, f),
                    lambda i, j: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (f, TILE_B),
                    lambda i, j: (0, j),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (TILE_R, 1),
                    lambda i, j: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (TILE_R, TILE_B),
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
    )(head, q_scaled, valid)


def masked_head_scores(
    head: jax.Array,  # (R, F) int8
    head_scales: jax.Array,  # (F,) f32
    qhead: jax.Array,  # (F, B) f32 query counts
    valid: jax.Array,  # (R,) bool
    interpret: bool = False,
) -> jax.Array:
    """Engine-facing wrapper: scale/round queries, pad to tiles, call the
    kernel, slice back. Drop-in for
    ``where(valid, ops.bm25.head_scores(...), -inf)`` in int8 mode."""
    r, f = head.shape
    b = qhead.shape[1]
    pad_r = (-r) % TILE_R
    pad_b = (-b) % TILE_B
    pad_f = (-f) % 128
    q = (qhead * head_scales[:, None]).astype(jnp.bfloat16)
    if pad_f:
        head = jnp.pad(head, ((0, 0), (0, pad_f)))
        q = jnp.pad(q, ((0, pad_f), (0, 0)))
    if pad_r:
        head = jnp.pad(head, ((0, pad_r), (0, 0)))
    if pad_b:
        q = jnp.pad(q, ((0, 0), (0, pad_b)))
    v = jnp.pad(valid.astype(jnp.float32), (0, pad_r))[:, None]
    out = head_scores_pallas(head, q, v, interpret=interpret)
    return out[:r, :b]
