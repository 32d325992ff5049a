"""Pallas INT8 similarity matmul with fused dequantization epilogue.

Blocked (B, D) int8 x (N, D) int8 -> (B, N) float32 on the MXU, with the
per-row scale product applied to each output tile before it leaves VMEM —
the fused form of osr_tpu/ops/quantize.py:int8_dot_product_batch. The
contraction accumulates in int32 (exact: |D| * 127^2 fits easily), so the
only rounding is the final f32 scale multiply.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Output tile. 128 lanes; the B (query) tile rides the sublane dimension.
_TILE_B = 128
_TILE_N = 128


def _kernel(q_ref, d_ref, qs_ref, ds_ref, out_ref):
    acc = jax.lax.dot_general(
        q_ref[:],
        d_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (tile_b, tile_n) int32
    out_ref[:] = (
        acc.astype(jnp.float32) * qs_ref[:] * ds_ref[:].reshape(1, -1)
    )


def _kernel_i4(q_ref, d_ref, qs_ref, ds_ref, out_ref):
    """int4 variant: the doc tile arrives PACKED (tile_n, D/2) uint8 and
    is decoded to SIGNED int8 codes in VMEM (quantize.py:
    unpack_int4_signed semantics — ``(v ^ 8) - 8`` sign-extends a
    two's-complement nibble), so packed bytes are all that ever crosses
    HBM for the corpus side."""
    p = d_ref[:].astype(jnp.int32)
    dec = jnp.concatenate(
        [((p & 0xF) ^ 8) - 8, ((p >> 4) ^ 8) - 8], axis=1
    ).astype(jnp.int8)
    acc = jax.lax.dot_general(
        q_ref[:],
        dec,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out_ref[:] = (
        acc.astype(jnp.float32) * qs_ref[:] * ds_ref[:].reshape(1, -1)
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def int4_similarity_pallas(
    q_int8: jax.Array,  # (B, D) int8
    d_packed: jax.Array,  # (N, D/2) uint8, signed-nibble block-packed
    q_scales: jax.Array,  # (B,) float32
    d_scales: jax.Array,  # (N,) float32
    *,
    interpret: bool = False,
) -> jax.Array:
    """Dequantized similarity matrix (B, N) float32 from an int4-packed
    corpus. Same tiling contract as :func:`int8_similarity_pallas`; the
    packed width D/2 must be lane-aligned (128) so the hi-nibble block's
    logical columns stay lane-contiguous after the in-VMEM concat."""
    b, d = q_int8.shape
    n, half = d_packed.shape
    if half * 2 != d:
        raise ValueError(f"packed width {half} != D/2 for D={d}")
    if half % 128:
        raise ValueError(
            f"int4 packed width must be lane-aligned (128): {half}"
        )
    tb, tn = min(_TILE_B, b), min(_TILE_N, n)
    grid = (pl.cdiv(b, tb), pl.cdiv(n, tn))
    return pl.pallas_call(
        _kernel_i4,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tn, half), lambda i, j: (j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((tb, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tb, tn), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d,
            bytes_accessed=b * d + n * half + b * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q_int8, d_packed, q_scales[:, None], d_scales[:, None])


@functools.partial(jax.jit, static_argnames=("interpret",))
def int8_similarity_pallas(
    q_int8: jax.Array,  # (B, D) int8
    d_int8: jax.Array,  # (N, D) int8
    q_scales: jax.Array,  # (B,) float32
    d_scales: jax.Array,  # (N,) float32
    *,
    interpret: bool = False,
) -> jax.Array:
    """Dequantized similarity matrix (B, N) float32.

    B and N must be multiples of the 128-tile (pad upstream); D is loaded
    whole per tile (int8 rows are cheap: a 128 x D tile at D=4096 is 512KB).
    """
    b, d = q_int8.shape
    n = d_int8.shape[0]
    tb, tn = min(_TILE_B, b), min(_TILE_N, n)
    grid = (pl.cdiv(b, tb), pl.cdiv(n, tn))
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tb, tn), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d,
            bytes_accessed=b * d + n * d + b * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q_int8, d_int8, q_scales[:, None], d_scales[:, None])
