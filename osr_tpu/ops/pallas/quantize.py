"""Pallas symmetric INT8 quantization kernels.

One VMEM pass per row block: absmax reduce, scale, round (deterministic or
hardware stochastic rounding), int8 write — the fused form of
osr_tpu/ops/quantize.py:quantize_symmetric. Stochastic rounding uses the
per-core PRNG (pltpu.prng_seed / prng_random_bits) and makes quantization
unbiased, which matters when quantized embeddings feed further training.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-8
_BLOCK_ROWS = 256


def _quant_kernel(x_ref, values_ref, scales_ref):
    x = x_ref[:]
    absmax = jnp.maximum(jnp.max(jnp.abs(x), axis=1, keepdims=True), _EPS)
    scale = absmax / 127.0  # (block, 1)
    values_ref[:] = jnp.round(x / scale).astype(jnp.int8)
    scales_ref[:] = scale.astype(jnp.float32)


def _quant_kernel_stochastic(seed_ref, x_ref, values_ref, scales_ref):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    x = x_ref[:]
    absmax = jnp.maximum(jnp.max(jnp.abs(x), axis=1, keepdims=True), _EPS)
    scale = absmax / 127.0  # (block, 1)
    scaled = x / scale
    bits = pltpu.bitcast(pltpu.prng_random_bits(scaled.shape), jnp.uint32)
    # Stochastic round to int8 via f32->bf16-style rounding on the scaled
    # values, then clamp into the symmetric int8 range.
    floor = jnp.floor(scaled)
    frac = scaled - floor
    # Mosaic has no uint32->f32 cast; the top 24 bits fit in a non-negative
    # int32, which does cast.
    u24 = pltpu.bitcast(bits >> 8, jnp.int32)
    u = u24.astype(jnp.float32) / jnp.float32(1 << 24)  # [0, 1)
    rounded = floor + (u < frac).astype(jnp.float32)
    values_ref[:] = jnp.clip(rounded, -127, 127).astype(jnp.int8)
    scales_ref[:] = scale.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("stochastic", "interpret"))
def quantize_symmetric_pallas(
    x: jax.Array,  # (N, D) float32
    seed: Optional[jax.Array] = None,  # (1,) int32, required when stochastic
    *,
    stochastic: bool = False,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Per-row symmetric int8 quantization as a Pallas kernel.

    Returns (values int8 (N, D), scales f32 (N,)). Rows are processed in
    _BLOCK_ROWS-row grid steps; N must be a multiple of 8 (pad upstream).
    """
    n, d = x.shape
    block = min(_BLOCK_ROWS, n)
    grid = (pl.cdiv(n, block),)

    if stochastic:
        if seed is None:
            seed = jnp.zeros((1,), jnp.int32)
        # Index maps under PrefetchScalarGridSpec also receive the
        # scalar-prefetch refs; accept and ignore them.
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block, d), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((block, d), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((block, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            ],
        )
        values, scales = pl.pallas_call(
            _quant_kernel_stochastic,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((n, d), jnp.int8),
                jax.ShapeDtypeStruct((n, 1), jnp.float32),
            ),
            interpret=interpret,
        )(seed, x)
        return values, scales[:, 0]

    values, scales = pl.pallas_call(
        _quant_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=[
            pl.BlockSpec((block, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((n, d), jnp.int8),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ),
        interpret=interpret,
    )(x)
    return values, scales[:, 0]


def _dequant_kernel(values_ref, scales_ref, out_ref):
    out_ref[:] = values_ref[:].astype(jnp.float32) * scales_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def dequantize_symmetric_pallas(
    values: jax.Array,  # (N, D) int8
    scales: jax.Array,  # (N,) float32
    *,
    interpret: bool = False,
) -> jax.Array:
    n, d = values.shape
    block = min(_BLOCK_ROWS, n)
    return pl.pallas_call(
        _dequant_kernel,
        grid=(pl.cdiv(n, block),),
        in_specs=[
            pl.BlockSpec((block, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block, d), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, d), jnp.float32),
        interpret=interpret,
    )(values, scales[:, None])
