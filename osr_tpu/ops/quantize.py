"""INT8 embedding quantization and quantized similarity search on the MXU.

TPU-native replacement for the reference's Numba quantization tier
(reference tests/embedding_quantizations.py:17-173 and
rag_system/core/retriever_registry.py:90-117,435-463):

- symmetric per-vector quantization: absmax -> int8 in [-127, 127]
- asymmetric per-vector quantization: [min, max] -> uint8 in [0, 255] with a
  per-vector zero offset
- batched quantized similarity = an int8 x int8 matmul accumulated in int32
  on the MXU (``preferred_element_type=jnp.int32``) with a fused dequant
  epilogue — where the reference's int8 loop measured 0.19x vs fp32 NumPy
  (BASELINE.md), the MXU natively runs int8 at full throughput.

Note: the reference's retriever stores the symmetric scale as the raw absmax
on the corpus side but absmax/127 on the query side (reference
retriever_registry.py:447,485), making its scores a constant 127x off —
harmless for ranking but wrong as dot products. Here the scale is
consistently ``absmax / 127`` so dequantized scores approximate the true
fp32 dot product (validated in tests/test_quantize.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

_EPS = 1e-8


@jax.jit
def quantize_symmetric(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-row symmetric int8 quantization.

    Returns (values int8 (N, D), scales float32 (N,)) with
    ``x ≈ values * scales[:, None]``.
    """
    absmax = jnp.maximum(jnp.max(jnp.abs(x), axis=-1), _EPS)
    scales = (absmax / 127.0).astype(jnp.float32)
    values = jnp.round(x / scales[..., None]).astype(jnp.int8)
    return values, scales


@jax.jit
def dequantize_symmetric(values: jax.Array, scales: jax.Array) -> jax.Array:
    return values.astype(jnp.float32) * scales[..., None]


@jax.jit
def quantize_symmetric_int4(
    x: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Per-row symmetric int4 quantization, block-packed two codes/byte.

    Returns (packed uint8 (N, D/2), scales float32 (N,)) with
    ``x ≈ unpack_int4_signed(packed) * scales[:, None]``. Codes are SIGNED
    nibbles in [-7, 7] stored two's-complement (embeddings mix signs
    per-element, so the sparse head's unsigned-code/sign-in-scale trick
    — index/layout.py:unpack_int4 — does not apply here). Block packing
    (low nibble of byte c = logical column c, high nibble = column
    c + D/2, matching the head's convention) lets the device kernel
    decode with one lane-contiguous concat instead of a lane shuffle.
    D must be even (embedding dims are).
    """
    d = x.shape[-1]
    if d % 2:
        raise ValueError(f"int4 packing needs an even dim (got {d})")
    absmax = jnp.maximum(jnp.max(jnp.abs(x), axis=-1), _EPS)
    scales = (absmax / 7.0).astype(jnp.float32)
    codes = jnp.clip(
        jnp.round(x / scales[..., None]), -7, 7
    ).astype(jnp.int32)
    half = d // 2
    lo = codes[..., :half] & 0xF
    hi = codes[..., half:] & 0xF
    return (lo | (hi << 4)).astype(jnp.uint8), scales


@functools.partial(jax.jit, static_argnames=("group_size",))
def quantize_symmetric_int4_grouped(
    x: jax.Array, *, group_size: int = 128
) -> Tuple[jax.Array, jax.Array]:
    """Per-(row, column-group) symmetric int4 quantization.

    Per-ROW single-scale int4 loses ~24% nDCG@10 on dense embeddings
    (bench_results/dense_encoder.json r4: 0.1908 fp32 -> 0.1454 int4):
    one outlier component per vector inflates the whole row's scale and
    crushes every other component into 1-2 codes. Group-wise scales
    (one absmax per ``group_size`` contiguous columns, the GPTQ/AWQ
    convention) bound each outlier's blast radius to its own group.

    Returns (packed uint8 (N, D/2), scales float32 (N, D/group_size))
    with ``x ≈ unpack_int4_signed(packed).reshape(N, G, group) *
    scales[..., None]``. Packing layout is IDENTICAL to
    :func:`quantize_symmetric_int4` (lo nibble = column c, hi nibble =
    column c + D/2), so the same decode serves both; only the scale
    granularity differs. D must be divisible by 2*group_size so both
    packing halves split on group boundaries.
    """
    d = x.shape[-1]
    if d % 2 or d % group_size:
        # Packing (col c pairs with c + d/2) and scale grouping act on
        # the SAME original column order independently, so the only
        # constraints are an even dim and whole groups.
        raise ValueError(
            f"dim {d} must be even and divisible by group_size="
            f"{group_size}"
        )
    g = d // group_size
    xg = x.reshape(*x.shape[:-1], g, group_size)
    absmax = jnp.maximum(jnp.max(jnp.abs(xg), axis=-1), _EPS)
    scales = (absmax / 7.0).astype(jnp.float32)  # (N, G)
    codes = (
        jnp.clip(jnp.round(xg / scales[..., None]), -7, 7)
        .astype(jnp.int32)
        .reshape(*x.shape[:-1], d)
    )
    half = d // 2
    lo = codes[..., :half] & 0xF
    hi = codes[..., half:] & 0xF
    return (lo | (hi << 4)).astype(jnp.uint8), scales


def quantize_symmetric_int4_grouped_np(
    x, *, group_size: int = 128
) -> Tuple["np.ndarray", "np.ndarray"]:
    """NumPy twin of :func:`quantize_symmetric_int4_grouped` for
    host-side pre-quantization (``DenseSearchEngine.from_quantized``)."""
    import numpy as np

    x = np.asarray(x, np.float32)
    d = x.shape[-1]
    if d % 2 or d % group_size:
        raise ValueError(
            f"dim {d} must be even and divisible by group_size="
            f"{group_size}"
        )
    g = d // group_size
    xg = x.reshape(*x.shape[:-1], g, group_size)
    absmax = np.maximum(np.abs(xg).max(axis=-1), _EPS)
    scales = (absmax / 7.0).astype(np.float32)
    codes = (
        np.clip(np.round(xg / scales[..., None]), -7, 7)
        .astype(np.int32)
        .reshape(*x.shape[:-1], d)
    )
    half = d // 2
    lo = codes[..., :half] & 0xF
    hi = codes[..., half:] & 0xF
    return (lo | (hi << 4)).astype(np.uint8), scales


@functools.partial(jax.jit, static_argnames=("k", "packed", "group_size"))
def int4_search_symmetric_grouped(
    queries_fp32: jax.Array,  # (B, D)
    docs_packed: jax.Array,  # (N, D/2) uint8, block-packed signed nibbles
    doc_scales: jax.Array,  # (N, G) per-(row, group) scales
    *,
    k: int,
    packed: bool = False,
    group_size: int = 128,
):
    """Group-wise int4 symmetric quantized search (XLA backend).

    Per-group doc scales cannot fold into a rank-1 epilogue, so the
    contraction runs as a G-batched matmul — (G, B, Dg) x (G, N, Dg) ->
    (G, B, N) with f32 accumulation — followed by the per-(doc, group)
    scale contraction sum_g acc[g] * scales[:, g]. Same MXU FLOPs as the
    single matmul; the (G, B, N) intermediate costs G bandwidth passes,
    which at retrieval shapes is dwarfed by the selection (measured in
    bench_results/dense_encoder.json r5 rows). Queries ride bf16 (the
    sparse head's convention, <=0.4% relative)."""
    b, d = queries_fp32.shape
    g = d // group_size
    codes = unpack_int4_signed(docs_packed)  # (N, D) int8
    n = codes.shape[0]
    qg = jnp.moveaxis(
        queries_fp32.astype(jnp.bfloat16).reshape(b, g, group_size), 1, 0
    )  # (G, B, Dg)
    cg = jnp.moveaxis(
        codes.astype(jnp.bfloat16).reshape(n, g, group_size), 1, 0
    )  # (G, N, Dg)
    acc = lax.dot_general(
        qg,
        cg,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (G, B, N)
    sims = jnp.einsum("gbn,ng->bn", acc, doc_scales)
    vals, ids = _select_topk(sims, k)
    return _pack_result(vals, ids) if packed else (vals, ids)


@jax.jit
def unpack_int4_signed(packed: jax.Array) -> jax.Array:
    """Decode block-packed SIGNED int4 (quantize_symmetric_int4 layout)
    to int8 codes (N, 2 * packed.shape[-1]). The ``(v ^ 8) - 8`` form
    sign-extends a two's-complement nibble without an arithmetic shift."""
    p = packed.astype(jnp.int32)
    lo = ((p & 0xF) ^ 8) - 8
    hi = ((p >> 4) ^ 8) - 8
    return jnp.concatenate([lo, hi], axis=-1).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("k", "packed"))
def int4_search_symmetric(
    queries_fp32: jax.Array,  # (B, D)
    docs_packed: jax.Array,  # (N, D/2) uint8, signed-nibble block-packed
    doc_scales: jax.Array,  # (N,)
    *,
    k: int,
    packed: bool = False,
):
    """int4 symmetric quantized search (XLA backend).

    Queries stay int8 (they are few and transient); only the resident
    corpus side is nibble-packed, which is where the HBM halving pays.
    The decode materializes a transient (N, D) int8 tile stream that XLA
    fuses into the matmul's operand pipeline; the RESIDENT index stays
    D/2 bytes per row. For VMEM-decode with no HBM transient at all, use
    the Pallas backend (ops/pallas/matmul.py:int4_similarity_pallas).
    """
    q_int8, q_scales = quantize_symmetric(queries_fp32)
    sims = int8_dot_product_batch(
        q_int8, unpack_int4_signed(docs_packed), q_scales, doc_scales
    )
    vals, ids = _select_topk(sims, k)
    return _pack_result(vals, ids) if packed else (vals, ids)


def quantize_symmetric_np(x) -> Tuple["np.ndarray", "np.ndarray"]:
    """NumPy twin of :func:`quantize_symmetric` (codes identical; scales
    within 1 f32 ulp — XLA lowers the /127 as a reciprocal multiply)
    for host-side pre-quantization: at corpus scale the fp32 matrix never
    has to exist on (or travel to) the device —
    ``DenseSearchEngine.from_quantized`` uploads only the int8 bytes."""
    import numpy as np

    x = np.asarray(x, np.float32)
    absmax = np.maximum(np.abs(x).max(axis=-1), _EPS)
    scales = (absmax / 127.0).astype(np.float32)
    values = np.round(x / scales[..., None]).astype(np.int8)
    return values, scales


def quantize_symmetric_int4_np(x) -> Tuple["np.ndarray", "np.ndarray"]:
    """NumPy twin of :func:`quantize_symmetric_int4` (same block packing
    and signed-nibble encoding) for host-side pre-quantization."""
    import numpy as np

    x = np.asarray(x, np.float32)
    d = x.shape[-1]
    if d % 2:
        raise ValueError(f"int4 packing needs an even dim (got {d})")
    absmax = np.maximum(np.abs(x).max(axis=-1), _EPS)
    scales = (absmax / 7.0).astype(np.float32)
    codes = np.clip(np.round(x / scales[..., None]), -7, 7).astype(np.int32)
    half = d // 2
    lo = codes[..., :half] & 0xF
    hi = codes[..., half:] & 0xF
    return (lo | (hi << 4)).astype(np.uint8), scales


@jax.jit
def quantize_asymmetric(
    x: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-row asymmetric uint8 quantization.

    Returns (values uint8 (N, D), scales float32 (N,), mins float32 (N,))
    with ``x ≈ values * scales[:, None] + mins[:, None]`` (reference
    tests/embedding_quantizations.py:62-107 semantics).
    """
    mins = jnp.min(x, axis=-1)
    maxs = jnp.max(x, axis=-1)
    scales = jnp.maximum((maxs - mins) / 255.0, _EPS).astype(jnp.float32)
    values = jnp.clip(
        jnp.round((x - mins[..., None]) / scales[..., None]), 0, 255
    ).astype(jnp.uint8)
    return values, scales, mins.astype(jnp.float32)


@jax.jit
def dequantize_asymmetric(
    values: jax.Array, scales: jax.Array, mins: jax.Array
) -> jax.Array:
    return values.astype(jnp.float32) * scales[..., None] + mins[..., None]


@jax.jit
def int8_matmul(q_int8: jax.Array, d_int8: jax.Array) -> jax.Array:
    """(B, D) int8 x (N, D) int8 -> (B, N) int32 on the MXU."""
    return lax.dot_general(
        q_int8,
        d_int8,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


@jax.jit
def int8_dot_product_batch(
    q_int8: jax.Array,
    d_int8: jax.Array,
    q_scales: jax.Array,
    d_scales: jax.Array,
) -> jax.Array:
    """Dequantized similarity matrix (B, N) float32.

    Equivalent of reference ``quantized_dot_product_batch``
    (retriever_registry.py:90-117) as one MXU matmul + rank-1 rescale.
    """
    acc = int8_matmul(q_int8, d_int8)
    return acc.astype(jnp.float32) * q_scales[:, None] * d_scales[None, :]


@jax.jit
def int8_cosine_similarity(
    q_int8: jax.Array,
    d_int8: jax.Array,
    q_scales: jax.Array,
    d_scales: jax.Array,
) -> jax.Array:
    """Cosine similarity from int8 inputs (reference
    tests/embedding_quantizations.py:147-173 semantics): dequantized dot
    normalized by dequantized norms."""
    dots = int8_dot_product_batch(q_int8, d_int8, q_scales, d_scales)
    qn = jnp.linalg.norm(
        q_int8.astype(jnp.float32) * q_scales[:, None], axis=-1
    )
    dn = jnp.linalg.norm(
        d_int8.astype(jnp.float32) * d_scales[:, None], axis=-1
    )
    return dots / jnp.maximum(qn[:, None] * dn[None, :], _EPS)


def _select_topk(sims: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k over the similarity matrix.

    Wide candidate axes route through the block-max-pruned exact selection
    (osr_tpu/ops/topk.py:block_topk): plain ``lax.top_k`` is sort-cost-bound
    in the candidate width (~100 ms at (6656, 57640) on v5e vs ~28 ms
    block-pruned — DEVELOPMENT.md primitive table). Narrow axes keep the
    single primitive (the pruning pass would not pay for itself). The
    shape test runs at trace time, so each compiled program contains
    exactly one path.
    """
    kk = min(k, sims.shape[-1])
    if sims.shape[-1] >= 16 * 128:
        from osr_tpu.ops.topk import block_topk

        return block_topk(sims, k=kk)
    return lax.top_k(sims, kk)


def _pack_result(vals: jax.Array, ids: jax.Array) -> jax.Array:
    """Pack (B, k) scores + (B, k) indices into ONE (B, 2k) f32 array.

    The dev tunnel charges a ~30 ms fixed cost per transfer, so results
    travel as a single fetch; indices are carried as f32 VALUES (exact for
    N < 2^24 — the caller guards) because int32 bitcast into an f32 buffer
    would be flushed as denormals on TPU (DEVELOPMENT.md pitfalls).
    """
    return jnp.concatenate([vals, ids.astype(jnp.float32)], axis=-1)


@functools.partial(jax.jit, static_argnames=("k", "packed"))
def int8_search_symmetric(
    queries_fp32: jax.Array,  # (B, D)
    docs_int8: jax.Array,  # (N, D)
    doc_scales: jax.Array,  # (N,)
    *,
    k: int,
    packed: bool = False,
):
    """Quantize queries symmetrically, score on the MXU, top-k.

    ``packed=True`` returns one (B, 2k) f32 array (scores ‖ indices) for a
    single-transfer fetch; default returns the (scores, indices) tuple.
    """
    q_int8, q_scales = quantize_symmetric(queries_fp32)
    sims = int8_dot_product_batch(q_int8, docs_int8, q_scales, doc_scales)
    vals, ids = _select_topk(sims, k)
    return _pack_result(vals, ids) if packed else (vals, ids)


@functools.partial(jax.jit, static_argnames=("k", "packed"))
def int8_search_asymmetric(
    queries_fp32: jax.Array,  # (B, D)
    docs_u8: jax.Array,  # (N, D) uint8
    doc_scales: jax.Array,  # (N,)
    doc_mins: jax.Array,  # (N,)
    *,
    k: int,
    packed: bool = False,
):
    """Asymmetric quantized search.

    With q = uq*qs + qm and d = ud*ds + dm (per-vector affine dequant),
    q . d expands into one uint8 matmul plus rank-1 terms using the
    precomputable per-vector element sums — all fused here:

        q.d = qs*ds*(uq.ud) + qs*dm*sum(uq) + ds*qm*sum(ud) + D*qm*dm
    """
    dim = queries_fp32.shape[-1]
    uq, qs, qm = quantize_asymmetric(queries_fp32)
    acc = lax.dot_general(
        uq.astype(jnp.int32),
        docs_u8.astype(jnp.int32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    sum_uq = jnp.sum(uq.astype(jnp.float32), axis=-1)  # (B,)
    sum_ud = jnp.sum(docs_u8.astype(jnp.float32), axis=-1)  # (N,)
    sims = (
        acc * qs[:, None] * doc_scales[None, :]
        + (qs * sum_uq)[:, None] * doc_mins[None, :]
        + qm[:, None] * (doc_scales * sum_ud)[None, :]
        + dim * qm[:, None] * doc_mins[None, :]
    )
    vals, ids = _select_topk(sims, k)
    return _pack_result(vals, ids) if packed else (vals, ids)


@functools.partial(jax.jit, static_argnames=("k", "packed"))
def fp_search(
    queries: jax.Array, docs: jax.Array, *, k: int, packed: bool = False
):
    """Full-precision dense search (reference retrieval.py:402-436 path)."""
    sims = lax.dot_general(
        queries,
        docs,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    vals, ids = _select_topk(sims, k)
    return _pack_result(vals, ids) if packed else (vals, ids)
