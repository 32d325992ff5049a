"""Pallas (Mosaic) TPU kernels.

Where Pallas is used — and where it deliberately isn't:

- Quantization (pallas/quantize.py): fused absmax-reduce + scale + round
  in one VMEM pass, with optional hardware stochastic rounding
  (pltpu.prng + stochastic_round) that the XLA path cannot express.
- INT8 similarity (pallas/matmul.py): blocked MXU matmul with the
  per-row dequantization epilogue fused into the output tile — the
  production path behind ``DenseSearchEngine(backend='pallas')``.
- Sparse-tail scoring stays on the XLA gather path (osr_tpu/ops/bm25.py):
  Mosaic in this toolchain does not lower arbitrary-index row gathers
  (``table[idx_2d]`` / flat ``jnp.take`` / broadcast ``take_along_axis``
  all fail to lower), so a VMEM-resident gather kernel is not expressible;
  per-row DMA would be latency-bound. Revisit when dynamic_gather lands.
"""

from osr_tpu.ops.pallas.quantize import (
    quantize_symmetric_pallas,
    dequantize_symmetric_pallas,
)
from osr_tpu.ops.pallas.matmul import int8_similarity_pallas

__all__ = [
    "quantize_symmetric_pallas",
    "dequantize_symmetric_pallas",
    "int8_similarity_pallas",
]
