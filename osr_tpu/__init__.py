"""osr_tpu — a TPU-native optimized sparse-retrieval framework for RAG pipelines.

A from-scratch reimplementation of the capabilities of
`nytdevansh/Optimized-Sparse-Retrieval-for-High-Performance-RAG-Pipelines`
designed TPU-first:

- The reference's Numba CSR BM25/TF-IDF kernels (reference
  rag_system/core/retrieval.py:41-93) become a single jit/Pallas scoring path
  over a bucketed padded (ELL) index layout resident in HBM, scoring a query
  *batch* per dispatch instead of one query at a time.
- The reference's argpartition top-k (reference retrieval.py:79-93) becomes
  `lax.top_k` with hierarchical per-bucket/per-shard merge.
- The reference's INT8 Numba dot product (reference
  rag_system/core/retriever_registry.py:90-117) becomes an int8 MXU matmul
  with fused dequantization.
- Single-process scaling becomes `jax.sharding.Mesh` + `shard_map` document
  sharding with collective top-k merge over ICI.

One engine, not three: the reference implements its retrieval engine three
times (retrieval.py, retriever_registry.py, pipeline/evaluate_rag_pipeline.py);
here there is exactly one (`osr_tpu.retrieval.engine`).
"""

__version__ = "0.1.0"

from osr_tpu.index.tokenizer import tokenize, Tokenizer
from osr_tpu.index.builder import SparseIndexBuilder, SparseIndex
from osr_tpu.retrieval.engine import SparseSearchEngine, DenseSearchEngine
from osr_tpu.retrieval.service import RetrievalService
from osr_tpu.retrieval.registry import RetrieverRegistry
from osr_tpu.readers.registry import ReaderRegistry

__all__ = [
    "tokenize",
    "Tokenizer",
    "SparseIndexBuilder",
    "SparseIndex",
    "SparseSearchEngine",
    "DenseSearchEngine",
    "RetrievalService",
    "RetrieverRegistry",
    "ReaderRegistry",
    "__version__",
]
