from osr_tpu.retrieval.engine import SparseSearchEngine, DenseSearchEngine
from osr_tpu.retrieval.registry import RetrieverRegistry
from osr_tpu.retrieval.service import RetrievalService

__all__ = [
    "SparseSearchEngine",
    "DenseSearchEngine",
    "RetrieverRegistry",
    "RetrievalService",
]
