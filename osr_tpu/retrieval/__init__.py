from osr_tpu.retrieval.engine import SparseSearchEngine, DenseSearchEngine
from osr_tpu.retrieval.registry import RetrieverRegistry

__all__ = ["SparseSearchEngine", "DenseSearchEngine", "RetrieverRegistry"]
