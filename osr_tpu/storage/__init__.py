from osr_tpu.storage.documents import Document, CorpusProcessor
from osr_tpu.storage.doc_store import DocumentStore, LRUCache
from osr_tpu.storage.loaders import (
    load_corpus,
    load_queries,
    load_qrels,
    validate_dataset,
    compute_dataset_stats,
)

__all__ = [
    "Document",
    "CorpusProcessor",
    "DocumentStore",
    "LRUCache",
    "load_corpus",
    "load_queries",
    "load_qrels",
    "validate_dataset",
    "compute_dataset_stats",
]
