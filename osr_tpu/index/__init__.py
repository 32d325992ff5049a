from osr_tpu.index.tokenizer import tokenize, Tokenizer
from osr_tpu.index.builder import SparseIndexBuilder, SparseIndex
from osr_tpu.index.layout import HybridLayout, TailBucket, pack_hybrid

__all__ = [
    "tokenize",
    "Tokenizer",
    "SparseIndexBuilder",
    "SparseIndex",
    "HybridLayout",
    "TailBucket",
    "pack_hybrid",
]
