from osr_tpu.index.tokenizer import tokenize, Tokenizer
from osr_tpu.index.builder import SparseIndexBuilder, SparseIndex
from osr_tpu.index.layout import BucketedEllIndex, EllBucket, pack_ell

__all__ = [
    "tokenize",
    "Tokenizer",
    "SparseIndexBuilder",
    "SparseIndex",
    "BucketedEllIndex",
    "EllBucket",
    "pack_ell",
]
