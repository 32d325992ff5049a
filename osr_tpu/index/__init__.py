from osr_tpu.index.tokenizer import tokenize, Tokenizer
from osr_tpu.index.builder import SparseIndexBuilder, SparseIndex
from osr_tpu.index.layout import HybridLayout, pack_flat, choose_head_terms
from osr_tpu.index.postings import (
    dense_tail_scores,
    merge_host,
    tail_candidates_flat,
)

__all__ = [
    "tokenize",
    "Tokenizer",
    "SparseIndexBuilder",
    "SparseIndex",
    "HybridLayout",
    "pack_flat",
    "choose_head_terms",
    "tail_candidates_flat",
    "merge_host",
    "dense_tail_scores",
]
