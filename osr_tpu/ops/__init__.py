from osr_tpu.ops.bm25 import (
    build_query_matrix,
    score_ell_bucket,
    score_and_topk_bucket,
)
from osr_tpu.ops.topk import topk, merge_topk

__all__ = [
    "build_query_matrix",
    "score_ell_bucket",
    "score_and_topk_bucket",
    "topk",
    "merge_topk",
]
