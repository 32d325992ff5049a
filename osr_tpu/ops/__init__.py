from osr_tpu.ops.bm25 import (
    build_query_matrix,
    hybrid_scores,
    hybrid_score_topk,
    bucket_scores,
)
from osr_tpu.ops.topk import topk, merge_topk, approx_topk_threshold

__all__ = [
    "build_query_matrix",
    "hybrid_scores",
    "hybrid_score_topk",
    "bucket_scores",
    "topk",
    "merge_topk",
    "approx_topk_threshold",
]
