from osr_tpu.ops.bm25 import (
    dense_head_scores,
    fused_search,
    head_scores,
    scatter_query_head,
)
from osr_tpu.ops.topk import (
    approx_topk_threshold,
    block_topk,
    merge_topk,
    topk,
)

__all__ = [
    "dense_head_scores",
    "fused_search",
    "head_scores",
    "scatter_query_head",
    "approx_topk_threshold",
    "block_topk",
    "merge_topk",
    "topk",
]
