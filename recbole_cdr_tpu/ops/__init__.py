from recbole_cdr_tpu.ops.topk import (
    make_sharded_streaming_topk,
    streaming_topk_scores,
    streaming_topk_with_history,
)

__all__ = [
    "streaming_topk_scores",
    "streaming_topk_with_history",
    "make_sharded_streaming_topk",
]
