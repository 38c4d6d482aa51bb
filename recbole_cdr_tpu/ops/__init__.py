from recbole_cdr_tpu.ops.topk import streaming_topk_scores
from recbole_cdr_tpu.ops.scoring import pairwise_scores, pallas_pairwise_scores

__all__ = ["streaming_topk_scores", "pairwise_scores", "pallas_pairwise_scores"]
