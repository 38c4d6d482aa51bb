from recbole_cdr_tpu.evaluator.evaluator import FullSortEvaluator
from recbole_cdr_tpu.evaluator.metrics import compute_topk_metrics

__all__ = ["FullSortEvaluator", "compute_topk_metrics"]
