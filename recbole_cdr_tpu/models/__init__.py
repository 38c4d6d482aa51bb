from recbole_cdr_tpu.models.base import CrossDomainRecommender

__all__ = ["CrossDomainRecommender"]
