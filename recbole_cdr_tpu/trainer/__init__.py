from recbole_cdr_tpu.trainer.trainer import CrossDomainTrainer, DCDCSRTrainer

__all__ = ["CrossDomainTrainer", "DCDCSRTrainer"]
