from recbole_cdr_tpu.sampler.sampler import (
    DomainNegSampler,
    CrossDomainSourceSampler,
    UsedIds,
)

__all__ = ["DomainNegSampler", "CrossDomainSourceSampler", "UsedIds"]
