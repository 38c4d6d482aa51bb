from recbole_cdr_tpu.data.dataset import (
    CrossDomainDataset,
    DomainDataset,
    InteractionTable,
    OverlapTable,
)
from recbole_cdr_tpu.data.utils import create_dataset, data_preparation

__all__ = [
    "CrossDomainDataset",
    "DomainDataset",
    "InteractionTable",
    "OverlapTable",
    "create_dataset",
    "data_preparation",
]
