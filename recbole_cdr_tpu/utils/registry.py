"""Model / trainer registries.

Capability parity with ``get_model`` / ``get_trainer``
(`recbole_cdr/utils/utils.py:16-59`): resolve a model name to its class and a
model name to its trainer class (with fallback to the generic phase trainer).
"""

import importlib


_MODEL_MODULE = "recbole_cdr_tpu.models"


def get_model(model_name: str):
    """Resolve a model name (e.g. ``"CMF"``) to its model class."""
    module = importlib.import_module(f"{_MODEL_MODULE}.{model_name.lower()}")
    if not hasattr(module, model_name):
        raise ValueError(f"Model [{model_name}] not found in {module.__name__}")
    return getattr(module, model_name)


def get_trainer(model_type, model_name: str):
    """Resolve the trainer class for a model: ``<Model>Trainer`` if it exists,
    else the generic :class:`CrossDomainTrainer`."""
    trainer_module = importlib.import_module("recbole_cdr_tpu.trainer")
    specific = f"{model_name}Trainer"
    if hasattr(trainer_module, specific):
        return getattr(trainer_module, specific)
    return getattr(trainer_module, "CrossDomainTrainer")


def get_keys_in_insertion_order(chained_dicts) -> list:
    """Ordered key list of a ChainMap-like layering where later maps are
    lower-priority (mirrors ``get_keys_from_chainmap_by_order``,
    `recbole_cdr/utils/utils.py:62-66`)."""
    keys = []
    for m in reversed(list(chained_dicts.maps)):
        for k in m:
            if k not in keys:
                keys.append(k)
    return keys
