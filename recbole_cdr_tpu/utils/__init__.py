from recbole_cdr_tpu.utils.enums import (
    ModelType,
    InputType,
    EvaluatorType,
    FeatureType,
    FeatureSource,
    TrainMode,
    train_mode2state,
)
from recbole_cdr_tpu.utils.logger import init_logger, set_color, ensure_dir
from recbole_cdr_tpu.utils.registry import get_model, get_trainer
from recbole_cdr_tpu.utils.seeding import init_seed
from recbole_cdr_tpu.utils.compile_cache import init_compile_cache

__all__ = [
    "ModelType",
    "InputType",
    "EvaluatorType",
    "FeatureType",
    "FeatureSource",
    "TrainMode",
    "train_mode2state",
    "init_logger",
    "set_color",
    "ensure_dir",
    "get_model",
    "get_trainer",
    "init_seed",
    "init_compile_cache",
]
