"""Core enums for the TPU-native cross-domain recommendation framework.

Capability parity: mirrors the observable enum surface of the reference
(`recbole_cdr/utils/enum_type.py:18-45` and recbole 1.0.1 `recbole/utils/enum_type.py`),
re-declared here so the framework is fully standalone.
"""

from enum import Enum


class ModelType(Enum):
    """Type of models. Only CROSSDOMAIN is first-party here."""

    GENERAL = 1
    SEQUENTIAL = 2
    CONTEXT = 3
    KNOWLEDGE = 4
    TRADITIONAL = 5
    DECISIONTREE = 6
    CROSSDOMAIN = 7


class InputType(Enum):
    """How training batches are shaped for a model."""

    POINTWISE = 1
    PAIRWISE = 2
    LISTWISE = 3


class EvaluatorType(Enum):
    """Ranking metrics (full sort / candidate ranking) vs value metrics (rating error)."""

    RANKING = 1
    VALUE = 2


class FeatureType(Enum):
    """Column types in atomic files (``field:type`` headers)."""

    TOKEN = "token"
    FLOAT = "float"
    TOKEN_SEQ = "token_seq"
    FLOAT_SEQ = "float_seq"


class FeatureSource(Enum):
    """Which atomic file a field was loaded from."""

    INTERACTION = "inter"
    USER = "user"
    ITEM = "item"
    USER_ID = "user_id"
    ITEM_ID = "item_id"


class TrainMode(str, Enum):
    """The four cross-domain training modes (reference:
    `recbole_cdr/utils/enum_type.py:27-45`)."""

    BOTH = "BOTH"
    SOURCE = "SOURCE"
    TARGET = "TARGET"
    OVERLAP = "OVERLAP"


#: mapping from schedule-string mode names to TrainMode, mirroring
#: ``train_mode2state`` (`recbole_cdr/utils/enum_type.py:42-45`).
train_mode2state = {
    "BOTH": TrainMode.BOTH,
    "SOURCE": TrainMode.SOURCE,
    "TARGET": TrainMode.TARGET,
    "OVERLAP": TrainMode.OVERLAP,
}
