"""recbole_cdr_tpu — a TPU-native cross-domain recommendation framework.

Brand-new JAX/XLA/Pallas implementation with the full capability surface of
RUCAIBox/RecBole-CDR (reference studied at /root/reference; see SURVEY.md).
"""

from recbole_cdr_tpu.quick_start import (
    run_recbole_cdr,
    objective_function,
    load_data_and_model,
)

__version__ = "0.1.0"

__all__ = ["run_recbole_cdr", "objective_function", "load_data_and_model"]
