from recbole_cdr_tpu.quick_start.quick_start import (
    run_recbole_cdr,
    objective_function,
    load_data_and_model,
)

__all__ = ["run_recbole_cdr", "objective_function", "load_data_and_model"]
