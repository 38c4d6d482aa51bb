from recbole_cdr_tpu.config.configurator import CDRConfig

__all__ = ["CDRConfig"]
