"""Quick-start API: the end-to-end pipeline.

Capability parity with `recbole_cdr/quick_start/quick_start.py:20-130`:
``run_recbole_cdr`` / ``objective_function`` / ``load_data_and_model``.
"""

import pickle
from logging import getLogger

import jax

from recbole_cdr_tpu.config import CDRConfig
from recbole_cdr_tpu.data.utils import create_dataset, data_preparation
from recbole_cdr_tpu.utils import (
    get_model, get_trainer, init_compile_cache, init_logger, init_seed, set_color,
)


def run_recbole_cdr(model=None, config_file_list=None, config_dict=None, saved=True):
    """config -> seed -> logger -> dataset -> split -> model -> trainer ->
    fit -> evaluate."""
    config = CDRConfig(model=model, config_file_list=config_file_list, config_dict=config_dict)
    if config["distributed"]:
        # must precede the first backend use: the global mesh spans hosts
        from recbole_cdr_tpu.parallel.distributed import initialize_from_config

        initialize_from_config(config)
    init_compile_cache(config)
    init_seed(config["seed"], config["reproducibility"])
    init_logger(config)
    logger = getLogger()
    logger.info(config)

    dataset = create_dataset(config)
    logger.info(dataset)
    train_data, valid_data, test_data = data_preparation(config, dataset)

    model_obj = get_model(config["model"])(config, dataset)
    trainer = get_trainer(config["MODEL_TYPE"], config["model"])(config, model_obj)

    best_valid_score, best_valid_result = trainer.fit(
        train_data, valid_data, saved=saved, show_progress=config["show_progress"],
        resume_from=config["resume_checkpoint_path"],
    )
    test_result = trainer.evaluate(
        test_data, load_best_model=saved, show_progress=config["show_progress"]
    )

    logger.info(set_color("best valid ", "yellow") + f": {best_valid_result}")
    logger.info(set_color("test result", "yellow") + f": {test_result}")

    return {
        "best_valid_score": best_valid_score,
        "valid_score_bigger": config["valid_metric_bigger"],
        "best_valid_result": best_valid_result,
        "test_result": test_result,
    }


def objective_function(config_dict=None, config_file_list=None, saved=True):
    """Quiet pipeline for hyper-tuning and tests."""
    config = CDRConfig(config_dict=config_dict, config_file_list=config_file_list)
    if config["distributed"]:
        from recbole_cdr_tpu.parallel.distributed import initialize_from_config

        initialize_from_config(config)
    init_compile_cache(config)
    init_seed(config["seed"], config["reproducibility"])
    dataset = create_dataset(config)
    train_data, valid_data, test_data = data_preparation(config, dataset)
    model_obj = get_model(config["model"])(config, dataset)
    trainer = get_trainer(config["MODEL_TYPE"], config["model"])(config, model_obj)
    best_valid_score, best_valid_result = trainer.fit(
        train_data, valid_data, verbose=False, saved=saved
    )
    test_result = trainer.evaluate(test_data, load_best_model=saved)
    return {
        "best_valid_score": best_valid_score,
        "valid_score_bigger": config["valid_metric_bigger"],
        "best_valid_result": best_valid_result,
        "test_result": test_result,
    }


def load_data_and_model(model_file):
    """Restore config + dataset + dataloaders + model params from a
    checkpoint (reference `quick_start.py:99-130`)."""
    with open(model_file, "rb") as f:
        checkpoint = pickle.load(f)
    config = checkpoint["config"]
    init_compile_cache(config)
    init_seed(config["seed"], config["reproducibility"])
    dataset = create_dataset(config)
    train_data, valid_data, test_data = data_preparation(config, dataset)
    model_obj = get_model(config["model"])(config, dataset)
    if "params_path" in checkpoint:  # orbax backend (sharded tables)
        import orbax.checkpoint as ocp

        raw = ocp.PyTreeCheckpointer().restore(checkpoint["params_path"])
    else:
        raw = checkpoint["params"]
    params = jax.tree_util.tree_map(jax.numpy.asarray, raw)
    return config, model_obj, params, dataset, train_data, valid_data, test_data
