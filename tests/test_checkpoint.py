"""Checkpoint save / load_data_and_model restore round trip."""

import glob
import os

import numpy as np

from recbole_cdr_tpu.quick_start import load_data_and_model, objective_function


def test_checkpoint_roundtrip(tmp_path):
    ckpt_dir = str(tmp_path / "saved")
    r = objective_function(
        config_dict={
            "model": "CMF",
            "state": "ERROR",
            "show_progress": False,
            "train_batch_size": 512,
            "eval_batch_size": 2048,
            "train_epochs": ["BOTH:2"],
            "checkpoint_dir": ckpt_dir,
        },
        saved=True,
    )
    files = glob.glob(os.path.join(ckpt_dir, "CMF-*.pth"))
    assert files, "no checkpoint written"

    config, model, params, dataset, train_data, valid_data, test_data = load_data_and_model(
        files[0]
    )
    assert config["model"] == "CMF"
    assert "user_embedding" in params
    assert params["user_embedding"].shape[0] == dataset.num_total_user

    # restored params reproduce the recorded test metrics
    from recbole_cdr_tpu.evaluator import FullSortEvaluator
    import jax

    ev = FullSortEvaluator(config)
    score_fn = jax.jit(model.full_sort_fn("TARGET"))
    result = ev.evaluate(score_fn, params, test_data)
    for k, v in r["test_result"].items():
        assert abs(result[k] - v) < 1e-6, (k, result[k], v)


def test_orbax_checkpoint_roundtrip(tmp_path):
    ckpt_dir = str(tmp_path / "saved")
    r = objective_function(
        config_dict={
            "model": "CMF",
            "state": "ERROR",
            "show_progress": False,
            "train_batch_size": 512,
            "eval_batch_size": 2048,
            "train_epochs": ["BOTH:2"],
            "checkpoint_dir": ckpt_dir,
            "checkpoint_backend": "orbax",
        },
        saved=True,
    )
    files = glob.glob(os.path.join(ckpt_dir, "CMF-*.pth"))
    assert files and glob.glob(os.path.join(ckpt_dir, "CMF-*.orbax"))
    config, model, params, dataset, *_, test_data = load_data_and_model(files[0])
    assert params["user_embedding"].shape[0] == dataset.num_total_user

    from recbole_cdr_tpu.evaluator import FullSortEvaluator
    import jax

    ev = FullSortEvaluator(config)
    result = ev.evaluate(jax.jit(model.full_sort_fn("TARGET")), params, test_data)
    for k, v in r["test_result"].items():
        assert abs(result[k] - v) < 1e-6, (k, result[k], v)


def _build_trainer(ckpt_dir, train_epochs, model="EMCDR"):
    from recbole_cdr_tpu.config import CDRConfig
    from recbole_cdr_tpu.data.dataset import CrossDomainDataset
    from recbole_cdr_tpu.data.utils import data_preparation
    from recbole_cdr_tpu.utils import get_model, get_trainer, init_seed

    config = CDRConfig(
        model=model,
        config_dict={
            "state": "ERROR",
            "show_progress": False,
            "train_batch_size": 512,
            "eval_batch_size": 2048,
            "train_epochs": train_epochs,
            "checkpoint_dir": ckpt_dir,
            "eval_step": 1,
        },
        _cli_args=[],
    )
    init_seed(config["seed"], True)
    dataset = CrossDomainDataset(config)
    train_data, valid_data, test_data = data_preparation(config, dataset)
    model_obj = get_model(config["model"])(config, dataset)
    trainer = get_trainer(config["MODEL_TYPE"], config["model"])(config, model_obj)
    return trainer, train_data, valid_data, test_data


def test_mid_schedule_resume(tmp_path):
    """Kill a multi-phase run after its first phase; a fresh trainer resumes
    from the checkpoint (phase index + epoch + optimizer state) and finishes,
    matching a phase schedule the reference can only restart from scratch."""
    import glob as _glob

    ckpt_dir = str(tmp_path / "saved")
    schedule = ["SOURCE:2", "TARGET:2", "OVERLAP:2"]

    trainer, train_data, valid_data, test_data = _build_trainer(ckpt_dir, schedule)
    # run only the SOURCE phase by truncating the schedule the trainer sees
    trainer.train_modes = ["SOURCE"]
    trainer.train_epochs = ["2"]
    trainer.fit(train_data, valid_data, verbose=False, saved=True)
    ckpt = _glob.glob(os.path.join(ckpt_dir, "EMCDR-*.pth"))[0]

    # fresh trainer with the full schedule resumes from the saved phase
    trainer2, train_data2, valid_data2, test_data2 = _build_trainer(ckpt_dir, schedule)
    trainer2.fit(train_data2, valid_data2, verbose=False, saved=False,
                 resume_from=ckpt)
    # resumed run restored the SOURCE params and trained the later phases
    assert trainer2.model.phase == "OVERLAP"
    result = trainer2.evaluate(test_data2, load_best_model=False)
    assert 0.0 <= result["recall@10"] <= 1.0


def test_resume_same_phase_continues_epochs(tmp_path):
    """Resuming inside a phase starts at epoch+1 with restored optimizer
    state and best-score bookkeeping."""
    import glob as _glob

    ckpt_dir = str(tmp_path / "saved")
    trainer, train_data, valid_data, _ = _build_trainer(
        ckpt_dir, ["BOTH:2"], model="CMF"
    )
    trainer.fit(train_data, valid_data, verbose=False, saved=True)
    best_before = trainer.best_valid_score
    ckpt = _glob.glob(os.path.join(ckpt_dir, "CMF-*.pth"))[0]

    trainer2, train_data2, valid_data2, _ = _build_trainer(
        ckpt_dir, ["BOTH:4"], model="CMF"
    )
    trainer2.fit(train_data2, valid_data2, verbose=False, saved=False,
                 resume_from=ckpt)
    # two more epochs on top of the restored state must not lose the
    # already-achieved best score
    assert trainer2.best_valid_score >= best_before - 1e-9
