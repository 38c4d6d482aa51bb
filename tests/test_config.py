"""Config-system unit tests: layering, domain-prefix folding, schedule parsing."""

from recbole_cdr_tpu.config import CDRConfig
from recbole_cdr_tpu.utils.enums import EvaluatorType, InputType


def make_config(**kwargs):
    return CDRConfig(model="CMF", config_dict=kwargs, _cli_args=[])


def test_defaults_load():
    c = make_config()
    assert c["train_batch_size"] == 2048
    assert c["embedding_size"] == 64
    assert c["metrics"] == ["Recall", "MRR", "NDCG", "Hit", "Precision"]
    assert c["eval_type"] == EvaluatorType.RANKING
    assert c["MODEL_INPUT_TYPE"] == InputType.POINTWISE
    assert c["valid_metric_bigger"] is True


def test_train_epochs_parsing():
    c = make_config(train_epochs=["SOURCE:3", "TARGET:2", "OVERLAP:1"])
    assert c["train_modes"] == ["SOURCE", "TARGET", "OVERLAP"]
    assert c["epoch_num"] == ["3", "2", "1"]
    assert c["source_split"] is True
    assert c["epochs"] == 3


def test_no_source_no_split():
    c = make_config(train_epochs=["BOTH:5"])
    assert c["source_split"] is False


def test_domain_prefix_folding():
    c = make_config(source_learning_rate=0.5, target_seq_separator="|")
    assert c["source_domain"]["learning_rate"] == 0.5
    assert c["target_domain"]["seq_separator"] == "|"


def test_domain_view_update():
    c = make_config()
    src_view = c.update(c["source_domain"])
    assert src_view["dataset"] == "ml-1m"
    tgt_view = c.update(c["target_domain"])
    assert tgt_view["dataset"] == "ml-100k"
    # original untouched
    assert isinstance(c["dataset"], dict)


def test_priority_dict_over_file():
    c = make_config(learning_rate=0.12345)
    assert c["learning_rate"] == 0.12345


def test_topk_validation():
    import pytest

    with pytest.raises(ValueError):
        make_config(topk=[0])


def test_sci_notation_yaml():
    # model yaml reg_weight style values must parse as float
    c = CDRConfig(model="CLFM", config_dict={}, _cli_args=[])
    assert isinstance(c["reg_weight"], float)
    assert abs(c["reg_weight"] - 1e-4) < 1e-12


def test_example_data_paths():
    c = make_config()
    assert c["source_domain"]["data_path"].endswith("ml-1m")
    assert c["target_domain"]["data_path"].endswith("ml-100k")
