"""Layered configuration for the TPU-native cross-domain framework.

Standalone re-implementation of the observable config semantics of the
reference (`recbole_cdr/config/configurator.py:19-297` plus the inherited
recbole ``Config``):

- priority: command line > parameter dict > config files > model yaml >
  overall.yaml / sample.yaml defaults
- any ``source_X`` / ``target_X`` key is folded into the nested
  ``source_domain`` / ``target_domain`` dicts, each layer merged independently
  (reference `configurator.py:238-280`)
- ``train_epochs: ["MODE:N", ...]`` schedules are parsed into
  ``train_modes`` / ``epoch_num``; ``source_split`` is set iff a SOURCE phase
  exists (reference `configurator.py:224-236`)
- eval-argument validation (metric consistency, topk > 0, full-sort x value
  metric conflict; reference `configurator.py:167-221`)
"""

import copy
import os
import re
import sys

import yaml

from recbole_cdr_tpu.utils.enums import EvaluatorType, InputType, ModelType, train_mode2state
from recbole_cdr_tpu.utils.registry import get_model

#: metric name (lowercase) -> evaluator type
metric_types = {
    "recall": EvaluatorType.RANKING,
    "mrr": EvaluatorType.RANKING,
    "ndcg": EvaluatorType.RANKING,
    "hit": EvaluatorType.RANKING,
    "precision": EvaluatorType.RANKING,
    "map": EvaluatorType.RANKING,
    "gauc": EvaluatorType.RANKING,
    "itemcoverage": EvaluatorType.RANKING,
    "averagepopularity": EvaluatorType.RANKING,
    "giniindex": EvaluatorType.RANKING,
    "shannonentropy": EvaluatorType.RANKING,
    "tailpercentage": EvaluatorType.RANKING,
    "auc": EvaluatorType.VALUE,
    "mae": EvaluatorType.VALUE,
    "rmse": EvaluatorType.VALUE,
    "logloss": EvaluatorType.VALUE,
}

#: metrics where smaller is better (recbole metric classes with smaller=True)
smaller_metrics = ["rmse", "mae", "logloss", "averagepopularity", "giniindex"]

_PROPERTIES_DIR = os.path.join(os.path.dirname(os.path.realpath(__file__)), "..", "properties")
_EXAMPLE_DATA_DIR = os.path.join(
    os.path.dirname(os.path.realpath(__file__)), "..", "dataset_example"
)

# yaml loader that understands scientific notation like ``1e-3`` as float
_yaml_loader = yaml.FullLoader
_yaml_loader.add_implicit_resolver(
    "tag:yaml.org,2002:float",
    re.compile(
        """^(?:[-+]?(?:[0-9][0-9_]*)\\.[0-9_]*(?:[eE][-+]?[0-9]+)?
        |[-+]?(?:[0-9][0-9_]*)(?:[eE][-+]?[0-9]+)
        |\\.[0-9_]+(?:[eE][-+][0-9]+)?
        |[-+]?[0-9][0-9_]*(?::[0-5]?[0-9])+\\.[0-9_]*
        |[-+]?\\.(?:inf|Inf|INF)
        |\\.(?:nan|NaN|NAN))$""",
        re.X,
    ),
    list("-+0123456789."),
)


def _convert_value(value: str):
    """Parse a CLI/string value into a python object (literal-eval-esque,
    mirroring recbole's lenient conversion)."""
    import ast

    try:
        v = ast.literal_eval(value)
        return v
    except (ValueError, SyntaxError):
        if value.lower() == "true":
            return True
        if value.lower() == "false":
            return False
        if value.lower() in ("none", "null", "~"):
            return None
        return value


class CDRConfig:
    """Layered config with per-domain (``source_*``/``target_*``) namespacing."""

    def __init__(self, model=None, config_file_list=None, config_dict=None, _cli_args=None):
        self.file_config_dict = self._fold_domain_prefix(self._load_config_files(config_file_list))
        self.variable_config_dict = self._fold_domain_prefix(dict(config_dict or {}))
        self.cmd_config_dict = self._fold_domain_prefix(self._load_cmd_line(_cli_args))
        self.external_config_dict = self._merge_external()

        self.model, self.model_class = self._resolve_model(model)
        self.internal_config_dict = self._load_internal(self.model)
        self.final_config_dict = self._merge_final()
        self._set_default_parameters()
        self._set_neg_sample_args()
        self.dataset = self._check_cross_domain()

    # ------------------------------------------------------------------ layers

    @staticmethod
    def _load_yaml(path: str) -> dict:
        with open(path, "r", encoding="utf-8") as f:
            return yaml.load(f, Loader=_yaml_loader) or {}

    def _load_config_files(self, file_list) -> dict:
        d = {}
        for f in file_list or []:
            d.update(self._load_yaml(f))
        return d

    @staticmethod
    def _load_cmd_line(cli_args=None) -> dict:
        """Parse ``--key=value`` pairs from argv (skipped under pytest/ipython)."""
        d = {}
        argv = cli_args if cli_args is not None else sys.argv[1:]
        if cli_args is None and ("pytest" in sys.argv[0] or "ipykernel" in sys.argv[0]):
            return d
        for arg in argv:
            if not arg.startswith("--") or "=" not in arg:
                continue
            key, value = arg[2:].split("=", 1)
            d[key] = _convert_value(value)
        return d

    @staticmethod
    def _fold_domain_prefix(config_dict: dict) -> dict:
        """Fold ``source_X``/``target_X`` keys into nested domain dicts
        (observable behavior of reference `configurator.py:238-251`)."""
        config_dict = dict(config_dict)
        config_dict.setdefault("source_domain", dict())
        config_dict.setdefault("target_domain", dict())
        for key in list(config_dict.keys()):
            for domain in ("source", "target"):
                prefix = domain + "_"
                if key.startswith(prefix) and not key.startswith(domain + "_domain"):
                    config_dict[domain + "_domain"][key[len(prefix):]] = copy.copy(config_dict[key])
                    config_dict.pop(key)
        return config_dict

    def _merge_external(self) -> dict:
        merged, src, tgt = {}, {}, {}
        for layer in (self.file_config_dict, self.variable_config_dict, self.cmd_config_dict):
            merged.update(layer)
            src.update(layer["source_domain"])
            tgt.update(layer["target_domain"])
        merged["source_domain"] = src
        merged["target_domain"] = tgt
        return merged

    def _resolve_model(self, model):
        if model is None:
            model = self.external_config_dict.get("model")
            if model is None:
                raise KeyError(
                    "model need to be specified in at least one of these ways: "
                    "[model variable, config file, config dict, command line]"
                )
        if not isinstance(model, str):
            return model.__name__, model
        return model, get_model(model)

    def _load_internal(self, model: str) -> dict:
        # NOTE: internal (properties) layers do NOT get domain-prefix folding
        # (the reference only folds external input, `configurator.py:63-67`) —
        # model hyper-parameters like ``source_embedding_size`` stay top-level.
        internal = {"source_domain": {}, "target_domain": {}}
        for fname in ("overall.yaml", os.path.join("model", model + ".yaml"),
                      os.path.join("dataset", "sample.yaml")):
            path = os.path.join(_PROPERTIES_DIR, fname)
            if os.path.isfile(path):
                d = self._load_yaml(path)
                src = d.pop("source_domain", {})
                tgt = d.pop("target_domain", {})
                internal.update(d)
                internal["source_domain"].update(src)
                internal["target_domain"].update(tgt)
        internal["MODEL_TYPE"] = self.model_class.type
        return internal

    def _merge_final(self) -> dict:
        final, src, tgt = {}, {}, {}
        for layer in (self.internal_config_dict, self.external_config_dict):
            final.update(layer)
            src.update(layer["source_domain"])
            tgt.update(layer["target_domain"])
        final["source_domain"] = src
        final["target_domain"] = tgt
        return final

    # ---------------------------------------------------------------- defaults

    def _set_default_parameters(self):
        d = self.final_config_dict
        d["model"] = self.model

        if hasattr(self.model_class, "input_type"):
            d["MODEL_INPUT_TYPE"] = self.model_class.input_type
        elif "loss_type" in d:
            d["MODEL_INPUT_TYPE"] = (
                InputType.POINTWISE if d["loss_type"] in ("CE",) else InputType.PAIRWISE
            )
        else:
            raise ValueError(
                "Either model has attr 'input_type', or arg 'loss_type' should exist in config."
            )

        metrics = d["metrics"]
        if isinstance(metrics, str):
            metrics = [metrics]
        d["metrics"] = metrics

        eval_type = set()
        for metric in metrics:
            if metric.lower() not in metric_types:
                raise NotImplementedError(f"There is no metric named '{metric}'")
            eval_type.add(metric_types[metric.lower()])
        if len(eval_type) > 1:
            raise RuntimeError("Ranking metrics and value metrics can not be used at the same time.")
        d["eval_type"] = eval_type.pop()

        valid_metric = d["valid_metric"].split("@")[0]
        d["valid_metric_bigger"] = valid_metric.lower() not in smaller_metrics

        topk = d["topk"]
        if isinstance(topk, int):
            topk = [topk]
        if not isinstance(topk, list):
            raise TypeError(f"The topk [{topk}] must be a integer, list")
        for k in topk:
            if k <= 0:
                raise ValueError(
                    f"topk must be a positive integer or a list of positive integers, but get `{k}`"
                )
        d["topk"] = topk

        default_eval_args = {
            "split": {"RS": [0.8, 0.1, 0.1]},
            "order": "RO",
            "group_by": "user",
            "mode": "full",
        }
        if not isinstance(d.get("eval_args"), dict):
            raise ValueError(f"eval_args:[{d.get('eval_args')}] should be a dict.")
        for k, v in default_eval_args.items():
            d["eval_args"].setdefault(k, v)

        if d["eval_args"]["mode"] == "full" and d["eval_type"] == EvaluatorType.VALUE:
            raise NotImplementedError("Full sort evaluation do not match value-based metrics!")

        # training schedule: ["MODE:N", ...]
        train_scheme, train_epochs = [], []
        for train_arg in d["train_epochs"]:
            scheme, epoch = train_arg.split(":")
            if scheme not in train_mode2state:
                raise ValueError(f"[{scheme}] is not a supported training mode.")
            train_scheme.append(scheme)
            train_epochs.append(epoch)
        d["train_modes"] = train_scheme
        d["epoch_num"] = train_epochs
        d["source_split"] = "SOURCE" in train_scheme
        d["epochs"] = int(train_epochs[0])

        d.setdefault("device", "tpu")

    def _set_neg_sample_args(self):
        d = self.final_config_dict
        neg_sampling = d.get("neg_sampling")
        if neg_sampling is None:
            d["train_neg_sample_args"] = {"strategy": "none", "distribution": "none"}
        else:
            if not isinstance(neg_sampling, dict) or len(neg_sampling) != 1:
                raise ValueError(f"neg_sampling [{neg_sampling}] should be a dict with one key.")
            distribution = list(neg_sampling.keys())[0]
            sample_num = neg_sampling[distribution]
            if distribution not in ("uniform", "popularity"):
                raise ValueError(f"The distribution [{distribution}] of neg_sampling is not supported.")
            d["train_neg_sample_args"] = {
                "strategy": "by",
                "by": sample_num,
                "distribution": distribution,
            }

        eval_mode = d["eval_args"]["mode"]
        if eval_mode == "full":
            d["eval_neg_sample_args"] = {"strategy": "full", "distribution": "uniform"}
        elif eval_mode in ("none", "labeled"):
            # recbole 1.0.1 `labeled` mode: value metrics over labeled triples
            if d["eval_type"] == EvaluatorType.RANKING:
                raise NotImplementedError(
                    "Labeled evaluation do not match ranking-based metrics!"
                )
            d["eval_neg_sample_args"] = {"strategy": "none", "distribution": "none"}
        else:
            parts = eval_mode.split()
            if len(parts) == 2 and parts[0] in ("uniform", "popularity"):
                if d["eval_type"] == EvaluatorType.VALUE:
                    raise NotImplementedError(
                        "Sampled (candidate) evaluation do not match value-based metrics!"
                    )
                d["eval_neg_sample_args"] = {
                    "strategy": "by",
                    "by": int(parts[1]),
                    "distribution": parts[0],
                }
            else:
                raise ValueError(f"the mode [{eval_mode}] in eval_args is not supported.")

    def _check_cross_domain(self):
        d = self.final_config_dict
        assert "source_domain" in d and "target_domain" in d
        try:
            source_name = d["source_domain"]["dataset"]
            target_name = d["target_domain"]["dataset"]
        except KeyError:
            raise KeyError(
                "If you want to run cross-domain recommender, name of both source domain "
                "and target domain should be specified in config file."
            )
        for domain, name in (("source_domain", source_name), ("target_domain", target_name)):
            bundled = os.path.join(_EXAMPLE_DATA_DIR, name)
            if name in ("ml-100k", "ml-1m") and os.path.isdir(bundled):
                d[domain]["data_path"] = bundled
            else:
                base = d[domain].get("data_path") or d.get("data_path") or "dataset/"
                if os.path.basename(os.path.normpath(base)) != name:
                    d[domain]["data_path"] = os.path.join(base, name)
                else:
                    d[domain]["data_path"] = base
        d["dataset"] = {"source_domain": source_name, "target_domain": target_name}
        return d["dataset"]

    # ------------------------------------------------------------------ access

    def update(self, other_config: dict) -> "CDRConfig":
        """Deep-copied view with ``other_config`` keys promoted to the top level
        (used to build per-domain dataset configs; reference `configurator.py:282-286`)."""
        new = copy.deepcopy(self)
        for key in other_config:
            new.final_config_dict[key] = other_config[key]
        return new

    def __getitem__(self, item):
        return self.final_config_dict.get(item, None)

    def __setitem__(self, key, value):
        if not isinstance(key, str):
            raise TypeError("index must be a str.")
        self.final_config_dict[key] = value

    def __contains__(self, key):
        return key in self.final_config_dict

    def __str__(self):
        return "\n".join(f"{k} = {v}" for k, v in self.final_config_dict.items())

    __repr__ = __str__
