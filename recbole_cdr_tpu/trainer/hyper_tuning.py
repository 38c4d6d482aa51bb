"""Hyper-parameter search — capability parity with recbole's ``HyperTuning``
(used by the reference's `run_hyper.py:1-31` with ``algo='exhaustive'``).

Supports exhaustive grid search over a hyperopt-style params file:

    learning_rate choice [0.01,0.005,0.001]
    embedding_size choice [32,64]

plus 'uniform a,b', 'loguniform a,b', 'quniform a,b,q' lines sampled by
``algo='random'`` with ``max_evals``.
"""

import ast
import itertools
from logging import getLogger

import numpy as np


class HyperTuning:
    def __init__(
        self,
        objective_function,
        space=None,
        params_file=None,
        params_dict=None,
        fixed_config_file_list=None,
        display_file=None,
        algo="exhaustive",
        max_evals=100,
    ):
        self.objective_function = objective_function
        self.fixed_config_file_list = fixed_config_file_list
        self.algo = algo
        self.max_evals = max_evals
        self.logger = getLogger()

        self.space = space or self._build_space(params_file, params_dict)
        self.best_params = None
        self.best_score = None
        self.best_result = None
        self.params2result = {}

    @staticmethod
    def _build_space(params_file, params_dict):
        space = {}
        if params_file:
            with open(params_file, "r") as f:
                for line in f:
                    line = line.strip()
                    if not line or line.startswith("#"):
                        continue
                    name, kind, rest = line.split(None, 2)
                    space[name] = (kind, rest)
        if params_dict:
            for name, (kind, rest) in params_dict.items():
                space[name] = (kind, rest)
        return space

    def _grid_points(self):
        names, value_lists = [], []
        for name, (kind, rest) in self.space.items():
            if kind != "choice":
                raise ValueError(
                    f"exhaustive search only supports 'choice' parameters, got [{kind}] for [{name}]"
                )
            names.append(name)
            value_lists.append(ast.literal_eval(rest))
        for combo in itertools.product(*value_lists):
            yield dict(zip(names, combo))

    def _random_points(self):
        rng = np.random.default_rng(2020)
        for _ in range(self.max_evals):
            point = {}
            for name, (kind, rest) in self.space.items():
                if kind == "choice":
                    point[name] = rng.choice(ast.literal_eval(rest)).item()
                elif kind == "uniform":
                    lo, hi = (float(x) for x in rest.split(","))
                    point[name] = float(rng.uniform(lo, hi))
                elif kind == "loguniform":
                    lo, hi = (float(x) for x in rest.split(","))
                    point[name] = float(np.exp(rng.uniform(lo, hi)))
                elif kind == "quniform":
                    lo, hi, q = (float(x) for x in rest.split(","))
                    point[name] = float(np.round(rng.uniform(lo, hi) / q) * q)
                else:
                    raise ValueError(f"unknown parameter kind [{kind}]")
            yield point

    def run(self):
        points = self._grid_points() if self.algo == "exhaustive" else self._random_points()
        for config_dict in points:
            key = str(sorted(config_dict.items()))
            result = self.objective_function(
                config_dict=config_dict, config_file_list=self.fixed_config_file_list, saved=False
            )
            self.params2result[key] = result
            score = result["best_valid_score"]
            bigger = result.get("valid_score_bigger", True)
            improved = (
                self.best_score is None
                or (bigger and score > self.best_score)
                or (not bigger and score < self.best_score)
            )
            if improved:
                self.best_score = score
                self.best_params = config_dict
                self.best_result = result
            self.logger.info(f"params: {config_dict}, valid score: {score}")

    def export_result(self, output_file=None):
        if output_file:
            with open(output_file, "w") as f:
                for key, result in self.params2result.items():
                    f.write(f"{key} {result['best_valid_score']} {result['test_result']}\n")
