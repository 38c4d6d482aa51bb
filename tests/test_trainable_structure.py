"""Predicate-vs-gradient structural test (VERDICT r4 next #4).

The round-4 EMCDR-class bug happened because per-model ``trainable_predicate``
declarations diverged from actual loss structure: a parameter marked trainable
in a phase whose loss never reaches it gets zero-grad Adam ticks, warming its
bias correction and turning the NEXT phase's first steps from ~lr into ~3x lr
(torch.optim.Adam only advances state for parameters whose ``.grad`` is
non-None — the reference's single-optimizer protocol,
`/root/reference/recbole_cdr/trainer/trainer.py:43-76` via recbole Trainer).

This test makes that bug class structurally impossible to reintroduce: for
EVERY model x every phase of its default schedule (in order, with the
reference's phase-entry surgery — NATR's source-table freeze, DCDCSR's
benchmark/affine builds), one real batch runs through the torch oracle and
the set of top-level parameter entries receiving a non-None grad must EQUAL
the set the model's ``trainable_predicate`` declares — both directions.
"""

import numpy as np
import pytest
import torch

from tools.oracle_models import ORACLES, to_torch

from tests.test_oracle_equivalence import _grab_batch, _setup

#: default phase schedules (reference `properties/model/*.yaml` train_epochs;
#: order and repetition matter — DCDCSR's second TARGET differs from its first)
PHASES = {
    "CMF": ["BOTH"],
    "CLFM": ["BOTH"],
    "CoNet": ["BOTH"],
    "DTCDR": ["BOTH"],
    "DeepAPF": ["BOTH"],
    "BiTGCF": ["BOTH"],
    "EMCDR": ["SOURCE", "TARGET", "OVERLAP"],
    "SSCDR": ["SOURCE", "TARGET", "OVERLAP"],
    "DCDCSR": ["SOURCE", "TARGET", "BOTH", "TARGET"],
    "NATR": ["SOURCE", "TARGET"],
}


def _leaves_under(entry):
    """All torch tensors under one top-level param entry (entries may be
    nested MLP subtrees)."""
    import jax

    return [l for l in jax.tree_util.tree_leaves(entry)
            if isinstance(l, torch.Tensor) and l.is_floating_point()]


@pytest.mark.parametrize("name", sorted(PHASES))
def test_predicate_matches_oracle_grads(name):
    _, dataset, train_data, model, params = _setup(name)
    oracle = ORACLES[name]()
    if name == "BiTGCF":
        oracle.prepare(dataset, model)
    tp = to_torch(params)

    phase_counts = {}
    for phase in PHASES[name]:
        phase_counts[phase] = count = phase_counts.get(phase, 0) + 1
        model.set_phase(phase)

        # reference phase-entry parameter surgery (mirrors
        # tools/reference_oracle.train_oracle)
        if name == "DCDCSR" and phase == "BOTH" and model.mode != "non_overlap":
            with torch.no_grad():
                tp["benchmark_embedding"] = oracle.build_benchmark(tp, model)
        if name == "DCDCSR" and phase == "TARGET" and count == 2:
            tp["affine_embedding"] = oracle.build_affine(tp, model)
        if name == "NATR" and phase == "TARGET":
            tp["source_user_embedding"].requires_grad_(False)
            tp["source_item_embedding"].requires_grad_(False)

        # fresh grad slate: non-None-ness must reflect THIS phase only
        for entry in tp.values():
            for leaf in _leaves_under(entry):
                leaf.grad = None

        batch = _grab_batch(train_data, model, phase)
        kwargs = {"phase_count": count} if name == "DCDCSR" else {}
        oracle.loss(tp, batch, model, phase, **kwargs).backward()

        pred = model.trainable_predicate(phase)
        got = {k: any(l.grad is not None for l in _leaves_under(v))
               for k, v in tp.items()}
        want = {k: bool(pred(k)) for k in tp}
        mismatch = {k: (want[k], got[k]) for k in tp if want[k] != got[k]}
        assert not mismatch, (
            f"{name} phase {phase}#{count}: trainable_predicate vs oracle "
            f"grad liveness mismatch (declared, actual): {mismatch}"
        )
