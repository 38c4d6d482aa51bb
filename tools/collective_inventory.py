"""Collective-op inventory of the compiled 8-device SPMD programs.

Multi-chip hardware is unavailable here (single-chip tunnel), so the
measurable proxy for the scaling story (BASELINE.md >=80% target) is:
(a) the single-chip SPMD overhead measured by bench.py's extras on the
real TPU, and (b) THIS artifact — the exact collectives XLA inserts into
the dp=4 x tp=2 compiled programs on an 8-device CPU mesh: op counts and
operand bytes per program, i.e. what would ride the ICI per step.

Writes results/collectives.md. Usage: python -m tools.collective_inventory
(sets the CPU platform + 8 virtual devices itself; run in a fresh process).
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DTYPE_BYTES = {
    "f64": 8, "s64": 8, "u64": 8,
    "f32": 4, "s32": 4, "u32": 4,
    "bf16": 2, "f16": 2, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1,
}

_COLL = r"all-reduce|all-gather|reduce-scatter|all-to-all|collective-permute|collective-broadcast"
# one shaped result: f32[4096,64]{1,0} — dims optional (scalar)
_SHAPE = re.compile(r"(\w+)\[([\d,]*)\]")
_LINE = re.compile(
    r"=\s*(?P<shape>\(?[\w\[\],{}\s]*?\)?)\s*(?P<op>(?:%s))(?:-start)?\(" % _COLL
)


def _shape_bytes(shape_str: str) -> int:
    total = 0
    for dtype, dims in _SHAPE.findall(shape_str):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def inventory(hlo_text: str):
    """-> {op_name: (count, total_result_bytes)} over the optimized HLO."""
    out = {}
    for m in _LINE.finditer(hlo_text):
        op = m.group("op")
        nbytes = _shape_bytes(m.group("shape"))
        c, b = out.get(op, (0, 0))
        out[op] = (c + 1, b + nbytes)
    return out


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    import jax.numpy as jnp
    import numpy as np
    import optax

    from __graft_entry__ import _build_cmf
    from recbole_cdr_tpu.ops.topk import make_sharded_streaming_topk
    from recbole_cdr_tpu.parallel.mesh import (
        make_mesh, pad_tables_for_sharding, param_sharding_rules, shard_params,
    )
    from recbole_cdr_tpu.trainer.device_loop import DeviceEpochLoop
    from recbole_cdr_tpu.trainer.trainer import build_optimizer
    from recbole_cdr_tpu.utils.enums import TrainMode

    mesh = make_mesh({"data": 4, "model": 2})
    config, model, batch = _build_cmf(train_batch_size=4096)
    train_data = model._graft_train_data
    tx = build_optimizer(config, lambda n: True)

    params = shard_params(
        pad_tables_for_sharding(model.init_params(jax.random.PRNGKey(0)), mesh),
        mesh,
    )
    loss_fn = model.loss_fn("BOTH")
    programs = {}

    # -- program 1: one sharded train step (batch over 'data', tables over
    # 'model') — the unit the scaling story is about
    from jax.sharding import NamedSharding, PartitionSpec as P

    opt_state = tx.init(params)
    batch_sh = NamedSharding(mesh, P("data"))
    dev_batch = {k: jax.device_put(np.asarray(v), batch_sh) for k, v in batch.items()}

    @jax.jit
    def train_step(params, opt_state, batch, rng):
        loss, grads = jax.value_and_grad(lambda p: loss_fn(p, batch, rng))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    compiled = train_step.lower(
        params, opt_state, dev_batch, jax.random.PRNGKey(1)
    ).compile()
    programs["sharded train step (CMF, batch 4096, dp=4 x tp=2)"] = inventory(
        compiled.as_text()
    )

    # -- program 2: the production device-resident epoch program over the mesh
    loop = DeviceEpochLoop(
        TrainMode.BOTH, loss_fn, tx, train_data, config["MODEL_INPUT_TYPE"],
        neg_num=1, num_users=model.total_num_users,
        base_rng=jax.random.PRNGKey(2), mesh=mesh, donate=False,
    )
    compiled = loop._epoch_fn.lower(
        params, tx.init(params), jax.random.PRNGKey(3), loop._buffers
    ).compile()
    programs["device epoch loop (CMF BOTH, whole epoch, dp=4 x tp=2)"] = inventory(
        compiled.as_text()
    )

    # -- program 3: mesh-sharded streaming full-sort top-k at Book-Crossing
    # scale (153,430 items): item axis over 'model', users over 'data'
    B, I, D, H, k = 256, 153430, 64, 64, 10
    topk = make_sharded_streaming_topk(mesh, k=k)
    rng = np.random.default_rng(0)
    user_e = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    table = jnp.asarray(rng.normal(size=(I, D)), jnp.float32)
    hist = jnp.full((B, H), I, jnp.int32)
    compiled = topk.lower(user_e, table, hist).compile()
    programs[f"sharded streaming top-k ({I:,} items, B={B}, dp=4 x tp=2)"] = inventory(
        compiled.as_text()
    )

    lines = [
        "# Collective inventory — compiled dp=4 x tp=2 programs (8-device mesh)",
        "",
        "Multi-chip hardware is not reachable in this environment, so the",
        "scaling statement rests on two measurable artifacts: the single-chip",
        "SPMD overhead (bench.py extra `spmd_overhead_pct`, real TPU) and",
        "this inventory — every collective XLA inserted into the compiled",
        "8-virtual-device programs, with result bytes (the ICI traffic a real",
        "slice would carry). Regenerate: `python -m tools.collective_inventory`.",
        "",
        "Sharding layout: embedding tables row-sharded over 'model' (vocab",
        "axis), batch/user axes over 'data', dense params replicated",
        "(`parallel/mesh.py`). Expected pattern: all-gather of table rows on",
        "the forward gather, reduce-scatter (or all-reduce) of table grads,",
        "all-reduce of replicated-param grads over 'data', all-gather of",
        "per-shard top-k candidates.",
        "",
    ]
    for name, inv in programs.items():
        lines.append(f"## {name}")
        lines.append("")
        if not inv:
            lines.append("(no collectives — fully local program)")
        else:
            lines.append("| collective | count | result bytes |")
            lines.append("|---|---|---|")
            for op, (c, b) in sorted(inv.items()):
                lines.append(f"| {op} | {c} | {b:,} |")
        lines.append("")
    out_path = os.path.join(REPO, "results", "collectives.md")
    with open(out_path, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out_path}")
    for name, inv in programs.items():
        print(name, {op: c for op, (c, b) in inv.items()})


if __name__ == "__main__":
    main()
