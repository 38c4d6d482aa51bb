"""SPMD parallel layer: device mesh, sharding rules, sharded train step.

The reference has NO distributed support (single ``config['device']``,
`recbole_cdr/model/crossdomain_recommender.py:48`); this module is the
TPU-native replacement (SURVEY §2.3):

- a ``Mesh`` with axes ``('data', 'model')``
- embedding tables row-sharded over ``model`` (the vocab axis) — the DLRM-style
  sparse-parallel layout; XLA inserts the all-gather / reduce-scatter for
  lookups and gradient reduction over ICI
- batches sharded over ``data``; dense tower parameters replicated
- one jitted, donating train step with explicit in/out shardings
"""

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


#: embedding tables at least this many rows get vocab-sharded; smaller params
#: are replicated (sharding tiny tables costs more in collectives than it saves)
MIN_SHARD_ROWS = 128


def make_mesh(mesh_shape: Optional[Dict[str, int]] = None, devices=None) -> Mesh:
    """Build a ('data', 'model') mesh. Default: all devices on the data axis."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if mesh_shape:
        d = int(mesh_shape.get("data", 1))
        m = int(mesh_shape.get("model", 1))
        if d * m != n:
            raise ValueError(f"mesh_shape {mesh_shape} does not match {n} devices")
    else:
        d, m = n, 1
    dev_array = np.array(devices).reshape(d, m)
    return Mesh(dev_array, axis_names=("data", "model"))


def _is_table(name: str, leaf) -> bool:
    return (
        isinstance(name, str)
        and name.endswith("_embedding")
        and hasattr(leaf, "ndim")
        and leaf.ndim == 2
        and leaf.shape[0] >= MIN_SHARD_ROWS
    )


def param_sharding_rules(params, mesh: Mesh):
    """PartitionSpec pytree: embedding tables row-sharded over 'model',
    everything else replicated."""
    model_parallel = mesh.shape.get("model", 1) > 1

    def rule(path, leaf):
        name = path[-1].key if path and hasattr(path[-1], "key") else ""
        if model_parallel and _is_table(name, leaf):
            return P("model", None)
        return P()

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_params(params, mesh: Mesh):
    """Place parameters on the mesh per the sharding rules. Multi-host: every
    process holds the identical full value (same init seed) and contributes
    the shards its devices own."""
    specs = param_sharding_rules(params, mesh)
    multiprocess = jax.process_count() > 1

    def put(x, spec):
        sharding = NamedSharding(mesh, spec)
        if multiprocess:
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x), global_shape=x.shape
            )
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, params, specs)


def batch_sharding(mesh: Mesh):
    """Batches shard their leading (example) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def pad_tables_for_sharding(params, mesh: Mesh):
    """Pad sharded tables' vocab axis up to a multiple of the 'model' axis
    size (XLA requires even division; padding rows sit past every real ID, so
    lookups, prefix slices and gradients never touch them)."""
    m = mesh.shape.get("model", 1)
    if m <= 1:
        return params

    def pad(path, leaf):
        name = path[-1].key if path and hasattr(path[-1], "key") else ""
        if _is_table(name, leaf) and leaf.shape[0] % m != 0:
            extra = m - leaf.shape[0] % m
            return jnp.pad(leaf, ((0, extra), (0, 0)))
        return leaf

    return jax.tree_util.tree_map_with_path(pad, params)


def make_sharded_train_step(loss_fn, tx, mesh: Mesh, params):
    """Build a jitted SPMD train step with explicit shardings.

    Args:
        loss_fn: pure ``(params, batch, rng) -> scalar``.
        tx: an optax transform.
    Returns (train_step, sharded_params, opt_state).
    """
    params = pad_tables_for_sharding(params, mesh)
    param_specs = param_sharding_rules(params, mesh)
    param_shardings = jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec), param_specs
    )
    sharded_params = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), params, param_shardings
    )
    opt_state = tx.init(sharded_params)
    batch_shard = batch_sharding(mesh)
    replicated = NamedSharding(mesh, P())

    @jax.jit
    def train_step(params, opt_state, batch, rng):
        loss, grads = jax.value_and_grad(lambda p: loss_fn(p, batch, rng))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def run(params, opt_state, batch, rng):
        # per-host feeding: every process holds the identical global batch;
        # each contributes the slice its devices own (multi-host safe)
        from recbole_cdr_tpu.parallel.distributed import put_sharded

        batch = {k: put_sharded(v, mesh, P("data")) for k, v in batch.items()}
        return train_step(params, opt_state, batch, rng)

    return run, sharded_params, opt_state
