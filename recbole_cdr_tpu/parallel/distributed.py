"""Multi-host orchestration and per-host data placement.

The reference has no distributed support; this is the TPU-native replacement
(SURVEY §2.3): ``jax.distributed.initialize`` across hosts, with the global
mesh spanning every host's local devices. Within a slice collectives ride
ICI; across slices they ride DCN — both inserted by XLA from the sharding
annotations in :mod:`recbole_cdr_tpu.parallel.mesh`.

Execution model: every process runs the IDENTICAL program (same config, same
seed, same deterministic data pipeline), so every host materializes the same
global batch; placement helpers below then hand each host only its shard:

- :func:`put_replicated` — read-only operands (interaction tables, history
  matrices): every host contributes the same value, the array is fully
  replicated over the global mesh.
- :func:`put_sharded` — per-step batches: each host donates the contiguous
  slice of the global batch its addressable devices own along 'data'.
- :func:`fetch_replicated` — pull a (possibly vocab-sharded) pytree to host
  memory on every process via an all-gather reshard; the multi-host-safe
  replacement for ``np.asarray`` on non-fully-addressable arrays
  (checkpointing, best-params capture).

Enable by setting ``distributed: {coordinator_address, num_processes,
process_id}`` in the config (consumed by quick_start before any backend
use), or rely on TPU-pod auto-discovery with ``distributed: auto``.
"""

from logging import getLogger
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Initialise multi-host JAX. On single-host (or TPU pods with automatic
    environment discovery) all arguments may be None.

    Returns a summary dict {process_index, process_count, local_devices,
    global_devices}.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    info = {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
    getLogger().info(f"jax distributed: {info}")
    return info


def initialize_from_config(config) -> Optional[dict]:
    """Consume the ``distributed`` config key. Must run before the first JAX
    backend use (quick_start calls it ahead of dataset construction).

    ``distributed: auto`` relies on TPU-pod environment discovery;
    ``distributed: {coordinator_address, num_processes, process_id}`` wires
    an explicit coordinator (the form the 2-process CPU tests use).
    """
    dist = config["distributed"]
    if not dist:
        return None
    if dist == "auto":
        jax.distributed.initialize()
        return initialize_distributed()
    return initialize_distributed(
        coordinator_address=dist.get("coordinator_address"),
        num_processes=int(dist["num_processes"]),
        process_id=int(dist["process_id"]),
    )


def is_coordinator() -> bool:
    return jax.process_index() == 0


def put_replicated(x, mesh):
    """Place a host value (identical on every process) fully replicated over
    the global mesh."""
    x = np.asarray(x)
    sharding = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, x)


def put_sharded(x, mesh, spec=P("data")):
    """Place a GLOBAL host batch (identical on every process) sharded per
    ``spec``: each process donates the slice its addressable devices own.
    ``jax.make_array_from_process_local_data`` maps the full local copy onto
    the local shards, so contiguity assumptions about device order never
    leak in."""
    x = np.asarray(x)
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, x, global_shape=x.shape)


def fetch_replicated(tree, mesh):
    """All-gather a pytree (e.g. vocab-sharded tables) to host numpy on every
    process. ``np.asarray`` alone raises on non-fully-addressable arrays in
    multi-process runs; resharding to replicated first makes every shard
    locally available."""
    if jax.process_count() == 1 or mesh is None:
        return jax.tree_util.tree_map(np.asarray, tree)
    replicated = NamedSharding(mesh, P())
    gather = jax.jit(lambda t: t, out_shardings=jax.tree_util.tree_map(
        lambda _: replicated, tree))
    return jax.tree_util.tree_map(np.asarray, gather(tree))
