"""Multi-host orchestration.

The reference has no distributed support; this is the TPU-native replacement
(SURVEY §2.3): ``jax.distributed.initialize`` across hosts, with the global
mesh spanning every host's local devices. Within a slice collectives ride ICI;
across slices they ride DCN — both inserted by XLA from the sharding
annotations in :mod:`recbole_cdr_tpu.parallel.mesh`.
"""

from logging import getLogger
from typing import Optional

import jax


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


def is_coordinator() -> bool:
    return jax.process_index() == 0
