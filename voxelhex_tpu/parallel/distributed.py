"""Multi-host initialization and mesh construction.

Single-process multi-chip works out of the box; for multi-host pod slices
call :func:`initialize` first (wraps ``jax.distributed.initialize``), then
build a mesh over the global device set.  Rays shard across all chips; the
scene replicates; gradient ``pmean`` rides ICI within hosts and DCN across
them (keep the ray axis innermost so collectives prefer ICI).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Join (or no-op on single-process) the distributed runtime.

    With no arguments, environment-based auto-detection is used (TPU pods
    populate the required variables); on a single host this is a no-op.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address)
    return jax.process_count(), jax.process_index()


def global_ray_mesh(axis_name: str = "rays") -> Mesh:
    """A 1-D mesh over every chip of every host."""
    return Mesh(np.array(jax.devices()), (axis_name,))


def host_local_slice(n_global: int):
    """The [start, stop) slice of a globally sharded ray batch owned by this
    process (for building host-local inputs in multi-host pipelines)."""
    per = n_global // jax.process_count()
    start = per * jax.process_index()
    return start, start + per
