"""Multi-host runtime bring-up — the roslaunch/rosmaster replacement.

The reference relied on rosmaster for discovery and roslaunch for process
supervision (SURVEY.md §5.8). On a TPU pod slice the equivalent is
`jax.distributed.initialize`: every host runs the SAME program, the runtime
wires the DCN/ICI collectives, and the factor-sharded solver (parallel/dist)
works unchanged over a mesh spanning all hosts' devices.

Typical pod usage:

    from graphslam_tpu.parallel import multihost
    multihost.initialize()                      # env-driven on Cloud TPU
    mesh = multihost.global_mesh()              # all devices, all hosts
    sharded = shard_graph(graph, mesh)
    poses = dist_lm_solve(poses0, sharded, mesh)

Single-host (or CPU-mesh test) runs skip initialize() and everything still
works — the mesh just spans local devices.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up the multi-host runtime. With no arguments, relies on the
    TPU/cluster environment (the normal Cloud TPU path); explicit arguments
    support manual clusters. Safe to skip for single-host runs."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis: str = "dev") -> Mesh:
    """One mesh axis over every device of every host. Factor sharding over
    this axis makes the psum separator combines ride ICI within a host's
    slice and DCN across hosts — the layout BASELINE.json's north star
    prescribes."""
    return Mesh(np.array(jax.devices()), (axis,))


def is_coordinator() -> bool:
    return jax.process_index() == 0
