"""Device mesh construction for the proving stack.

The reference has no distributed execution at all (SURVEY.md §2c — its only
parallelism is rayon threads inside arecibo). The TPU stack defines two mesh
axes that map the proving workload onto a pod slice:

  * ``step`` — data parallelism over independent per-step work: witness
    generation, Az/Bz/Cz SpMVs and witness commitments for different fold
    steps are mutually independent (they depend only on the hash chain, not
    on the fold accumulator) and shard embarrassingly.
  * ``msm``  — model parallelism inside one large MSM: points/scalars are
    sharded along N; partial MSM results combine with a log-depth gather +
    point-add reduction over ICI.

Multi-host: jax.distributed.initialize() + the same mesh spanning all
processes (axis sizes multiply across hosts); collectives ride ICI within a
slice and DCN across slices.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Multi-host bring-up: jax.distributed.initialize with env fallbacks.

    Args default from HOTPROOFS_COORDINATOR / HOTPROOFS_NUM_PROCESSES /
    HOTPROOFS_PROCESS_ID (matching jax's own JAX_COORDINATOR_ADDRESS
    convention). After this, jax.devices() spans all hosts and make_mesh
    builds a global mesh; segment proving shards chains across processes
    via segments.prove_segments(my_segments=[i::n]). No-op (returns 0) when
    neither args nor env are set — single-process runs need no coordinator.
    """
    import os
    coordinator = coordinator or os.environ.get("HOTPROOFS_COORDINATOR")
    if coordinator is None:
        return 0
    num_processes = num_processes if num_processes is not None else \
        int(os.environ["HOTPROOFS_NUM_PROCESSES"])
    process_id = process_id if process_id is not None else \
        int(os.environ["HOTPROOFS_PROCESS_ID"])
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_index()


def make_mesh(step: int = 1, msm: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    if msm is None:
        msm = len(devs) // step
    assert step * msm == len(devs), \
        f"mesh {step}x{msm} != {len(devs)} devices"
    arr = np.array(devs).reshape(step, msm)
    return Mesh(arr, ("step", "msm"))
