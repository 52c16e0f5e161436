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


def make_mesh(step: int = 1, msm: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    if msm is None:
        msm = len(devs) // step
    assert step * msm == len(devs), \
        f"mesh {step}x{msm} != {len(devs)} devices"
    arr = np.array(devs).reshape(step, msm)
    return Mesh(arr, ("step", "msm"))
