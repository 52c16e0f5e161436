"""Sharded MSM + batched witness commitments over a device mesh.

TPU-native equivalent of the reference north-star scaling story
(BASELINE.json): Pippenger buckets/points partitioned across chips, partial
results reduced with collectives. NCCL-style allreduce becomes
`lax.all_gather` of the D partial projective points followed by a D-length
point-add scan (curve addition is not an arithmetic psum, so the reduction
runs as gathered point math — D is tiny, the cost is one collective).

Two entry points:
  * msm_sharded     — ONE large MSM with points split along the `msm` axis.
  * batch_commit_sharded — many independent witness commitments split along
    the `step` axis (each device runs whole MSMs for its share of steps);
    this is the dominant parallel pattern for IVC proving, where all step
    witness commitments are independent of the fold chain.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops import curve as C
from ..ops import field as F
from ..ops import msm as M


def _reduce_points(spec: C.CurveSpec, gathered: C.Point) -> C.Point:
    """Sequential point-add reduction over a small leading axis."""
    def red(acc, p):
        return C.pt_add(spec, acc, p), None

    acc, _ = jax.lax.scan(red, C.identity_for(spec), gathered)
    return acc


def msm_sharded(spec: C.CurveSpec, mesh: Mesh, scalar_limbs: jnp.ndarray,
                points: C.Point, max_bits: int = 256,
                axis: str = "msm", scaled=None) -> C.Point:
    """One MSM with N split across `axis`. N must divide by the axis size.
    Pass `scaled` (16^w-scaled fixed-base points, (W4, N, ...)) to skip the
    per-device scaling scan — sharded along the point axis."""
    pt_specs = (P(axis), P(axis), P(axis))

    if scaled is None:
        # No pre-scaled bases: on the CPU test mesh use the scan MSM (the
        # windowed body with IN-GRAPH scaling is the pathological XLA:CPU
        # compile — ops/msm.msm_scan docs). With pre-scaled bases (below)
        # the windowed path stays on ALL backends: round-5 A/B showed the
        # scan's 8x extra point-ops make the full-width comm_T RUN slower
        # than the windowed path's compile+run on CPU (1700 s vs 556 s
        # dryrun total).
        @partial(shard_map, mesh=mesh,
                 in_specs=(P(axis), pt_specs),
                 out_specs=(P(), P(), P()),
                 check_rep=False)
        def fn(sc, pts):
            if M.use_scan_msm():
                part = M.msm_scan(spec, sc, pts, max_bits=max_bits)
            else:
                part = M.msm(spec, sc, pts, max_bits=max_bits)
            gathered = jax.tree_util.tree_map(
                lambda x: jax.lax.all_gather(x, axis), part)
            return _reduce_points(spec, gathered)

        return fn(scalar_limbs, points)

    sc_specs = (P(None, axis), P(None, axis), P(None, axis))

    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis), pt_specs, sc_specs),
             out_specs=(P(), P(), P()),
             check_rep=False)
    def fn2(sc, pts, scl):
        part = M.msm(spec, sc, pts, max_bits=max_bits, scaled=scl)
        gathered = jax.tree_util.tree_map(
            lambda x: jax.lax.all_gather(x, axis), part)
        return _reduce_points(spec, gathered)

    return fn2(scalar_limbs, points, scaled)


def batch_commit_sharded(spec: C.CurveSpec, mesh: Mesh,
                         scalars_batch: jnp.ndarray, points: C.Point,
                         max_bits: int = 40,
                         axis: str = "step") -> C.Point:
    """Independent commitments for a batch of witness vectors (S, N, 32),
    S split across `axis`; generator points replicated. Returns (S, ...)
    points gathered on all devices."""

    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis), (P(), P(), P())),
             out_specs=(P(axis), P(axis), P(axis)),
             check_rep=False)
    def fn(sc, pts):
        if M.use_scan_msm():
            # max_bits-capped scan (e.g. 40 steps for witness commits) —
            # see msm_sharded on why the CPU mesh avoids the windowed body.
            return jax.vmap(
                lambda s: M.msm_scan(spec, s, pts, max_bits=max_bits))(sc)
        return jax.vmap(lambda s: M.msm(spec, s, pts, max_bits=max_bits))(sc)

    return fn(scalars_batch, points)
