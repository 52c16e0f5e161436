"""NIFS — the Nova folding step over committed relaxed R1CS instances.

TPU-native reimplementation of the fold inside arecibo's
`RecursiveSNARK::prove_step` (SURVEY.md §3.2 "inner hot kernels"): cross-term
T computation, T commitment, Fiat–Shamir challenge, instance/witness update.

Key structural change vs the reference: the prover keeps the running
accumulator's Az/Bz/Cz vectors device-resident and updates them INCREMENTALLY
(AZ_acc' = AZ_acc + r*AZ_i — valid because A is linear), so the per-step cost
is elementwise vector work plus ONE full-width MSM (comm_T); no SpMV over the
accumulator is ever recomputed. The step instances' own Az/Bz/Cz are
independent of the fold chain and can be computed batched, ahead of time, in
parallel (the reference's strictly sequential witness+synthesize loop,
blake3_circuit.rs:297-313, cannot).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import curve as C
from ..ops import field as F
from .r1cs import ShapeDevice

Affine = Optional[Tuple[int, int]]


class AccumulatorDevice(NamedTuple):
    """Device-resident prover state for the running relaxed instance
    (NamedTuple: a jax pytree, so it passes through jit directly)."""

    W: jnp.ndarray    # (nw, 32) mont
    E: jnp.ndarray    # (nc, 32) mont
    az: jnp.ndarray   # (nc, 32) mont
    bz: jnp.ndarray
    cz: jnp.ndarray


@dataclass
class AccumulatorInstance:
    """Host-side running instance (group elements + scalars)."""

    u: int = 0
    X: List[int] = dc_field(default_factory=list)
    comm_W: Affine = None
    comm_E: Affine = None


def empty_accumulator(shape: ShapeDevice) -> Tuple[AccumulatorDevice,
                                                   AccumulatorInstance]:
    nw, nc = shape.n_wit, shape.n_cons
    dev = AccumulatorDevice(
        W=jnp.zeros((nw, F.N_LIMBS), jnp.int32),
        E=jnp.zeros((nc, F.N_LIMBS), jnp.int32),
        az=jnp.zeros((nc, F.N_LIMBS), jnp.int32),
        bz=jnp.zeros((nc, F.N_LIMBS), jnp.int32),
        cz=jnp.zeros((nc, F.N_LIMBS), jnp.int32),
    )
    inst = AccumulatorInstance(u=0, X=[0] * shape.n_io)
    return dev, inst


def cross_term(spec: F.FieldSpec, acc: AccumulatorDevice,
               az2, bz2, cz2, u1_mont: jnp.ndarray) -> jnp.ndarray:
    """T = az1∘bz2 + az2∘bz1 − u1·cz2 − cz1  (step instance is strict, u2=1).
    Montgomery limbs throughout."""
    t = F.add(spec, F.mont_mul(spec, acc.az, bz2),
              F.mont_mul(spec, az2, acc.bz))
    t = F.sub(spec, t, F.mont_mul(spec, u1_mont[None], cz2))
    t = F.sub(spec, t, acc.cz)
    return t


def fold_witness(spec: F.FieldSpec, acc: AccumulatorDevice,
                 W2, az2, bz2, cz2, T, r_mont: jnp.ndarray) -> AccumulatorDevice:
    """Accumulator update with challenge r (Montgomery limb vector)."""
    axpy = lambda x, y: F.add(spec, x, F.mont_mul(spec, r_mont[None], y))
    return AccumulatorDevice(
        W=axpy(acc.W, W2),
        E=axpy(acc.E, T),
        az=axpy(acc.az, az2),
        bz=axpy(acc.bz, bz2),
        cz=axpy(acc.cz, cz2),
    )


def fold_instance(spec: F.FieldSpec, curve: C.CurveSpec,
                  inst: AccumulatorInstance, X2: List[int],
                  comm_W2: Affine, comm_T: Affine, r: int) -> AccumulatorInstance:
    """Host-side instance fold (the verifier runs this too)."""
    p = spec.p
    from ..core import native_ff
    if native_ff.available():
        # acc + r*Q natively (~20x; same affine result bit-for-bit —
        # tests/test_native_ff.py).
        comm_W = native_ff.fold_point(curve, inst.comm_W, comm_W2, r)
        comm_E = native_ff.fold_point(curve, inst.comm_E, comm_T, r)
    else:
        comm_W = C.host_add(curve, inst.comm_W,
                            C.host_scalar_mul(curve, r, comm_W2))
        comm_E = C.host_add(curve, inst.comm_E,
                            C.host_scalar_mul(curve, r, comm_T))
    return AccumulatorInstance(
        u=(inst.u + r) % p,
        X=[(x1 + r * x2) % p for x1, x2 in zip(inst.X, X2)],
        comm_W=comm_W,
        comm_E=comm_E,
    )
