"""Device-side R1CS: sparse matrices, SpMV, relaxed instances.

TPU-native equivalent of the reference's constraint-system plumbing: the
circom `.r1cs` + bellpepper synthesis (rust_fold/src/utils.rs:17-88) become
static sparse matrices evaluated as segmented-scan SpMV on device, and
arecibo's `RelaxedR1CSInstance/Witness` become limb-array dataclasses.

Column convention (matches the DSL layout, hotproofs_tpu/circuits/dsl.py):
    col 0            — the constant-1 slot == the relaxed-R1CS u slot
    cols 1..n_io     — public IO X (z_out then z_in for the step circuit)
    cols n_io+1..    — witness W (private inputs + aux)
so z = (u, X, W) and satisfaction is Az ∘ Bz = u*Cz + E.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..circuits.dsl import R1CS
from ..ops import field as F


@dataclass(frozen=True)
class SparseMat:
    """COO entries sorted by row, plus precomputed segment metadata."""

    rows: np.ndarray        # (nnz,) int32
    cols: np.ndarray        # (nnz,) int32
    vals_mont: np.ndarray   # (nnz, 32) int32 — Montgomery form
    seg_start: np.ndarray   # (nnz,) int32 — 1 at first entry of each row run
    tail_slot: np.ndarray   # (nnz,) int32 — row idx at last entry, else n_cons
    n_cons: int


def _mat_from_coo(modulus_spec: F.FieldSpec, rows, cols, vals, n_cons) -> SparseMat:
    order = np.argsort(rows, kind="stable")
    rows = rows[order].astype(np.int32)
    cols = cols[order].astype(np.int32)
    vals = vals[order]
    r_mod = modulus_spec.r_mod_p
    p = modulus_spec.p
    vals_mont = np.stack([
        F.int_to_limbs(int(v) * r_mod % p) for v in vals]).astype(np.int32)
    prev = np.concatenate([[-1], rows[:-1]])
    nxt = np.concatenate([rows[1:], [-2]])
    seg_start = (rows != prev).astype(np.int32)
    tail_slot = np.where(rows != nxt, rows, n_cons).astype(np.int32)
    return SparseMat(rows, cols, vals_mont, seg_start, tail_slot, n_cons)


@dataclass(frozen=True)
class ShapeDevice:
    """One circuit's constraint system, device-evaluable."""

    field: F.FieldSpec
    n_cons: int
    n_vars: int   # total columns (1 + n_io + n_wit)
    n_io: int
    A: SparseMat
    B: SparseMat
    C: SparseMat

    @property
    def n_wit(self) -> int:
        return self.n_vars - 1 - self.n_io

    @staticmethod
    def from_dsl(r1cs: R1CS) -> "ShapeDevice":
        spec = _field_for(r1cs.modulus)
        mats = []
        for rows, cols, vals in (r1cs.A, r1cs.B, r1cs.C):
            mats.append(_mat_from_coo(spec, rows, cols, vals,
                                      r1cs.n_constraints))
        return ShapeDevice(spec, r1cs.n_constraints, r1cs.n_signals,
                           r1cs.n_io, *mats)


def _field_for(modulus: int) -> F.FieldSpec:
    for s in F.FIELDS.values():
        if s.p == modulus:
            return s
    raise KeyError(f"no FieldSpec for modulus {modulus}")


def _seg_add_combine(spec: F.FieldSpec):
    def fn(a, b):
        (va, fa), (vb, fb) = a, b
        s = F.add(spec, va, vb)
        v = jnp.where(fb[..., None].astype(bool), vb, s)
        return (v, fa | fb)
    return fn


def spmv(spec: F.FieldSpec, mat: SparseMat, z_mont: jnp.ndarray) -> jnp.ndarray:
    """Sparse matrix–vector product over the field: returns (n_cons, 32).

    products -> segmented field-add scan over the row runs -> scatter row
    tails into a dense result. All O(nnz) with log-depth combines."""
    cols = jnp.asarray(mat.cols)
    vals = jnp.asarray(mat.vals_mont)
    prod = F.mont_mul(spec, vals, z_mont[cols])
    flags = jnp.asarray(mat.seg_start)
    scanned, _ = jax.lax.associative_scan(
        _seg_add_combine(spec), (prod, flags), axis=0)
    out = jnp.zeros((mat.n_cons + 1, F.N_LIMBS), jnp.int32)
    out = out.at[jnp.asarray(mat.tail_slot)].set(scanned)
    return out[:-1]


def matvec_all(shape: ShapeDevice, z_mont: jnp.ndarray):
    """(Az, Bz, Cz) for one z vector."""
    return (spmv(shape.field, shape.A, z_mont),
            spmv(shape.field, shape.B, z_mont),
            spmv(shape.field, shape.C, z_mont))


def relaxed_satisfied(shape: ShapeDevice, u_mont: jnp.ndarray,
                      x_mont: jnp.ndarray, w_mont: jnp.ndarray,
                      e_mont: jnp.ndarray) -> bool:
    """Check Az∘Bz == u*Cz + E for z = (u, X, W), all Montgomery limbs."""
    spec = shape.field
    z = jnp.concatenate([u_mont[None], x_mont, w_mont], axis=0)
    az, bz, cz = matvec_all(shape, z)
    lhs = F.mont_mul(spec, az, bz)
    rhs = F.add(spec, F.mont_mul(spec, u_mont[None], cz), e_mont)
    return bool(jnp.all(lhs == rhs))


# ---------------------------------------------------------------------------
# Host <-> device witness conversion helpers.
# ---------------------------------------------------------------------------


def witness_to_device(spec: F.FieldSpec, w_ints: np.ndarray):
    """Full DSL witness (object ints, [1, X, W]) -> canonical limb array."""
    return jnp.asarray(spec.batch_to_limbs([int(v) for v in w_ints]))


def to_mont_vec(spec: F.FieldSpec, canon: jnp.ndarray) -> jnp.ndarray:
    return F.jitted("to_mont", spec)(canon)
