"""Limb-major elliptic-curve ops for Pallas kernels (RCB15, a=0 curves).

Counterpart of ops/curve.py in the limb-major (32, N) layout of
ops/pallas_field.py: points are (X, Y, Z) triples of (32, N) Montgomery-form
digit tiles, combined entirely in VMEM when called inside a pallas kernel.
Used by the fused MSM bucket kernel (ops/msm_pallas.py) and the on-device
fold program.

Formulas (same as ops/curve.py so both paths produce identical bits):
  * pt_add_rows     — RCB15 Algorithm 7 (complete projective add, 12M)
  * pt_double_rows  — RCB15 Algorithm 9 (complete doubling, 8M)
  * pt_add_mixed_rows — RCB15 Algorithm 8 (complete mixed add, Z2=1, 11M):
    the MSM streams AFFINE pre-scaled bases (2 coords instead of 3) and the
    formula is complete for any projective P1 including the identity, since
    the affine operand is never the point at infinity.

Curve constants travel as a `curve_consts` pack (kernel input — pallas
kernels may not capture array constants, and jit-closure constants feeding
pallas inputs are ~70x slower; see pallas_field.field_consts_dev).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import curve as C
from . import field as F
from . import pallas_field as PF

L = F.N_LIMBS

# curve_consts columns, LIMB-MAJOR (33, 4) — all accesses are static
# column slices (integer value indexing inside Mosaic control flow lowers
# to unsupported gathers):
#   0: p (extended by one zero digit)
#   1: mu = -p^{-1} mod R
#   2: 3*b in Montgomery form
#   3: 1 in Montgomery form (identity Y)
# The full kernel constant set is the PAIR (curve_consts, curve_toep): the
# bf16 Toeplitz pack routes the Montgomery reductions and the constant-3b
# products through the MXU (pallas_field._mont_reduce_rows).
_CC_CACHE = {}
_CT_CACHE = {}


def curve_consts(spec: C.CurveSpec) -> np.ndarray:
    out = np.zeros((L + 1, 4), np.int32)
    out[:L, 0] = spec.base.p_limbs
    out[:L, 1] = spec.base.mu_limbs
    out[:L, 2] = spec.b3_mont
    out[:L, 3] = spec.base.one_mont_limbs
    return out


def curve_toep(spec: C.CurveSpec) -> np.ndarray:
    """(5L, L) MXU pack: rows [0,3L) = base-field toep_consts (mu, p),
    rows [3L,5L) = full Toeplitz of 3b in Montgomery form."""
    out = np.zeros((5 * L, L), np.float32)
    out[:3 * L] = PF.toep_consts(spec.base)
    out[3 * L:] = PF.toeplitz_of(spec.b3_mont, 2 * L)
    return out


def curve_consts_dev(spec: C.CurveSpec) -> jnp.ndarray:
    """Device constant pack. Only the HOST array is cached — caching the
    jnp value would capture a tracer when the first call happens inside a
    jit trace and leak it into later traces (UnexpectedTracerError)."""
    if spec.name not in _CC_CACHE:
        _CC_CACHE[spec.name] = curve_consts(spec)
    return jnp.asarray(_CC_CACHE[spec.name])


def curve_toep_dev(spec: C.CurveSpec) -> jnp.ndarray:
    """Device bf16 Toeplitz pack (same host-only caching rule)."""
    if spec.name not in _CT_CACHE:
        _CT_CACHE[spec.name] = curve_toep(spec)
    return jnp.asarray(_CT_CACHE[spec.name], jnp.bfloat16)


def _unpack(cc):
    """cc is (cc_int, toep_bf16) on the MXU path or the legacy (33, 4)
    array; returns (cc_int, field_consts, mulc_fn)."""
    if isinstance(cc, (tuple, list)):
        cci, toep = cc
        fc = (cci[:, :2], toep[:3 * L])
        tb3 = toep[3 * L:5 * L]
        mulc = lambda a: PF.mont_mul_toep_rows(fc, tb3, a)
        return cci, fc, mulc
    fc = cc[:, :2]
    b3 = cc[:L, 2:3]
    mulc = lambda a: PF.mont_mul_rows(fc, a, jnp.broadcast_to(b3, a.shape))
    return cc, fc, mulc


def identity_rows(cc, n):
    """Identity (0 : 1 : 0) as limb-major tiles of width n.

    Y is materialized via an ADD, not jnp.broadcast_to: a lazy broadcast of
    the (32, 1) one_mont column can reach a downstream row-slice as a fused
    (1,1)->(rows,lanes) double broadcast, which Mosaic rejects ("Broadcast
    in both sublanes and lanes")."""
    cci = cc[0] if isinstance(cc, (tuple, list)) else cc
    x = jnp.zeros((L, n), jnp.int32)
    y = cci[:L, 3:4] + jnp.zeros((L, n), jnp.int32)
    z = jnp.zeros((L, n), jnp.int32)
    return (x, y, z)


def pt_add_rows(cc, p, q):
    """Complete projective addition, RCB15 Alg 7 (a=0); 12 muls + 2 b3-muls.
    cc = curve_consts pack; p, q = (X, Y, Z) of (32, N) Montgomery tiles."""
    _, fc, mulc = _unpack(cc)
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    mul = lambda a, b: PF.mont_mul_rows(fc, a, b)
    add = lambda a, b: PF.add_rows(fc, a, b)
    sub = lambda a, b: PF.sub_rows(fc, a, b)

    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t2 = mul(Z1, Z2)
    t3 = mul(add(X1, Y1), add(X2, Y2))
    t3 = sub(t3, add(t0, t1))
    t4 = mul(add(Y1, Z1), add(Y2, Z2))
    t4 = sub(t4, add(t1, t2))
    X3 = mul(add(X1, Z1), add(X2, Z2))
    Y3 = sub(X3, add(t0, t2))
    X3 = add(t0, t0)
    t0 = add(X3, t0)
    t2 = mulc(t2)
    Z3 = add(t1, t2)
    t1 = sub(t1, t2)
    Y3 = mulc(Y3)
    X3 = mul(t4, Y3)
    X3 = sub(mul(t3, t1), X3)
    Y3 = add(mul(t1, Z3), mul(Y3, t0))
    Z3 = add(mul(Z3, t4), mul(t0, t3))
    return (X3, Y3, Z3)


def pt_add_mixed_rows(cc, p, q_affine):
    """Complete mixed addition, RCB15 Alg 8 (a=0, Z2=1); 11 muls + 2 b3.
    q_affine = (x2, y2) tiles of a point that is NEVER the identity."""
    _, fc, mulc = _unpack(cc)
    X1, Y1, Z1 = p
    X2, Y2 = q_affine
    mul = lambda a, b: PF.mont_mul_rows(fc, a, b)
    add = lambda a, b: PF.add_rows(fc, a, b)
    sub = lambda a, b: PF.sub_rows(fc, a, b)

    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t3 = add(X2, Y2)
    t4 = add(X1, Y1)
    t3 = mul(t3, t4)
    t4 = add(t0, t1)
    t3 = sub(t3, t4)
    t4 = add(mul(Y2, Z1), Y1)
    Y3 = add(mul(X2, Z1), X1)
    X3 = add(t0, t0)
    t0 = add(X3, t0)
    t2 = mulc(Z1)
    Z3 = add(t1, t2)
    t1 = sub(t1, t2)
    Y3 = mulc(Y3)
    X3 = sub(mul(t3, t1), mul(t4, Y3))
    Y3 = add(mul(t1, Z3), mul(Y3, t0))
    Z3 = add(mul(Z3, t4), mul(t0, t3))
    return (X3, Y3, Z3)


def pt_double_rows(cc, p):
    """Complete doubling, RCB15 Alg 9 (a=0); 6 muls + 2 squares + 1 b3."""
    _, fc, mulc = _unpack(cc)
    X, Y, Z = p
    mul = lambda a, b: PF.mont_mul_rows(fc, a, b)
    add = lambda a, b: PF.add_rows(fc, a, b)
    sub = lambda a, b: PF.sub_rows(fc, a, b)

    t0 = mul(Y, Y)
    Z3 = add(t0, t0)
    Z3 = add(Z3, Z3)
    Z3 = add(Z3, Z3)
    t1 = mul(Y, Z)
    t2 = mul(Z, Z)
    t2 = mulc(t2)
    X3 = mul(t2, Z3)
    Y3 = add(t0, t2)
    Z3 = mul(t1, Z3)
    t1 = add(t2, t2)
    t2 = add(t1, t2)
    t0 = sub(t0, t2)
    Y3 = mul(t0, Y3)
    Y3 = add(X3, Y3)
    t1 = mul(X, Y)
    X3 = mul(t0, t1)
    X3 = add(X3, X3)
    return (X3, Y3, Z3)


def pt_select_rows(mask, p, q):
    """mask (N,) bool-ish: mask ? p : q, per lane."""
    m = mask[None, :].astype(bool)
    return tuple(jnp.where(m, a, b) for a, b in zip(p, q))


def pt_neg_rows(cc, p):
    """(X, -Y, Z): negate Y via p - Y (exact digits; Y < p always)."""
    _, fc, _ = _unpack(cc)
    X, Y, Z = p
    negY = PF.sub_rows(fc, jnp.zeros_like(Y), Y)
    return (X, negY, Z)
