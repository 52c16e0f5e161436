"""Limb-major curve ops vs the host exact-integer oracle."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hotproofs_tpu.ops import curve as C
from hotproofs_tpu.ops import field as F
from hotproofs_tpu.ops import pallas_curve as PC

RNG = np.random.RandomState(11)


def _host_points(spec, n):
    """n distinct multiples of the generator, as affine int pairs."""
    out = []
    for _ in range(n):
        k = int.from_bytes(RNG.bytes(32), "little") % spec.scalar.p
        out.append(C.host_scalar_mul(spec, max(k, 1), spec.gen))
    return out


def _to_rows(spec, pts_affine):
    """affine int pairs -> limb-major Montgomery projective tiles."""
    f = spec.base
    n = len(pts_affine)
    xs = np.zeros((F.N_LIMBS, n), np.int32)
    ys = np.zeros((F.N_LIMBS, n), np.int32)
    zs = np.zeros((F.N_LIMBS, n), np.int32)
    for i, pt in enumerate(pts_affine):
        if pt is None:
            ys[:, i] = f.one_mont_limbs
        else:
            xs[:, i] = F.int_to_limbs(pt[0] * f.r_mod_p % f.p)
            ys[:, i] = F.int_to_limbs(pt[1] * f.r_mod_p % f.p)
            zs[:, i] = f.one_mont_limbs
    return tuple(jnp.asarray(v) for v in (xs, ys, zs))


def _from_rows(spec, rows):
    """limb-major Montgomery projective tiles -> affine int pairs."""
    f = spec.base
    rinv = pow(f.r_mod_p, f.p - 2, f.p)
    out = []
    X, Y, Z = (np.asarray(v).T for v in rows)
    for x, y, z in zip(X, Y, Z):
        xi = F.limbs_to_int(x) * rinv % f.p
        yi = F.limbs_to_int(y) * rinv % f.p
        zi = F.limbs_to_int(z) * rinv % f.p
        if zi == 0:
            out.append(None)
        else:
            inv = pow(zi, f.p - 2, f.p)
            out.append((xi * inv % f.p, yi * inv % f.p))
    return out


@pytest.mark.parametrize("spec", [C.PALLAS, C.BN254, C.GRUMPKIN],
                         ids=lambda s: s.name)
def test_pt_add_rows_vs_oracle(spec):
    n = 16
    ps = _host_points(spec, n)
    qs = _host_points(spec, n)
    ps[0] = None                  # identity + Q
    qs[1] = None                  # P + identity
    qs[2] = ps[2]                 # doubling case through add
    qs[3] = (ps[3][0], (-ps[3][1]) % spec.base.p)  # P + (-P) = identity
    cc = PC.curve_consts_dev(spec)
    got = _from_rows(spec, jax.jit(PC.pt_add_rows)(
        cc, _to_rows(spec, ps), _to_rows(spec, qs)))
    for g, p_, q_ in zip(got, ps, qs):
        assert g == C.host_add(spec, p_, q_)


def test_pt_add_mixed_rows_vs_oracle():
    spec = C.PALLAS
    n = 16
    ps = _host_points(spec, n)
    qs = _host_points(spec, n)   # affine operand: never identity
    ps[0] = None                 # identity + Q must work (completeness)
    ps[1] = qs[1]                # doubling
    ps[2] = (qs[2][0], (-qs[2][1]) % spec.base.p)  # -Q + Q = identity
    cc = PC.curve_consts_dev(spec)
    q_rows = _to_rows(spec, qs)
    got = _from_rows(spec, jax.jit(PC.pt_add_mixed_rows)(
        cc, _to_rows(spec, ps), (q_rows[0], q_rows[1])))
    for g, p_, q_ in zip(got, ps, qs):
        assert g == C.host_add(spec, p_, q_)


def test_pt_double_and_neg_rows():
    spec = C.PALLAS
    n = 8
    ps = _host_points(spec, n)
    ps[0] = None
    cc = PC.curve_consts_dev(spec)
    rows = _to_rows(spec, ps)
    got = _from_rows(spec, jax.jit(PC.pt_double_rows)(cc, rows))
    for g, p_ in zip(got, ps):
        assert g == C.host_add(spec, p_, p_)
    gotn = _from_rows(spec, jax.jit(PC.pt_neg_rows)(cc, rows))
    for g, p_ in zip(gotn, ps):
        want = None if p_ is None else (p_[0], (-p_[1]) % spec.base.p)
        assert g == want
