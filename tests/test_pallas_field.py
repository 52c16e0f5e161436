"""Pallas limb-major field kernels vs the XLA path and the host-int oracle.

On the CPU test mesh the kernels run through the pallas interpreter
(identical semantics); on TPU they compile to Mosaic. Exactness matters —
these kernels feed commitments whose bit-patterns the verifier recomputes.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hotproofs_tpu.ops import field as F
from hotproofs_tpu.ops import pallas_field as PF

RNG = np.random.RandomState(7)


def rand_elems(spec, n):
    return [int.from_bytes(RNG.bytes(32), "little") % spec.p
            for _ in range(n)]


def to_lm(spec, vals):
    return jnp.asarray(np.stack([F.int_to_limbs(v) for v in vals]).T.copy())


@pytest.mark.parametrize("spec", [F.pallas_base, F.vesta_base, F.bn254_base],
                         ids=lambda s: s.name)
def test_mont_mul_lm_matches_oracle(spec):
    n = PF.N_LANES
    avs = rand_elems(spec, n)
    bvs = rand_elems(spec, n)
    # edge cases in the first lanes
    avs[0], bvs[0] = 0, 0
    avs[1], bvs[1] = spec.p - 1, spec.p - 1
    avs[2], bvs[2] = 1, spec.p - 1
    got = PF.mont_mul_lm(spec, to_lm(spec, avs), to_lm(spec, bvs))
    rinv = pow(1 << 256, spec.p - 2, spec.p)
    out = np.asarray(got).T
    for i in range(0, n, 37):
        want = avs[i] * bvs[i] * rinv % spec.p
        assert F.limbs_to_int(out[i]) == want


def test_mont_mul_lm_matches_xla_path():
    spec = F.pallas_base
    n = 2 * PF.N_LANES
    a = np.stack([F.int_to_limbs(v) for v in rand_elems(spec, n)])
    b = np.stack([F.int_to_limbs(v) for v in rand_elems(spec, n)])
    ref = jax.jit(lambda x, y: F.mont_mul(spec, x, y))(
        jnp.asarray(a), jnp.asarray(b))
    got = PF.mont_mul_lm(spec, jnp.asarray(a.T.copy()),
                         jnp.asarray(b.T.copy()))
    assert bool(jnp.all(got.T == ref))


def test_add_sub_rows_match_oracle():
    spec = F.pallas_base
    n = PF.N_LANES
    avs = rand_elems(spec, n)
    bvs = rand_elems(spec, n)
    avs[0], bvs[0] = 0, 0
    avs[1], bvs[1] = spec.p - 1, 1          # wraps to 0
    avs[2], bvs[2] = 1, 2                   # sub borrows
    consts = PF.field_consts_dev(spec)
    a, b = to_lm(spec, avs), to_lm(spec, bvs)
    s = jax.jit(PF.add_rows)(consts, a, b)
    d = jax.jit(PF.sub_rows)(consts, a, b)
    s_np, d_np = np.asarray(s).T, np.asarray(d).T
    for i in range(0, n, 53):
        assert F.limbs_to_int(s_np[i]) == (avs[i] + bvs[i]) % spec.p
        assert F.limbs_to_int(d_np[i]) == (avs[i] - bvs[i]) % spec.p


def test_mont_mul_em_arbitrary_n():
    """The element-major wrapper pads/transposes at the boundary."""
    spec = F.pallas_base
    n = 70  # not a lane multiple
    avs, bvs = rand_elems(spec, n), rand_elems(spec, n)
    a = jnp.asarray(np.stack([F.int_to_limbs(v) for v in avs]))
    b = jnp.asarray(np.stack([F.int_to_limbs(v) for v in bvs]))
    ref = jax.jit(lambda x, y: F.mont_mul(spec, x, y))(a, b)
    got = PF.mont_mul_em(spec, a, b)
    assert got.shape == ref.shape
    assert bool(jnp.all(got == ref))
