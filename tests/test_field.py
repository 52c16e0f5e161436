"""Field kernel property tests vs exact Python integers (SURVEY.md §7 P1:
"property-tested against Python ints" before any performance work)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hotproofs_tpu.ops import field as F

SPECS = [F.pallas_scalar, F.pallas_base, F.bn254_scalar, F.bn254_base]
IDS = [s.name for s in SPECS]


def _rand_batch(spec, n, rng):
    vals = [rng.randrange(spec.p) for _ in range(n)]
    return vals, jnp.asarray(spec.batch_to_limbs(vals))


@pytest.mark.parametrize("spec", SPECS, ids=IDS)
def test_limb_roundtrip(spec):
    rng = random.Random(1)
    vals, arr = _rand_batch(spec, 8, rng)
    back = spec.limbs_to_ints(np.asarray(arr))
    assert [int(v) for v in back] == vals


@pytest.mark.parametrize("spec", SPECS, ids=IDS)
def test_add_sub_neg(spec):
    rng = random.Random(2)
    a_vals, a = _rand_batch(spec, 16, rng)
    b_vals, b = _rand_batch(spec, 16, rng)
    s = spec.limbs_to_ints(np.asarray(F.jitted("add", spec)(a, b)))
    d = spec.limbs_to_ints(np.asarray(F.jitted("sub", spec)(a, b)))
    n = spec.limbs_to_ints(np.asarray(F.jitted("neg", spec)(a)))
    for i in range(16):
        assert int(s[i]) == (a_vals[i] + b_vals[i]) % spec.p
        assert int(d[i]) == (a_vals[i] - b_vals[i]) % spec.p
        assert int(n[i]) == (-a_vals[i]) % spec.p


@pytest.mark.parametrize("spec", SPECS, ids=IDS)
def test_mont_mul(spec):
    rng = random.Random(3)
    a_vals, a = _rand_batch(spec, 16, rng)
    b_vals, b = _rand_batch(spec, 16, rng)
    am = F.jitted("to_mont", spec)(a)
    bm = F.jitted("to_mont", spec)(b)
    prod = F.jitted("from_mont", spec)(F.jitted("mul", spec)(am, bm))
    got = spec.limbs_to_ints(np.asarray(prod))
    for i in range(16):
        assert int(got[i]) == (a_vals[i] * b_vals[i]) % spec.p


@pytest.mark.parametrize("spec", SPECS, ids=IDS)
def test_mont_roundtrip_and_edges(spec):
    edge_vals = [0, 1, 2, spec.p - 1, spec.p - 2, (1 << 255) % spec.p]
    arr = jnp.asarray(spec.batch_to_limbs(edge_vals))
    back = spec.limbs_to_ints(np.asarray(
        F.jitted("from_mont", spec)(F.jitted("to_mont", spec)(arr))))
    assert [int(v) for v in back] == edge_vals


def test_inv():
    spec = F.pallas_scalar
    rng = random.Random(4)
    vals, a = _rand_batch(spec, 4, rng)
    vals = [0] + vals[:3]
    a = jnp.asarray(spec.batch_to_limbs(vals))
    am = F.jitted("to_mont", spec)(a)
    inv = F.jitted("from_mont", spec)(F.jitted("inv", spec)(am))
    got = spec.limbs_to_ints(np.asarray(inv))
    assert int(got[0]) == 0
    for i in range(1, 4):
        assert (int(got[i]) * vals[i]) % spec.p == 1


def test_mul_stress_jit():
    spec = F.pallas_base
    rng = random.Random(5)
    n = 256
    a_vals, a = _rand_batch(spec, n, rng)
    b_vals, b = _rand_batch(spec, n, rng)
    f = jax.jit(lambda x, y: F.mont_mul(spec, F.to_mont(spec, x),
                                        F.to_mont(spec, y)))
    got = spec.limbs_to_ints(np.asarray(F.jitted("from_mont", spec)(f(a, b))))
    for i in range(0, n, 37):
        assert int(got[i]) == (a_vals[i] * b_vals[i]) % spec.p
