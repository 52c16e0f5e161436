"""Sharding tests on the virtual 8-device CPU mesh (SURVEY.md §4 item 4)."""

import random

import jax
import jax.numpy as jnp
import pytest

from hotproofs_tpu.ops import curve as C
from hotproofs_tpu.parallel.mesh import make_mesh
from hotproofs_tpu.parallel.msm_sharded import (batch_commit_sharded,
                                                msm_sharded)


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    spec = C.PALLAS
    n = 16
    gens = C.derive_generators(spec, b"shard-test", n)
    rng = random.Random(1)
    scalars = [rng.randrange(1 << 40) for _ in range(n)]
    pts = C.pt_stack([C.pt_from_affine(spec, x, y) for x, y in gens])
    limbs = jnp.asarray(spec.scalar.batch_to_limbs(scalars))
    expected = C.host_msm(spec, scalars, gens)
    return spec, scalars, gens, limbs, pts, expected


def test_msm_sharded_matches_host(setup):
    spec, scalars, gens, limbs, pts, expected = setup
    mesh = make_mesh(step=1, msm=8)
    out = msm_sharded(spec, mesh, limbs, pts, max_bits=40)
    got = C.pt_to_affine_host(spec, tuple(x[None] for x in out))[0]
    assert got == expected


def test_batch_commit_sharded(setup):
    spec, scalars, gens, limbs, pts, expected = setup
    mesh = make_mesh(step=8, msm=1)
    batch = jnp.stack([limbs] * 8)  # 8 identical commitments, one per device
    out = batch_commit_sharded(spec, mesh, batch, pts, max_bits=40)
    affs = C.pt_to_affine_host(spec, out)
    assert all(a == expected for a in affs)
