"""MSM vs exact host oracle (small sizes; large-N perf lives in bench.py)."""

import random

import jax.numpy as jnp
import pytest

from hotproofs_tpu.ops import curve as C
from hotproofs_tpu.ops import field as F
from hotproofs_tpu.ops import msm as M

pytestmark = pytest.mark.slow  # multi-minute XLA:CPU compiles (round-5 suite curation:
# the default suite must finish <10 min on a 4-core host; run with -m slow)



def _setup(spec, n, scalar_bits, seed):
    rng = random.Random(seed)
    gens = C.derive_generators(spec, b"msm-test", n)
    scalars = [rng.randrange(1 << scalar_bits) % spec.scalar.p for _ in range(n)]
    # include edge scalars
    if n >= 3:
        scalars[0] = 0
        scalars[1] = 1
    pts = C.pt_stack([C.pt_from_affine(spec, x, y) for x, y in gens])
    limbs = jnp.asarray(spec.scalar.batch_to_limbs(scalars))
    return scalars, gens, limbs, pts


@pytest.mark.parametrize("n,bits", [(8, 40), (64, 40)])
def test_small_scalar_msm(n, bits):
    spec = C.PALLAS
    scalars, gens, limbs, pts = _setup(spec, n, bits, seed=n)
    fn = M.msm_jitted(spec, max_bits=bits)
    got = C.pt_to_affine_host(spec, tuple(x[None] for x in fn(limbs, pts)))[0]
    assert got == C.host_msm(spec, scalars, gens)


def test_full_width_msm():
    spec = C.PALLAS
    scalars, gens, limbs, pts = _setup(spec, 16, 255, seed=3)
    fn = M.msm_jitted(spec, max_bits=256)
    got = C.pt_to_affine_host(spec, tuple(x[None] for x in fn(limbs, pts)))[0]
    assert got == C.host_msm(spec, scalars, gens)


def test_all_zero_scalars():
    spec = C.PALLAS
    _, gens, _, pts = _setup(spec, 8, 40, seed=9)
    limbs = jnp.asarray(spec.scalar.batch_to_limbs([0] * 8))
    fn = M.msm_jitted(spec, max_bits=40)
    got = C.pt_to_affine_host(spec, tuple(x[None] for x in fn(limbs, pts)))[0]
    assert got is None


def test_fixed_base_msm():
    """Pre-scaled generators path (the commitment-key hot path)."""
    spec = C.PALLAS
    scalars, gens, limbs, pts = _setup(spec, 16, 255, seed=13)
    import jax
    scaled = jax.jit(lambda p: M.scale_points16(spec, p, 64))(pts)
    fn = jax.jit(lambda s: M.msm(spec, s, pts, max_bits=256, scaled=scaled))
    got = C.pt_to_affine_host(spec, tuple(x[None] for x in fn(limbs)))[0]
    assert got == C.host_msm(spec, scalars, gens)


def test_fixed_base_small_windows():
    spec = C.PALLAS
    scalars, gens, limbs, pts = _setup(spec, 8, 40, seed=21)
    import jax
    scaled = jax.jit(lambda p: M.scale_points16(spec, p, 10))(pts)
    fn = jax.jit(lambda s: M.msm(spec, s, pts, max_bits=40, scaled=scaled))
    got = C.pt_to_affine_host(spec, tuple(x[None] for x in fn(limbs)))[0]
    assert got == C.host_msm(spec, scalars, gens)


def test_odd_block_sizes():
    """Non-power-of-two N exercising lane padding + odd lane merges."""
    spec = C.PALLAS
    scalars, gens, limbs, pts = _setup(spec, 5, 64, seed=31)
    import jax
    fn = jax.jit(lambda s, p: M.msm(spec, s, p, max_bits=64, block=2))
    got = C.pt_to_affine_host(spec, tuple(x[None] for x in fn(limbs, pts)))[0]
    assert got == C.host_msm(spec, scalars, gens)


def test_odd_lane_count():
    """w4=1, 5 points, block=2 -> 3 lanes (odd): the merge-scan identity
    padding must still include the last lane."""
    spec = C.PALLAS
    scalars, gens, limbs, pts = _setup(spec, 5, 4, seed=37)
    import jax
    fn = jax.jit(lambda s, p: M.msm(spec, s, p, max_bits=4, block=2))
    got = C.pt_to_affine_host(spec, tuple(x[None] for x in fn(limbs, pts)))[0]
    assert got == C.host_msm(spec, scalars, gens)
