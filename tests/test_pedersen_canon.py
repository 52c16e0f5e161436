"""Canonical-output commits + pre-scaled full-width split bases
(round 4: the per-fold sync path does from-Montgomery INSIDE the commit
programs — nova/pedersen._maybe_canon — and the split commit's big
positions use host-pre-scaled bases — scaled_big). Tiny key so the
interpret-mode pallas kernels stay fast on CPU."""

import jax.numpy as jnp
import numpy as np
import pytest

from hotproofs_tpu.ops import curve as C
from hotproofs_tpu.ops import field as F
from hotproofs_tpu.nova.pedersen import CommitmentKey

pytestmark = pytest.mark.slow  # multi-minute XLA:CPU compiles (round-5 suite curation:
# the default suite must finish <10 min on a 4-core host; run with -m slow)



@pytest.fixture(scope="module")
def ck():
    return CommitmentKey.create(C.PALLAS, b"smoke-canon", 64)


@pytest.fixture(scope="module")
def scalars():
    rng = np.random.RandomState(0)
    sc = rng.randint(0, 256, size=(48, 32)).astype(np.int32)
    sc[:, -1] = 0
    return sc


def test_commit_pallas_canonical_matches_montgomery(ck, scalars):
    scj = jnp.asarray(scalars)
    pt_m = ck.commit_pallas(scj, 256)
    pt_c = ck.commit_pallas(scj, 256, canonical=True)
    a1 = C.pt_to_affine_host(C.PALLAS, tuple(x[None] for x in pt_m))[0]
    a2 = C.pt_to_affine_host_canon(C.PALLAS,
                                   tuple(x[None] for x in pt_c))[0]
    assert a1 == a2


def test_commit_many_pallas_canonical(ck, scalars):
    scb = jnp.asarray(np.stack([scalars, scalars[::-1].copy()]))
    ptb = ck.commit_many_pallas(scb, 256, canonical=True)
    ab = C.pt_to_affine_host_canon(C.PALLAS, ptb)
    want = C.pt_to_affine_host(
        C.PALLAS, tuple(x[None] for x in ck.commit_pallas(
            jnp.asarray(scalars), 256)))[0]
    assert ab[0] == want


def test_split_commit_scaled_big_matches_full_width(ck, scalars):
    """Split commit with full-width values at the big positions, big part
    via PRE-SCALED host bases (scaled_big), must equal the plain full-width
    XLA commit."""
    big = np.array([3, 17], np.int64)
    sc2 = scalars.copy()
    sc2[:, 5:] = 0  # non-big positions must be < 2^SMALL_BITS (= 2^40)
    sc2[3] = F.int_to_limbs(C.PALLAS.scalar.p - 12345)
    sc2[17] = F.int_to_limbs(1 << 200)
    sc2j = jnp.asarray(sc2)
    want = C.pt_to_affine_host(
        C.PALLAS, tuple(x[None] for x in ck.commit(sc2j, max_bits=256)))[0]
    got = C.pt_to_affine_host(
        C.PALLAS, tuple(x[None]
                        for x in ck.commit_split_pallas(sc2j, big)))[0]
    assert got == want
    # batched split + canonical output
    gotm = ck.commit_many_split_pallas(jnp.asarray(sc2[None]), big,
                                       canonical=True)
    assert C.pt_to_affine_host_canon(C.PALLAS, gotm)[0] == want


def test_scaled_big_does_not_corrupt_scaled_cache(ck):
    """scaled_big keys live in their own cache — scaled() must still
    iterate (m, windows) keys after scaled_big populated its dict
    (round-4 regression: a shared dict broke scaled()'s unpacking)."""
    ck.scaled_big(np.array([1, 2], np.int64))
    pts = ck.scaled(16, 40)
    assert pts[0].shape[1] == 16
