"""Pallas MSM vs the host oracle and the XLA MSM (bit-identical affine)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hotproofs_tpu.nova.pedersen import CommitmentKey
from hotproofs_tpu.ops import curve as C
from hotproofs_tpu.ops import field as F
from hotproofs_tpu.ops import msm as M
from hotproofs_tpu.ops import msm_pallas as MP

pytestmark = pytest.mark.slow  # multi-minute XLA:CPU compiles (round-5 suite curation:
# the default suite must finish <10 min on a 4-core host; run with -m slow)


RNG = np.random.RandomState(3)
SPEC = C.PALLAS


@pytest.fixture(scope="module")
def ck():
    return CommitmentKey.create(SPEC, b"test-msm-pallas", 24)


def _scalars(n, bits):
    return [int.from_bytes(RNG.bytes(bits // 8), "little")
            for _ in range(n)]


def _gens_int(ck, m):
    f = SPEC.base
    rinv = pow(f.r_mod_p, f.p - 2, f.p)
    return [(F.limbs_to_int(ck.gens_affine[i, 0]) * rinv % f.p,
             F.limbs_to_int(ck.gens_affine[i, 1]) * rinv % f.p)
            for i in range(m)]


@pytest.mark.parametrize("m,bits", [(24, 64), (20, 256)])
def test_msm_pallas_vs_host(ck, m, bits):
    ks = _scalars(m, bits)
    ks[0] = 0                       # zero scalar -> dump slot
    ks[1] = 1
    canon = jnp.asarray(np.stack([F.int_to_limbs(k) for k in ks]))
    px, py = ck.scaled_tm(m, bits)
    got_dev = MP.msm_pallas(SPEC, canon, px, py, m, bits)
    got = C.pt_to_affine_host(SPEC, tuple(x[None] for x in got_dev))[0]
    want = C.host_msm(SPEC, ks, _gens_int(ck, m))
    assert got == want


def test_msm_pallas_matches_xla_msm(ck):
    m, bits = 24, 64
    ks = _scalars(m, bits)
    canon = jnp.asarray(np.stack([F.int_to_limbs(k) for k in ks]))
    px, py = ck.scaled_tm(m, bits)
    got_dev = MP.msm_pallas(SPEC, canon, px, py, m, bits)
    pts = tuple(p[:m] for p in ck.points)
    ref_dev = M.msm(SPEC, canon, pts, max_bits=bits)
    got = C.pt_to_affine_host(SPEC, tuple(x[None] for x in got_dev))[0]
    ref = C.pt_to_affine_host(SPEC, tuple(x[None] for x in ref_dev))[0]
    assert got == ref


def test_msm_pallas_all_zero_is_identity(ck):
    m, bits = 24, 64
    canon = jnp.zeros((m, F.N_LIMBS), jnp.int32)
    px, py = ck.scaled_tm(m, bits)
    got_dev = MP.msm_pallas(SPEC, canon, px, py, m, bits)
    got = C.pt_to_affine_host(SPEC, tuple(x[None] for x in got_dev))[0]
    assert got is None


def test_scaled_affine_device_matches_host(ck):
    """The device batch-inversion key prep == the host-exact path."""
    m, w4 = 8, 4
    xa_h, ya_h = MP.scaled_affine_host(SPEC, _gens_int(ck, m), w4)
    scaled = ck.scaled(m, 16)   # 4 windows projective
    xa_d, ya_d = MP.scaled_affine_device(SPEC, scaled, m, w4)
    assert np.array_equal(np.asarray(xa_d), xa_h)
    assert np.array_equal(np.asarray(ya_d), ya_h)


def test_commit_split_pallas_matches_plain(ck):
    """Split fast-path == plain full-width commit on the same vector."""
    m = 24
    big_idx = np.asarray([3, 17], np.int64)
    vals = [int.from_bytes(RNG.bytes(5), "little") for _ in range(m)]
    for i in big_idx:
        vals[i] = int.from_bytes(RNG.bytes(32), "little") % SPEC.scalar.p
    canon = jnp.asarray(np.stack([F.int_to_limbs(v) for v in vals]))
    px, py = ck.scaled_tm(m, 40)
    pxb, pyb = ck.scaled_tm_big(big_idx)
    fn = ck.commit_split_pallas_fn(m, big_idx)
    got_dev = fn(canon, px, py, pxb, pyb)
    got = C.pt_to_affine_host(SPEC, tuple(x[None] for x in got_dev))[0]
    want = C.host_msm(SPEC, vals, _gens_int(ck, m))
    assert got == want
