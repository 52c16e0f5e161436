"""Bit-parity of the native field/Poseidon/EC helpers (native/ffec.cc)
against the pure-Python oracles they replace on the fold-loop host path.

Reference capability: neptune Poseidon + pasta_curves host arithmetic
(SURVEY.md §2b); the native module must be indistinguishable from the
Python oracles — transcripts and folded instances feed Fiat-Shamir, so a
single differing bit breaks every proof.
"""

import random

import pytest

from hotproofs_tpu.core import native_ff
from hotproofs_tpu.ops import curve as C
from hotproofs_tpu.ops import poseidon as P

pytestmark = pytest.mark.skipif(not native_ff.available(),
                                reason="no native toolchain")


@pytest.mark.parametrize("field_name", ["pallas_scalar", "bn254_scalar"])
def test_permute_parity(field_name):
    spec = P.make_spec(field_name)
    rng = random.Random(1)
    for _ in range(5):
        state = [rng.getrandbits(260) % spec.field.p
                 for _ in range(spec.t)]
        want = P.host_permute(spec, state)
        lib = native_ff.get_lib()
        pid = native_ff.poseidon_id(spec)
        import ctypes
        buf = ctypes.create_string_buffer(
            b"".join(int(v).to_bytes(32, "little") for v in state),
            32 * spec.t)
        lib.ffec_permute(pid, buf)
        got = [int.from_bytes(buf.raw[32 * i: 32 * i + 32], "little")
               for i in range(spec.t)]
        assert got == want


@pytest.mark.parametrize("field_name", ["pallas_scalar", "vesta_scalar"])
def test_sponge_parity(field_name):
    spec = P.spec_for(field_name)
    rng = random.Random(2)
    host = P.HostSponge(spec, domain_tag=1234567)
    nat = native_ff.NativeSponge(spec, domain_tag=1234567)
    for round_ in range(4):
        vals = [rng.getrandbits(256) % spec.field.p
                for _ in range(rng.randrange(1, 9))]
        host.absorb(vals)
        nat.absorb(vals)
        assert host.state == nat.state
        assert host._absorbed == nat._absorbed
        if round_ % 2 == 1:
            assert host.squeeze() == nat.squeeze()
            assert host.state == nat.state
            assert host._absorbed == nat._absorbed


@pytest.mark.parametrize("curve_name", ["pallas", "vesta", "bn254"])
def test_fold_point_parity(curve_name):
    spec = {"pallas": C.PALLAS, "vesta": C.VESTA, "bn254": C.BN254}[
        curve_name]
    rng = random.Random(3)
    g = spec.gen
    pts = [C.host_scalar_mul(spec, rng.getrandbits(64) + 1, g)
           for _ in range(3)]
    acc = None
    for q in pts:
        r = rng.getrandbits(256) % spec.scalar.p
        want = C.host_add(spec, acc, C.host_scalar_mul(spec, r, q))
        got = native_ff.fold_point(spec, acc, q, r)
        assert got == want
        acc = got
    # identity / zero-scalar edges
    assert native_ff.fold_point(spec, acc, None, 5) == acc
    assert native_ff.fold_point(spec, acc, pts[0], 0) == acc
    assert native_ff.fold_point(spec, None, pts[0], 1) == pts[0]
    # r*Q == -acc -> identity
    neg = (acc[0], (-acc[1]) % spec.base.p)
    assert native_ff.fold_point(spec, acc, neg, 1) is None


def test_transcript_uses_native():
    from hotproofs_tpu.nova.transcript import Transcript
    tr = Transcript("pallas_scalar", b"t", 7)
    assert isinstance(tr.sponge, native_ff.NativeSponge)
    tr2_sponge = P.HostSponge(tr.spec, domain_tag=tr.sponge.state[0])
    # fresh transcripts agree with a host replay
    import hashlib
    tag = int.from_bytes(hashlib.sha256(
        b"hotproofs/transcript/t").digest(), "little") % tr.spec.field.p
    host = P.HostSponge(tr.spec, domain_tag=tag)
    host.absorb([7])
    tr3 = Transcript("pallas_scalar", b"t", 7)
    assert tr3.sponge.state == host.state
    tr3.absorb_scalars([1, 2, 3])
    host.absorb([1, 2, 3])
    assert tr3.challenge() == host.squeeze()
