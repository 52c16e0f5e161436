"""neptune 13.0.0-compatible Poseidon parameterisation (VERDICT #4).

The reference's Nova RO is neptune Poseidon (transitive via arecibo,
ref Cargo.lock:1123-1125). These tests pin our port of neptune's
round-number search to the PUBLISHED Filecoin/neptune numbers (the only
vectors checkable without a Rust toolchain), and prove/verify a toy IVC
chain end-to-end under the neptune spec so the selectable parameterisation
is known-good through the whole transcript path.
"""

import numpy as np
import pytest

from hotproofs_tpu.ops import poseidon as P
from hotproofs_tpu.ops import field as F
from hotproofs_tpu.utils.config import CONFIG


def test_neptune_round_numbers_published():
    # Published neptune/Filecoin round numbers for 255-bit primes at
    # 128-bit security (neptune round_numbers.rs tests / Filecoin spec).
    assert P.neptune_round_numbers(3, 255) == (8, 55)    # arity 2
    assert P.neptune_round_numbers(5, 255) == (8, 56)    # arity 4
    assert P.neptune_round_numbers(9, 255) == (8, 57)    # arity 8
    assert P.neptune_round_numbers(12, 255) == (8, 57)   # arity 11
    assert P.neptune_round_numbers(17, 255) == (8, 59)   # arity 16


def test_neptune_domain_tags():
    # hash_type.rs: Standard/MerkleTree(arity) = 2^arity - 1;
    # ConstantLength(l) = l * 2^64.
    assert P.neptune_domain_tag(arity=2) == 3
    assert P.neptune_domain_tag(arity=8) == 255
    assert P.neptune_domain_tag(const_len=3) == 3 << 64
    with pytest.raises(AssertionError):
        P.neptune_domain_tag()


def test_neptune_spec_structure():
    spec = P.make_spec_neptune("vesta_scalar")
    assert spec.t == 3 and (spec.r_full, spec.r_partial) == (8, 55)
    assert len(spec.round_constants) == 63
    assert all(len(r) == 3 for r in spec.round_constants)
    p = spec.field.p
    # Cauchy MDS exactly as neptune's generate_mds: 1/(x_i + y_j),
    # x = 0..t, y = t..2t.
    for i in range(3):
        for j in range(3):
            assert spec.mds[i][j] * (i + 3 + j) % p == 1
    # Constants differ from the default spec (different grain seed via R_P).
    dflt = P.make_spec(spec.field.name)
    assert spec.round_constants[0] != dflt.round_constants[0]


def test_neptune_host_device_permute_agree():
    spec = P.make_spec_neptune("vesta_scalar")
    fld = spec.field
    rng = np.random.RandomState(3)
    state_ints = [int.from_bytes(rng.bytes(31), "little") % fld.p
                  for _ in range(3)]
    want = P.host_permute(spec, state_ints)
    import jax.numpy as jnp
    st = jnp.asarray(np.stack(
        [F.int_to_limbs(v * fld.r_mod_p % fld.p) for v in state_ints]))
    out = P.permute(spec, st)
    got = [int(F.limbs_to_int(np.asarray(out[i])))
           * pow(fld.r_mod_p, fld.p - 2, fld.p) % fld.p for i in range(3)]
    assert got == want


def test_ivc_toy_end_to_end_under_neptune_spec(monkeypatch):
    """A full prove+verify round trip with the transcript running on the
    neptune parameterisation — the knob is live through Transcript,
    transcript_poseidon_params and the vk export."""
    monkeypatch.setattr(CONFIG, "poseidon", "neptune")
    from hotproofs_tpu.nova.transcript import (Transcript,
                                               transcript_poseidon_params)
    from hotproofs_tpu.circuits.dsl import compile_circuit
    from hotproofs_tpu.circuits.blake3_compression import VESTA_PRIME
    from hotproofs_tpu.nova.ivc import IVC
    from hotproofs_tpu.nova.pedersen import CommitmentKey
    from hotproofs_tpu.nova.r1cs import ShapeDevice
    from hotproofs_tpu.ops import curve as C
    from tests.test_ivc_toy import toy_step, _witness_chain

    r1cs, layout = compile_circuit(toy_step, VESTA_PRIME)
    shape = ShapeDevice.from_dsl(r1cs)
    ck = CommitmentKey.create(C.PALLAS, b"toy-nep",
                              max(shape.n_wit, shape.n_cons))
    ivc = IVC(shape, C.PALLAS, ck, None)

    name = shape.field.name
    assert transcript_poseidon_params(name)[1:] == (8, 55)
    assert Transcript(name, b"t", 7).spec.r_partial == 55

    wits, z_exp = _witness_chain(layout, 3, 3, VESTA_PRIME)
    proof = ivc.prove([3], wits)
    assert ivc.verify(proof, io_arity=1) == [z_exp]

    # A verifier on the DEFAULT spec must reject (different challenges).
    monkeypatch.setattr(CONFIG, "poseidon", "default")
    with pytest.raises(AssertionError):
        ivc.verify(proof, io_arity=1)
