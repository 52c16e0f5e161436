"""Spartan compression (sum-check + IPA) on the toy step circuit.

The reference's CompressedSNARK test is fully commented out
(rust_fold/src/main.rs:542-559); these tests are the working equivalent,
plus the negative cases the reference never had (main.rs:443 TODO).
"""

import numpy as np
import pytest

from hotproofs_tpu.circuits import gadgets as g
from hotproofs_tpu.circuits.dsl import compile_circuit, eval_witness
from hotproofs_tpu.circuits.blake3_compression import VESTA_PRIME
from hotproofs_tpu.nova.ivc import IVC
from hotproofs_tpu.nova.pedersen import CommitmentKey
from hotproofs_tpu.nova.r1cs import ShapeDevice
from hotproofs_tpu.nova.spartan import CompressedProof, SpartanSystem
from hotproofs_tpu.ops import curve as C

pytestmark = pytest.mark.slow  # multi-minute XLA:CPU compiles (round-5 suite curation:
# the default suite must finish <10 min on a 4-core host; run with -m slow)


CONST = 7


def toy_step(ctx):
    z_out = ctx.declare_output("z_out", 1)
    z_in = ctx.declare_input("z_in", 1, public=True)
    sq = g.mul(ctx, z_in[0], z_in[0], name="sq")
    cube = g.mul(ctx, sq, z_in[0], name="cube")
    ctx.bind(z_out[0], cube + CONST)


@pytest.fixture(scope="module")
def stack():
    r1cs, layout = compile_circuit(toy_step, VESTA_PRIME)
    shape = ShapeDevice.from_dsl(r1cs)
    # The L-opening IPA (preprocessed matrix evaluation) needs generators
    # up to next_pow2(n_vars).
    n = 1
    while n < max(shape.n_wit, shape.n_cons, shape.n_vars):
        n *= 2
    ck = CommitmentKey.create(C.PALLAS, b"toy-spartan", n)
    ivc = IVC(shape, C.PALLAS, ck, None)
    return ivc, SpartanSystem(ivc), layout


def _prove_chain(ivc, layout, z0, n_steps):
    p = VESTA_PRIME
    z = z0 % p
    wits = []
    for _ in range(n_steps):
        w = eval_witness(toy_step, layout, {"z_in": [z]})
        wits.append(w)
        z = (pow(z, 3, p) + CONST) % p
    return ivc.prove([z0], wits), z


def test_compress_roundtrip(stack, tmp_path):
    ivc, sps, layout = stack
    proof, z_expected = _prove_chain(ivc, layout, 3, 4)
    cp = sps.compress(proof, io_arity=1)
    # The compressed proof must not carry the accumulator witness.
    assert cp.chain.final_W == [] and cp.chain.final_E == []
    z_final = sps.verify(cp, io_arity=1)
    assert z_final == [z_expected]
    # JSON round-trip through the safe serializer.
    path = str(tmp_path / "cp.json")
    cp.save(path)
    cp2 = CompressedProof.load(path)
    assert sps.verify(cp2, io_arity=1) == [z_expected]


def test_compress_rejects_tampered_claim(stack):
    ivc, sps, layout = stack
    proof, _ = _prove_chain(ivc, layout, 5, 3)
    cp = sps.compress(proof, io_arity=1)
    cp.spartan.vA = (cp.spartan.vA + 1) % VESTA_PRIME
    with pytest.raises(AssertionError):
        sps.verify(cp, io_arity=1)


def test_compress_rejects_tampered_ipa(stack):
    ivc, sps, layout = stack
    proof, _ = _prove_chain(ivc, layout, 5, 3)
    cp = sps.compress(proof, io_arity=1)
    cp.spartan.ipa_W.a_final = (cp.spartan.ipa_W.a_final + 1) % VESTA_PRIME
    with pytest.raises(AssertionError):
        sps.verify(cp, io_arity=1)


def test_compress_rejects_tampered_chain(stack):
    ivc, sps, layout = stack
    proof, _ = _prove_chain(ivc, layout, 2, 3)
    cp = sps.compress(proof, io_arity=1)
    cp.chain.steps[-1].X[0] = (cp.chain.steps[-1].X[0] + 1) % VESTA_PRIME
    with pytest.raises(AssertionError):
        sps.verify(cp, io_arity=1)


def test_compress_rejects_dropped_sumcheck_round(stack):
    ivc, sps, layout = stack
    proof, _ = _prove_chain(ivc, layout, 2, 2)
    cp = sps.compress(proof, io_arity=1)
    cp.spartan.sc1_evals = cp.spartan.sc1_evals[:-1]
    with pytest.raises(AssertionError):
        sps.verify(cp, io_arity=1)


def test_compress_rejects_tampered_vL(stack):
    """The preprocessed matrix evaluation: vL is prover-supplied but bound
    to the verifier-computed Com(L) by ipa_L — a shifted vL must fail."""
    ivc, sps, layout = stack
    proof, _ = _prove_chain(ivc, layout, 5, 3)
    cp = sps.compress(proof, io_arity=1)
    cp.spartan.vL = (cp.spartan.vL + 1) % VESTA_PRIME
    with pytest.raises(AssertionError):
        sps.verify(cp, io_arity=1)


def test_verify_does_not_touch_matrices(stack, monkeypatch):
    """ppsnark-parity contract (VERDICT r04 next #7): after preprocessing,
    verify_relaxed must never evaluate the sparse A/B/C (no SpMV, no
    _L_vector) — poison them and verify must still pass."""
    ivc, sps, layout = stack
    proof, z_expected = _prove_chain(ivc, layout, 3, 4)
    cp = sps.compress(proof, io_arity=1)
    sps.preprocess_H()  # build tables while matrices are intact
    def boom(*a, **k):
        raise AssertionError("verifier touched the sparse matrices")
    monkeypatch.setattr(sps, "_L_vector", boom)
    monkeypatch.setattr(sps, "matT", None)
    assert sps.verify(cp, io_arity=1) == [z_expected]
