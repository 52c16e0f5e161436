"""BN254/Grumpkin engine end-to-end — the reference's DEFAULT engine pair
(rust_fold/src/main.rs:319-331 instantiates Bn256EngineZM; the Pasta pair is
test-only there). The TPU stack is curve-generic: the same DSL circuit
compiles over the BN254 scalar field and the same IVC folds with BN254
commitments.

Fast tests run the toy step circuit over BN254 Fr through the full
fold+verify+compress pipeline; the slow test proves a real BLAKE3 chunk on
ChunkProver(curve="bn254").
"""

import pytest

from hotproofs_tpu.circuits import gadgets as g
from hotproofs_tpu.circuits.dsl import compile_circuit, eval_witness
from hotproofs_tpu.nova.ivc import IVC
from hotproofs_tpu.nova.pedersen import CommitmentKey
from hotproofs_tpu.nova.r1cs import ShapeDevice
from hotproofs_tpu.ops import curve as C

pytestmark = pytest.mark.slow  # multi-minute XLA:CPU compiles (round-5 suite curation:
# the default suite must finish <10 min on a 4-core host; run with -m slow)


BN254_FR = C.BN254.scalar.p
CONST = 11


def toy_step(ctx):
    z_out = ctx.declare_output("z_out", 1)
    z_in = ctx.declare_input("z_in", 1, public=True)
    sq = g.mul(ctx, z_in[0], z_in[0], name="sq")
    ctx.bind(z_out[0], sq + CONST)


@pytest.fixture(scope="module")
def stack():
    r1cs, layout = compile_circuit(toy_step, BN254_FR)
    shape = ShapeDevice.from_dsl(r1cs)
    n = 1
    while n < max(shape.n_wit, shape.n_cons):
        n *= 2
    ck = CommitmentKey.create(C.BN254, b"toy-bn254", n)
    ivc = IVC(shape, C.BN254, ck, None, label=b"bn254-toy")
    return ivc, layout


def _chain(ivc, layout, z0, n_steps):
    z = z0 % BN254_FR
    wits = []
    for _ in range(n_steps):
        w = eval_witness(toy_step, layout, {"z_in": [z]})
        wits.append(w)
        z = (z * z + CONST) % BN254_FR
    return ivc.prove([z0], wits), z


def test_bn254_ivc_roundtrip(stack):
    ivc, layout = stack
    proof, z_expected = _chain(ivc, layout, 5, 4)
    assert ivc.verify(proof, io_arity=1) == [z_expected]


def test_bn254_rejects_tampered_step(stack):
    ivc, layout = stack
    proof, _ = _chain(ivc, layout, 5, 3)
    proof.steps[1].X[0] = (proof.steps[1].X[0] + 1) % BN254_FR
    with pytest.raises(AssertionError):
        ivc.verify(proof, io_arity=1)


def test_bn254_spartan_compression(stack):
    from hotproofs_tpu.nova.spartan import SpartanSystem

    ivc, layout = stack
    proof, z_expected = _chain(ivc, layout, 7, 3)
    sps = SpartanSystem(ivc)
    cp = sps.compress(proof, io_arity=1)
    assert cp.chain.final_W == [] and cp.chain.final_E == []
    assert sps.verify(cp, io_arity=1) == [z_expected]


@pytest.mark.slow
def test_bn254_chunk_proof_end_to_end():
    """ChunkProver on the reference's default engine (main.rs:319-331)."""
    from hotproofs_tpu.core import blake3_ref as b3
    from hotproofs_tpu.models.chunk_prover import ChunkProver

    prover = ChunkProver(curve="bn254")
    data = bytes([3] * 68)  # two blocks, one chunk (ref main.rs:519-525)
    root, proof = prover.prove(data, 0)
    assert root == b3.hash_bytes(data)
    assert prover.verify(proof, expected_hash=root) == root
