"""IVC fold machinery on a tiny step circuit (fast CPU test).

Validates the fold arithmetic, transcript, chaining and final opening
end-to-end without the cost of the full BLAKE3 step circuit (which runs in
test_ivc_blake3.py / bench.py).
"""

import numpy as np
import pytest

from hotproofs_tpu.circuits import gadgets as g
from hotproofs_tpu.circuits.dsl import compile_circuit, eval_witness
from hotproofs_tpu.circuits.blake3_compression import VESTA_PRIME
from hotproofs_tpu.nova.ivc import IVC
from hotproofs_tpu.nova.pedersen import CommitmentKey
from hotproofs_tpu.nova.r1cs import ShapeDevice
from hotproofs_tpu.ops import curve as C

CONST = 7


def toy_step(ctx):
    z_out = ctx.declare_output("z_out", 1)
    z_in = ctx.declare_input("z_in", 1, public=True)
    sq = g.mul(ctx, z_in[0], z_in[0], name="sq")
    cube = g.mul(ctx, sq, z_in[0], name="cube")
    ctx.bind(z_out[0], cube + CONST)


def _toy_f(z, p):
    return (pow(z, 3, p) + CONST) % p


@pytest.fixture(scope="module")
def ivc():
    r1cs, layout = compile_circuit(toy_step, VESTA_PRIME)
    shape = ShapeDevice.from_dsl(r1cs)
    ck = CommitmentKey.create(C.PALLAS, b"toy", max(shape.n_wit, shape.n_cons))
    # toy witness values are full-width field elements: no small-MSM path
    return IVC(shape, C.PALLAS, ck, None), r1cs, layout


def _witness_chain(layout, z0, n_steps, p):
    z = z0 % p
    out = []
    for _ in range(n_steps):
        w = eval_witness(toy_step, layout, {"z_in": [z]})
        out.append(w)
        z = _toy_f(z, p)
    return out, z


def test_toy_ivc_roundtrip(ivc):
    ivc_obj, r1cs, layout = ivc
    p = VESTA_PRIME
    z0 = 3
    wits, z_expected = _witness_chain(layout, z0, 5, p)
    proof = ivc_obj.prove([z0], wits)
    z_final = ivc_obj.verify(proof, io_arity=1)
    assert z_final == [z_expected]
    assert proof.num_steps == 5


def test_toy_ivc_rejects_tampered_io(ivc):
    ivc_obj, r1cs, layout = ivc
    z0 = 3
    wits, _ = _witness_chain(layout, z0, 3, VESTA_PRIME)
    proof = ivc_obj.prove([z0], wits)
    proof.steps[-1].X[0] = (proof.steps[-1].X[0] + 1) % VESTA_PRIME
    with pytest.raises(AssertionError):
        ivc_obj.verify(proof, io_arity=1)


@pytest.mark.slow
def test_toy_ivc_rejects_tampered_witness(ivc):
    ivc_obj, r1cs, layout = ivc
    z0 = 4
    wits, _ = _witness_chain(layout, z0, 3, VESTA_PRIME)
    proof = ivc_obj.prove([z0], wits)
    proof.final_W[0] = (proof.final_W[0] + 1) % VESTA_PRIME
    with pytest.raises(AssertionError):
        ivc_obj.verify(proof, io_arity=1)


@pytest.mark.slow
def test_toy_ivc_rejects_broken_chain(ivc):
    ivc_obj, r1cs, layout = ivc
    p = VESTA_PRIME
    wits1, _ = _witness_chain(layout, 3, 2, p)
    wits2, _ = _witness_chain(layout, 5, 1, p)  # unrelated step
    proof = ivc_obj.prove([3], wits1 + wits2)
    with pytest.raises(AssertionError, match="chaining"):
        ivc_obj.verify(proof, io_arity=1)


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path, ivc):
    ivc_obj, r1cs, layout = ivc
    wits, z_exp = _witness_chain(layout, 9, 2, VESTA_PRIME)
    proof = ivc_obj.prove([9], wits)
    path = str(tmp_path / "proof.pkl")
    proof.save(path)
    from hotproofs_tpu.nova.ivc import IVCProof
    loaded = IVCProof.load(path)
    assert ivc_obj.verify(loaded, io_arity=1) == [z_exp]
