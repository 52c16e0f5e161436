"""Standalone verification-key export/import (nova/vk.py).

Reference parity: vk_zm.json + proof.json for an external verifier
(rust_fold/src/main.rs:334-346). The vk must fully reconstruct a verifier —
no circuit DSL, no prover machinery — and a tampered vk must be rejected.
"""

import json

import jax.numpy as jnp
import numpy as np
import pytest

import hotproofs_tpu.ops.curve as C
from hotproofs_tpu.circuits import gadgets as g
from hotproofs_tpu.circuits.blake3_compression import VESTA_PRIME
from hotproofs_tpu.circuits.dsl import compile_circuit, eval_witness
from hotproofs_tpu.nova.ivc import IVC
from hotproofs_tpu.nova.pedersen import CommitmentKey
from hotproofs_tpu.nova.r1cs import ShapeDevice
from hotproofs_tpu.nova.vk import export_vk, ivc_from_vk

pytestmark = pytest.mark.slow  # multi-minute XLA:CPU compiles (round-5 suite curation:
# the default suite must finish <10 min on a 4-core host; run with -m slow)



def _toy_step(ctx):
    z_out = ctx.declare_output("z_out", 1)
    z_in = ctx.declare_input("z_in", 1, public=True)
    sq = g.mul(ctx, z_in[0], z_in[0], name="sq")
    cube = g.mul(ctx, sq, z_in[0], name="cube")
    ctx.bind(z_out[0], cube + 7)


@pytest.fixture(scope="module")
def proven():
    p = VESTA_PRIME
    r1cs, layout = compile_circuit(_toy_step, p)
    shape = ShapeDevice.from_dsl(r1cs)
    ck = CommitmentKey.create(C.PALLAS, b"toy-vk",
                              max(shape.n_wit, shape.n_cons))
    ivc = IVC(shape, C.PALLAS, ck, None, label=b"toy-vk-ivc")
    z, wits = 3, []
    for _ in range(4):
        w = eval_witness(_toy_step, layout, {"z_in": [z]})
        wits.append([int(v) for v in w])
        z = (pow(z, 3, p) + 7) % p
    spec = shape.field
    canon = jnp.asarray(np.stack([spec.batch_to_limbs(w) for w in wits]))
    X_host = [[int(v) % p for v in w[1:1 + shape.n_io]] for w in wits]
    proof = ivc.prove_batch([3], canon, X_host, chunk_steps=2)
    return ivc, proof, z


def test_vk_roundtrip_verifies(proven, tmp_path):
    ivc, proof, zf = proven
    vk_path = str(tmp_path / "vk.json")
    export_vk(ivc, vk_path, statement="toy", io_arity=1)
    ivc2 = ivc_from_vk(vk_path)
    assert ivc2.pp_digest == ivc.pp_digest
    assert ivc2.verify(proof, io_arity=1) == [zf]


def test_vk_tamper_rejected(proven, tmp_path):
    ivc, proof, _ = proven
    vk_path = str(tmp_path / "vk.json")
    export_vk(ivc, vk_path, statement="toy", io_arity=1)
    with open(vk_path) as f:
        doc = json.load(f)
    doc["A"]["vals"][0] = int(doc["A"]["vals"][0]) + 1
    bad = str(tmp_path / "vk_bad.json")
    with open(bad, "w") as f:
        json.dump(doc, f)
    with pytest.raises(AssertionError, match="pp digest"):
        ivc_from_vk(bad)


def test_vk_wrong_claimed_digest_rejected(proven, tmp_path):
    ivc, _, _ = proven
    vk_path = str(tmp_path / "vk.json")
    export_vk(ivc, vk_path, statement="toy", io_arity=1)
    with open(vk_path) as f:
        doc = json.load(f)
    doc["pp_digest"] = int(doc["pp_digest"]) ^ 1
    bad = str(tmp_path / "vk_bad2.json")
    with open(bad, "w") as f:
        json.dump(doc, f)
    with pytest.raises(AssertionError, match="pp digest"):
        ivc_from_vk(bad)


@pytest.mark.slow
def test_vk_chunk_proof_roundtrip(tmp_path):
    """Real circuit: export vk, verify a chunk proof with verify_with_vk —
    the prover stack is not reachable from the verify call."""
    from hotproofs_tpu.core import blake3_ref as b3
    from hotproofs_tpu.models.chunk_prover import (ChunkProver,
                                                   verify_with_vk)

    prover = ChunkProver()
    data = bytes(range(68)) * 1
    root, proof = prover.prove(data, 0)
    vk_path = str(tmp_path / "vk.json")
    prover.export_vk(vk_path)
    got = verify_with_vk(vk_path, proof, expected_hash=b3.hash_bytes(data))
    assert got == root


def test_vk_adopts_neptune_spec_in_default_process(tmp_path, monkeypatch):
    """A vk exported under HOTPROOFS_POSEIDON=neptune verifies in a process
    running the DEFAULT spec: ivc_from_vk ADOPTS the vk's recorded
    (t, R_F, R_P) instead of asserting it matches the local env
    (VERDICT r03 missing #3 / next #7)."""
    from hotproofs_tpu.utils.config import CONFIG

    monkeypatch.setattr(CONFIG, "poseidon", "neptune")
    p = VESTA_PRIME
    r1cs, layout = compile_circuit(_toy_step, p)
    shape = ShapeDevice.from_dsl(r1cs)
    ck = CommitmentKey.create(C.PALLAS, b"toy-vk",
                              max(shape.n_wit, shape.n_cons))
    ivc = IVC(shape, C.PALLAS, ck, None, label=b"toy-vk-ivc")
    z, wits = 3, []
    for _ in range(3):
        w = eval_witness(_toy_step, layout, {"z_in": [z]})
        wits.append([int(v) for v in w])
        z = (pow(z, 3, p) + 7) % p
    proof = ivc.prove([3], wits)
    vk_path = str(tmp_path / "vk_nep.json")
    export_vk(ivc, vk_path, statement="toy", io_arity=1)
    with open(vk_path) as f:
        assert json.load(f)["poseidon"]["r_partial"] == 55  # neptune t=3

    # Back on the default spec: the loaded verifier must still accept.
    monkeypatch.setattr(CONFIG, "poseidon", "default")
    ivc2 = ivc_from_vk(vk_path)
    assert ivc2.pspec is not None and ivc2.pspec.r_partial == 55
    assert ivc2.verify(proof, io_arity=1) == [z]
    # ... while a default-spec verifier WITHOUT the vk rejects (different
    # challenge stream), proving the adopt path is what makes it work.
    ivc_local = IVC(shape, C.PALLAS, ck, None, label=b"toy-vk-ivc")
    with pytest.raises(AssertionError):
        ivc_local.verify(proof, io_arity=1)
