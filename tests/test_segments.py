"""Segment-parallel proving (SURVEY.md §2c #3 — the 2^16-step-chain story).

Fast tests run the toy circuit; the real-chunk end-to-end segmented proof
is slow-marked (full-width CPU commits take minutes)."""

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
from hotproofs_tpu.parallel.segments import (SegmentedProof, prove_segments,
                                             split_plan, verify_segments)

pytestmark = pytest.mark.slow  # multi-minute XLA:CPU compiles (round-5 curation)


def _toy_step(ctx):
    z_out = ctx.declare_output("z_out", 1)
    z_in = ctx.declare_input("z_in", 1, public=True)
    sq = g.mul(ctx, z_in[0], z_in[0], name="sq")
    cube = g.mul(ctx, sq, z_in[0], name="cube")
    ctx.bind(z_out[0], cube + 7)


@pytest.fixture(scope="module")
def stack():
    p = VESTA_PRIME
    r1cs, layout = compile_circuit(_toy_step, p)
    shape = ShapeDevice.from_dsl(r1cs)
    ck = CommitmentKey.create(C.PALLAS, b"toy-seg",
                              max(shape.n_wit, shape.n_cons))
    ivc = IVC(shape, C.PALLAS, ck, None)

    n_steps = 9
    z = 3
    zs, wits = [[z]], []
    for _ in range(n_steps):
        w = eval_witness(_toy_step, layout, {"z_in": [z]})
        wits.append([int(v) for v in w])
        z = (pow(z, 3, p) + 7) % p
        zs.append([z])
    spec = shape.field
    canon = jnp.asarray(np.stack([spec.batch_to_limbs(w) for w in wits]))
    X_host = [[int(v) % p for v in w[1:1 + shape.n_io]] for w in wits]
    return ivc, zs, canon, X_host


def test_split_plan():
    assert split_plan(9, 4) == [(0, 3), (3, 5), (5, 7), (7, 9)]
    assert split_plan(4, 8) == [(0, 1), (1, 2), (2, 3), (3, 4)]
    assert split_plan(16, 1) == [(0, 16)]


def test_segmented_matches_single_chain(stack):
    ivc, zs, canon, X_host = stack
    single = ivc.prove_batch(zs[0], canon, X_host)
    seg = prove_segments(ivc, zs, canon, X_host, n_segments=3)
    assert seg.num_steps == single.num_steps
    z_seg = verify_segments(ivc, seg, io_arity=1)
    assert z_seg == ivc.verify(single, io_arity=1)


def test_segments_on_devices(stack, tmp_path):
    """Pin segments to distinct devices of the 8-device CPU mesh; proof
    bytes must be identical to the unpinned run, and survive save/load."""
    import jax
    ivc, zs, canon, X_host = stack
    seg = prove_segments(ivc, zs, canon, X_host, n_segments=4,
                         devices=jax.devices())
    base = prove_segments(ivc, zs, canon, X_host, n_segments=4)
    assert seg.to_dict() == base.to_dict()
    path = str(tmp_path / "seg.json")
    seg.save(path)
    loaded = SegmentedProof.load(path)
    assert verify_segments(ivc, loaded, io_arity=1) == \
        verify_segments(ivc, seg, io_arity=1)


def test_multihost_slicing(stack):
    """Process i proves segments [i::n]; composing the two halves verifies
    (the single-host simulation of the multi-process flow)."""
    ivc, zs, canon, X_host = stack
    half0 = prove_segments(ivc, zs, canon, X_host, n_segments=4,
                           my_segments=[0, 2])
    half1 = prove_segments(ivc, zs, canon, X_host, n_segments=4,
                           my_segments=[1, 3])
    composed = SegmentedProof(segments=[
        half0.segments[0], half1.segments[1],
        half0.segments[2], half1.segments[3]])
    verify_segments(ivc, composed, io_arity=1)


def test_broken_boundary_rejected(stack):
    ivc, zs, canon, X_host = stack
    seg = prove_segments(ivc, zs, canon, X_host, n_segments=3)
    # Swap two segments: boundaries no longer chain.
    seg.segments[1], seg.segments[2] = seg.segments[2], seg.segments[1]
    with pytest.raises(AssertionError, match="chain"):
        verify_segments(ivc, seg, io_arity=1)


def test_missing_segment_rejected(stack):
    ivc, zs, canon, X_host = stack
    seg = prove_segments(ivc, zs, canon, X_host, n_segments=3,
                         my_segments=[0, 2])
    with pytest.raises(AssertionError, match="missing"):
        verify_segments(ivc, seg, io_arity=1)


@pytest.mark.slow
def test_segmented_chunk_proof_end_to_end():
    from hotproofs_tpu.core import blake3_ref as b3
    from hotproofs_tpu.models.chunk_prover import (ChunkProver,
                                                   SegmentedChunkProof)
    prover = ChunkProver()
    data = bytes(1024)  # 16 blocks -> 16 steps
    root, proof = prover.prove_segmented(data, 0, n_segments=4)
    assert root == b3.hash_bytes(data)
    assert prover.verify_segmented(proof, expected_hash=root) == root
    # Tampered statement must fail.
    proof.chunk_idx = 1
    with pytest.raises(AssertionError):
        prover.verify_segmented(proof)


def test_lockstep_waves_with_checkpoint_resume(stack, tmp_path):
    """ONE chain proved as 4 segments in lockstep waves of 2, with
    checkpointing: a 'killed' first run persists wave 1's segments; the
    rerun resumes them and proves only the rest. Proof bytes must equal the
    single-shot lockstep proof (round-4: lockstep + checkpoint_dir compose
    — VERDICT r03 next #3)."""
    from hotproofs_tpu.utils import telemetry as T

    ivc, zs, canon, X_host = stack
    want = prove_segments(ivc, zs, canon, X_host, n_segments=4,
                          lockstep=True)
    ck1 = str(tmp_path / "ck")
    # Emulate a mid-run kill after wave 1: prove fully once (persisting all
    # four segment checkpoints), then delete wave 2's checkpoints — the
    # rerun sees exactly the state a killed-after-wave-1 run leaves behind.
    full = prove_segments(ivc, zs, canon, X_host, n_segments=4,
                          lockstep=True, lockstep_group=2,
                          checkpoint_dir=ck1)
    import os
    for k in (2, 3):
        os.remove(os.path.join(ck1, f"segment_{k:05d}.json"))
    before = T.metrics.counters.get("segments/resumed", 0)
    redo = prove_segments(ivc, zs, canon, X_host, n_segments=4,
                          lockstep=True, lockstep_group=2,
                          checkpoint_dir=ck1)
    resumed = T.metrics.counters.get("segments/resumed", 0) - before
    assert resumed == 2
    for a, b in zip(want.segments, full.segments):
        assert a.to_dict() == b.to_dict()
    for a, b in zip(want.segments, redo.segments):
        assert a.to_dict() == b.to_dict()
    assert verify_segments(ivc, redo, io_arity=1) == \
        verify_segments(ivc, want, io_arity=1)
