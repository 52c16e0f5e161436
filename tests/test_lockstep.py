"""Lockstep multi-chain folding (IVC.prove_lockstep).

The TPU throughput design: K independent fold chains advance together,
every per-fold device launch vmapped over the chain axis (the per-fold cost
on TPU is sequential-launch-bound, so K chains cost ~the same wall time as
one). Correctness bar: each lockstep proof must be BIT-IDENTICAL to the
proof the plain batched prover (prove_batch) emits for that chain alone —
same transcripts, same challenges, same accumulator.

Runs on the toy step circuit (fast CPU); the real-chunk lockstep path is
exercised by test_lockstep_chunk_proofs (slow) and bench.py on TPU.
"""

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

pytestmark = pytest.mark.slow  # multi-minute XLA:CPU compiles (round-5 suite curation:
# the default suite must finish <10 min on a 4-core host; run with -m slow)



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
    ck = CommitmentKey.create(C.PALLAS, b"toy-lock",
                              max(shape.n_wit, shape.n_cons))
    ivc = IVC(shape, C.PALLAS, ck, None)

    def make_chain(z0: int, n_steps: int):
        z, wits = z0 % p, []
        for _ in range(n_steps):
            w = eval_witness(_toy_step, layout, {"z_in": [z]})
            wits.append([int(v) for v in w])
            z = (pow(z, 3, p) + 7) % p
        spec = shape.field
        canon = jnp.asarray(np.stack([spec.batch_to_limbs(w) for w in wits]))
        X_host = [[int(v) % p for v in w[1:1 + shape.n_io]] for w in wits]
        return ([z0], canon, X_host), z

    return ivc, make_chain


def _proof_key(p):
    return (p.z0, [s.X for s in p.steps], [s.comm_W for s in p.steps],
            p.comm_Ts, p.final_W, p.final_E, p.pp_digest)


def test_lockstep_matches_per_chain(stack):
    ivc, make_chain = stack
    chains, finals = [], []
    for z0, n in ((3, 4), (11, 4), (29, 4)):
        ch, zf = make_chain(z0, n)
        chains.append(ch)
        finals.append(zf)
    lock = ivc.prove_lockstep(chains, chunk_steps=2)
    for ch, zf, lp in zip(chains, finals, lock):
        single = ivc.prove_batch(*ch, chunk_steps=2)
        assert _proof_key(lp) == _proof_key(single), \
            "lockstep proof differs from the standalone prover's"
        assert ivc.verify(lp, io_arity=1) == [zf]


def test_lockstep_ragged_lengths(stack):
    """Chains of different lengths: finished chains idle with r=0 no-op
    folds; every proof still matches its standalone equivalent."""
    ivc, make_chain = stack
    chains, finals = [], []
    for z0, n in ((5, 1), (7, 3), (13, 5)):
        ch, zf = make_chain(z0, n)
        chains.append(ch)
        finals.append(zf)
    lock = ivc.prove_lockstep(chains, chunk_steps=2)
    for ch, zf, lp in zip(chains, finals, lock):
        single = ivc.prove_batch(*ch, chunk_steps=2)
        assert _proof_key(lp) == _proof_key(single)
        assert ivc.verify(lp, io_arity=1) == [zf]


def test_lockstep_single_chain(stack):
    ivc, make_chain = stack
    ch, zf = make_chain(17, 3)
    (lp,) = ivc.prove_lockstep([ch])
    assert _proof_key(lp) == _proof_key(ivc.prove_batch(*ch))
    assert ivc.verify(lp, io_arity=1) == [zf]


def test_lockstep_segments(stack):
    """Segment-parallel proving in lockstep mode == thread-pool mode."""
    from hotproofs_tpu.parallel.segments import (prove_segments,
                                                 verify_segments)
    ivc, make_chain = stack
    p = VESTA_PRIME
    (z0, canon, X_host), zf = make_chain(3, 9)
    zs = [[3]]
    z = 3
    for _ in range(9):
        z = (pow(z, 3, p) + 7) % p
        zs.append([z])
    lock = prove_segments(ivc, zs, canon, X_host, 3, lockstep=True)
    assert verify_segments(ivc, lock, io_arity=1) == [zf]
    pool = prove_segments(ivc, zs, canon, X_host, 3)
    assert lock.to_dict() == pool.to_dict(), \
        "lockstep segmented proof differs from thread-pool proof"


@pytest.mark.slow
def test_lockstep_chunk_proofs():
    """prove_many on the real BLAKE3 circuit: two chunks of one file in
    lockstep, each proof verifies standalone."""
    from hotproofs_tpu.core import blake3_ref as b3
    from hotproofs_tpu.models.chunk_prover import ChunkProver

    prover = ChunkProver()
    data = bytes(range(256)) * 9  # 3 chunks (2304 bytes)
    root, proofs = prover.prove_many(data, [0, 2])
    assert root == b3.hash_bytes(data)
    for pr in proofs:
        assert prover.verify(pr, expected_hash=root) == root
