"""End-to-end BLAKE3 chunk proof via the full Nova stack (slow; run with
`pytest -m slow`). The default CI pass exercises the same machinery on the
toy circuit (test_ivc_toy.py); bench.py runs this end-to-end on real TPU."""

import pytest

from hotproofs_tpu.core import blake3_ref as b3
from hotproofs_tpu.models.chunk_prover import ChunkProver

pytestmark = pytest.mark.slow


def test_single_block_chunk_proof():
    prover = ChunkProver()
    data = bytes([7] * 10)
    root, proof = prover.prove(data, 0)
    assert root == b3.hash_bytes(data)
    got = prover.verify(proof, expected_hash=root)
    assert got == root


def test_two_chunk_tree_proof():
    prover = ChunkProver()
    data = bytes(1028)
    root, proof = prover.prove(data, 1)
    assert root == b3.hash_bytes(data)
    assert prover.verify(proof) == root
    # Tamper: claim a different chunk index.
    proof.chunk_idx = 0
    with pytest.raises(AssertionError):
        prover.verify(proof)
