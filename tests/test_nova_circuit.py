"""Nova step-circuit chain tests: fold a chunk's blocks + parent path and
check the final z reconstructs the true BLAKE3 root — the TPU-stack analogue
of the reference's Rust integration tests (rust_fold/src/main.rs:351-539).
"""

import random

import pytest

from hotproofs_tpu.core import blake3_ref as b3
from hotproofs_tpu.circuits import blake3_nova as nova
from hotproofs_tpu.circuits.blake3_compression import VESTA_PRIME


def _hash_from_z(z):
    words = z[2:10]
    return b"".join(int(w).to_bytes(4, "little") for w in words)


def _prove_and_check(data: bytes, chunk_idx: int):
    proof = b3.hash_with_path(data, chunk_idx)
    z, witnesses, sched = nova.run_chain(proof)
    assert _hash_from_z(z) == b3.hash_bytes(data)
    # Final counters: all blocks consumed, depth at root.
    assert z[1] == sched.n_blocks
    assert z[11] == 0
    # Every step witness satisfies the R1CS.
    r1cs, _ = nova.get_nova_step_circuit(VESTA_PRIME, 0)
    for w in witnesses:
        assert r1cs.is_satisfied(w)
    return sched


def test_step_circuit_shape():
    r1cs, layout = nova.get_nova_step_circuit(VESTA_PRIME, 0)
    seg_out = layout.segment("z_out")
    seg_in = layout.segment("z_in")
    assert seg_out.start == 1 and seg_out.length == 15
    assert seg_in.start == 16 and seg_in.length == 15
    assert r1cs.n_io == 30
    assert r1cs.n_signals < 25_000 and r1cs.n_constraints < 25_000


def test_one_block_chunk():
    # main.rs:527-532 analogue (4 zero bytes): 1 step.
    sched = _prove_and_check(bytes(4), 0)
    assert sched.num_steps == 1


def test_two_block_chunk():
    # main.rs:519-525 analogue (68 zero bytes): 2 steps.
    sched = _prove_and_check(bytes(68), 0)
    assert sched.num_steps == 2


def test_full_chunk():
    # main.rs:510-517 analogue (1024 zero bytes): 16 steps.
    sched = _prove_and_check(bytes(1024), 0)
    assert sched.num_steps == 16


def test_two_chunk_tree_both_leaves():
    # main.rs:478-486 analogue (1024+4 bytes, chunks 0 and 1).
    data = bytes(1024 + 4)
    _prove_and_check(data, 0)
    _prove_and_check(data, 1)


def test_four_chunk_tree_middle_leaves():
    # main.rs:469-476 analogue (3*1024+5 bytes => 4 chunks, leaves 2 and 3).
    data = bytes(3 * 1024 + 5)
    _prove_and_check(data, 2)
    _prove_and_check(data, 3)


@pytest.mark.parametrize("n_chunks", [3, 5, 6])
def test_non_power_of_two_trees(n_chunks):
    # The reference prover gets these wrong (SURVEY.md §5 / main.rs:73);
    # the redesigned circuit handles arbitrary bao tree shapes.
    rng = random.Random(99)
    data = bytes(rng.randrange(256) for _ in range(1024 * n_chunks - 7))
    for idx in range(n_chunks):
        _prove_and_check(data, idx)


def test_random_chunks():
    # main.rs:497-508 analogue: random sub-chunk sizes.
    rng = random.Random(42)
    for _ in range(3):
        n = rng.randrange(1, 1025)
        data = bytes(rng.randrange(256) for _ in range(n))
        _prove_and_check(data, 0)


def test_wrong_direction_fails():
    # Negative test the reference lacks (main.rs:443 TODO): flipping the
    # direction hint must change the resulting root.
    data = bytes(2048)
    proof = b3.hash_with_path(data, 0)
    sched = nova.build_schedule(proof)
    sched.steps[-1].down_left ^= 1
    z = [v % VESTA_PRIME for v in sched.z0]
    for step in sched.steps:
        _, z = nova.eval_step_witness(z, step)
    assert _hash_from_z(z) != b3.hash_bytes(data)


def test_empty_input():
    _prove_and_check(b"", 0)
