"""Compression circuit vs oracle: the TPU-stack analogue of the reference's
TS harness (test/blake3_hash.test.ts:17-60), which checks the circom circuit
against the vendored JS BLAKE3 on a default block plus randomized b/t cases.
"""

import random

import pytest

from hotproofs_tpu.core import blake3_ref as b3
from hotproofs_tpu.circuits.blake3_compression import (
    BN254_PRIME,
    VESTA_PRIME,
    compression_witness,
    get_compression_circuit,
)


def _run_case(h, m, t0, t1, b, d, modulus=VESTA_PRIME):
    r1cs, layout = get_compression_circuit(modulus)
    w = compression_witness(h, m, [t0, t1], b, d, modulus)
    assert r1cs.is_satisfied(w)
    out_seg = layout.segment("out")
    got = [int(w[out_seg.start + i]) for i in range(16)]
    expected = b3.compress(list(h), list(m), (t1 << 32) | t0, b, d)
    assert got == expected


def test_circuit_shape():
    r1cs, layout = get_compression_circuit(VESTA_PRIME)
    # Bit-centric redesign target: well under the reference's 69,380 signals
    # (build/blake3_compression/blake3_compression.sym).
    assert r1cs.n_signals < 30_000
    assert r1cs.n_constraints < 30_000
    assert r1cs.n_io == 16  # groth16_vkey.json:4 nPublic == 16


def test_default_block():
    rng = random.Random(6429)
    m = [rng.getrandbits(32) for _ in range(16)]
    _run_case(list(b3.IV), m, 0, 0, 64, 0)


@pytest.mark.parametrize("seed", range(5))
def test_randomized_blocks(seed):
    # Mirrors the reference's randomized loop (test/blake3_hash.test.ts:39-59):
    # b a multiple of 4 <= 64, d = CHUNK_START|CHUNK_END, random t0/t1.
    rng = random.Random(1000 + seed)
    b = (rng.getrandbits(32) % 16) * 4
    m = [rng.getrandbits(32) for _ in range(16)]
    _run_case(list(b3.IV), m, rng.getrandbits(32), rng.getrandbits(32), b, 3)


def test_real_block_hash_parity():
    # One real single-block chunk end-to-end: circuit out[0:8] must equal the
    # chunk chaining value the oracle computes.
    data = b"The quick brown fox jumps over the lazy dog"
    m = b3.words_from_block_bytes(data)
    d = b3.CHUNK_START | b3.CHUNK_END | b3.ROOT
    r1cs, layout = get_compression_circuit(VESTA_PRIME)
    w = compression_witness(list(b3.IV), m, [0, 0], len(data), d)
    out_seg = layout.segment("out")
    cv = [int(w[out_seg.start + i]) for i in range(8)]
    assert b"".join(x.to_bytes(4, "little") for x in cv) == b3.hash_bytes(data)


def test_bn254_field_variant():
    rng = random.Random(7)
    m = [rng.getrandbits(32) for _ in range(16)]
    _run_case(list(b3.IV), m, 5, 0, 64, 3, modulus=BN254_PRIME)


def test_tampered_witness_rejected():
    r1cs, layout = get_compression_circuit(VESTA_PRIME)
    rng = random.Random(3)
    m = [rng.getrandbits(32) for _ in range(16)]
    w = compression_witness(list(b3.IV), m, [0, 0], 64, 0)
    w_bad = w.copy()
    w_bad[layout.segment("out").start] = (int(w_bad[layout.segment("out").start]) + 1) % VESTA_PRIME
    assert not r1cs.is_satisfied(w_bad)
