"""Native BLAKE3 tree hasher vs the Python oracle (bit-for-bit)."""

import time

import numpy as np
import pytest

from hotproofs_tpu.core import blake3_ref as b3
from hotproofs_tpu.core import native

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="no C++ toolchain")

SIZES = [0, 1, 63, 64, 65, 1023, 1024, 1025, 3 * 1024 + 17,
         16 * 1024, 100 * 1024 + 333]


@pytest.mark.parametrize("size", SIZES)
def test_hash_matches_oracle(size):
    rng = np.random.RandomState(size & 0xFFFF)
    data = rng.bytes(size)
    assert native.hash_bytes(data) == b3.hash_bytes(data)


def test_known_vectors():
    assert native.hash_bytes(b"abc").hex().startswith("6437b3ac3846")
    assert native.hash_bytes(bytes(68)).hex().startswith("155e0c74d6aa")
    assert native.hash_bytes(bytes(1028)).hex().startswith("3c94b113d1a2")


@pytest.mark.parametrize("size,chunk_idx", [
    (10, 0), (1028, 1), (5 * 1024 + 7, 3), (16 * 1024, 15),
    (11 * 1024, 10),   # non-power-of-two tree, shallow leaf
])
def test_path_matches_oracle(size, chunk_idx):
    rng = np.random.RandomState(size % 97)
    data = rng.bytes(size)
    got = native.hash_with_path(data, chunk_idx)
    want = b3.hash_with_path(data, chunk_idx)
    assert got.root_hash == want.root_hash
    assert got.total_depth == want.total_depth
    assert got.leaf_depth == want.leaf_depth
    assert got.chunk_bytes == want.chunk_bytes
    assert len(got.parent_path) == len(want.parent_path)
    for g_, w_ in zip(got.parent_path, want.parent_path):
        assert g_.down_left == w_.down_left
        assert g_.sibling_cv == w_.sibling_cv


def test_bad_chunk_idx():
    with pytest.raises(AssertionError):
        native.hash_with_path(b"xy", 1)


def test_prover_accepts_native_proof_data():
    """The chunk prover's schedule builder consumes the native HashProof
    identically to the oracle's."""
    from hotproofs_tpu.circuits import blake3_nova as nc
    data = bytes(range(256)) * 10   # 3 chunks
    pd_n = native.hash_with_path(data, 2)
    pd_p = b3.hash_with_path(data, 2)
    zs_n, _ = nc.z_chain(pd_n, nc.VESTA_PRIME)
    zs_p, _ = nc.z_chain(pd_p, nc.VESTA_PRIME)
    assert zs_n == zs_p


def test_throughput_sanity():
    """Native must beat the Python oracle by a wide margin (the point of
    having it); keep the bar modest for CI noise."""
    data = np.random.RandomState(0).bytes(2 * 1024 * 1024)
    native.hash_bytes(data)  # warm
    t0 = time.time()
    native.hash_bytes(data)
    dt_native = time.time() - t0
    t0 = time.time()
    b3.hash_bytes(data[:64 * 1024])
    dt_py_64k = time.time() - t0
    py_rate = 64 * 1024 / max(dt_py_64k, 1e-9)
    native_rate = len(data) / max(dt_native, 1e-9)
    assert native_rate > 20 * py_rate, (native_rate, py_rate)
