"""Oracle tests: pure-Python BLAKE3 vs known vectors + reference test anchors.

Vector provenance:
  - "abc" / quick-brown-fox: widely published BLAKE3 hashes.
  - zero-byte inputs of length 1, 68, 1024, 1028: recorded expected values in
    the reference's own tests (rust_fold/src/main.rs:478-539 comments, which
    print the native blake3 crate's output).
"""

import random

import pytest

from hotproofs_tpu.core import blake3_ref as b3

KNOWN = [
    (b"abc", "6437b3ac38465133ffb63b75273a8db548c558465d79db03fd359c6cd5bd9d85"),
    (
        b"The quick brown fox jumps over the lazy dog",
        "2f1514181aadccd913abd94cfa592701a5686ab23f8df1dff1b74710febc6d4a",
    ),
    # rust_fold/src/main.rs test comments (native blake3 crate outputs):
    (bytes(1), "2d3adedff11b61f14c886e35afa036736dcd87a74d27b5c1510225d0f592e213"),
    (bytes(68), "155e0c74d6aa369966999c8a972e3d92e6266656fd74087fa46531db452965f5"),
    (bytes(1024), "d6fd9de5bccf223f523b316c9cd1cf9a9d87ea42473d68e011dad13f09bf8917"),
    (bytes(1028), "3c94b113d1a2f4e9b90058740c2843f45306e1dfdc3c69be25dd97cdfec89cab"),
]


@pytest.mark.parametrize("data,expected", KNOWN, ids=[f"len{len(d)}" for d, _ in KNOWN])
def test_known_vectors(data, expected):
    assert b3.hash_hex(data) == expected


def test_empty_regression():
    # Frozen from this implementation (single-block path verified via "abc").
    assert b3.hash_hex(b"") == (
        "af1349b9f5f9a1a6a0404dea36dcc9499bcb25c9adc112b7cc9a93cae41f3262"
    )


def test_left_subtree_chunks():
    assert b3.left_subtree_chunks(2) == 1
    assert b3.left_subtree_chunks(3) == 2
    assert b3.left_subtree_chunks(4) == 2
    assert b3.left_subtree_chunks(5) == 4
    assert b3.left_subtree_chunks(9) == 8
    assert b3.left_subtree_chunks(1024) == 512


def _check_path(data: bytes, chunk_idx: int):
    proof = b3.hash_with_path(data, chunk_idx)
    assert proof.root_hash == b3.hash_bytes(data)
    assert proof.chunk_bytes == b3.split_chunks(data)[chunk_idx]
    n_chunks = len(b3.split_chunks(data))
    assert proof.total_depth == b3.full_tree_depth(n_chunks)
    assert proof.leaf_depth == len(proof.parent_path) + 1

    # Re-fold the leaf up through the siblings and compare against the root;
    # this is exactly what the step circuit will do
    # (circuits/blake3_nova.circom:229-248 semantics).
    cv = b3.chunk_chaining_value(
        proof.chunk_bytes, chunk_idx, is_root=(len(proof.parent_path) == 0)
    )
    for level, node in enumerate(reversed(proof.parent_path)):
        is_root = level == len(proof.parent_path) - 1
        if node.down_left:
            cv = b3.parent_cv(cv, node.sibling_cv, is_root)
        else:
            cv = b3.parent_cv(node.sibling_cv, cv, is_root)
    assert b"".join(w.to_bytes(4, "little") for w in cv) == proof.root_hash


@pytest.mark.parametrize("n_chunks", [1, 2, 3, 4, 5, 7, 8, 10, 16, 21])
def test_hash_with_path_all_leaves(n_chunks):
    rng = random.Random(6429)
    data = bytes(rng.randrange(256) for _ in range(1024 * n_chunks - 3))
    for chunk_idx in range(n_chunks):
        _check_path(data, chunk_idx)


def test_hash_with_path_partial_tail():
    data = bytes(3 * 1024 + 5)
    for idx in range(4):
        _check_path(data, idx)


def test_compress_full_output_mode():
    # out[8:16] must be state_hi XOR input h
    # (circuits/blake3_compression.circom:213-227).
    h = list(b3.IV)
    m = b3.words_from_block_bytes(b"xyz")
    out = b3.compress(h, m, 0, 3, 3)
    assert len(out) == 16
    assert all(0 <= w <= 0xFFFFFFFF for w in out)
