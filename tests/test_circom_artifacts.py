"""Parsers for foreign circom artifacts, validated against the reference's
checked-in build outputs (the only recorded circuit executions available:
SURVEY.md §7 P0 asks for .r1cs/.sym/.wtns readers; the .r1cs blobs are
stripped from the mount so the R1CS reader round-trips synthetic bytes).

The strongest check here is cross-system: the reference's recorded BN254
witness (build/blake3_compression/testInp/witness.wtns) feeds its recorded
inputs through OUR pure-Python BLAKE3 oracle, which must reproduce the
recorded circuit outputs bit-for-bit — oracle parity with an actual
reference execution, not just with published test vectors.
"""

import os

import pytest

from hotproofs_tpu.core import blake3_ref as b3
from hotproofs_tpu.core import circom_artifacts as ca

REF = "/root/reference/build/blake3_compression"
BN254_PRIME = 21888242871839275222246405745257275088548364400416034343698204186575808495617


needs_ref = pytest.mark.skipif(
    not os.path.exists(REF), reason="reference artifacts not mounted")


@pytest.fixture(scope="module")
def sym():
    return ca.parse_sym(os.path.join(REF, "blake3_compression.sym"))


@pytest.fixture(scope="module")
def wtns():
    return ca.parse_wtns(os.path.join(REF, "testInp", "witness.wtns"))


@needs_ref
def test_sym_parses_full_table(sym):
    # The reference circuit has exactly 69,380 signals (SURVEY.md §6).
    assert sym.n_signals == 69380
    assert len(sym.entries) == 69380
    # Public outputs occupy witness slots 1..16 (slot 0 is the constant 1).
    assert [sym.witness_index(f"main.out[{i}]") for i in range(16)] == \
        list(range(1, 17))
    # Optimized-out signals report witness_idx -1 and raise on lookup.
    dropped = [e for e in sym.entries if e.witness_idx < 0]
    assert dropped, "circom -O1+ always eliminates some signals"
    with pytest.raises(KeyError):
        sym.witness_index(dropped[0].name)


@needs_ref
def test_wtns_parses_recorded_witness(wtns):
    assert wtns.prime == BN254_PRIME
    assert len(wtns) == 24093
    assert wtns.values[0] == 1, "wire 0 must be the constant 1"
    assert all(0 <= v < wtns.prime for v in wtns.values)


@needs_ref
def test_recorded_inputs_reproduce_recorded_outputs(sym, wtns):
    """Oracle parity vs an actual reference execution: read (h, m, t, b, d)
    out of the recorded witness, run our compression oracle, compare with
    the recorded main.out[0..15] (== testInp/public.json)."""
    import json

    def sig(name):
        return wtns.values[sym.witness_index(name)]

    h = [sig(f"main.h[{i}]") for i in range(8)]
    m = [sig(f"main.m[{i}]") for i in range(16)]
    t = sig("main.t[0]") | (sig("main.t[1]") << 32)
    b = sig("main.b")
    d = sig("main.d")
    got = b3.compress(h, m, t, b, d)
    recorded = [sig(f"main.out[{i}]") for i in range(16)]
    assert got == recorded

    with open(os.path.join(REF, "testInp", "public.json")) as f:
        public = [int(v) for v in json.load(f)]
    assert recorded == public


def test_r1cs_roundtrip(tmp_path):
    """Spec-conformant writer/reader round-trip (reference .r1cs blobs are
    stripped: .MISSING_LARGE_BLOBS)."""
    r = ca.R1CS(
        prime=BN254_PRIME, n_wires=5, n_pub_out=1, n_pub_in=1, n_prv_in=1,
        n_labels=7,
        constraints=[
            ([(1, 1)], [(2, 1)], [(3, 1)]),
            ([(3, 2), (0, 5)], [(4, BN254_PRIME - 1)], []),
        ],
        wire_to_label=[0, 1, 2, 5, 6],
    )
    path = str(tmp_path / "toy.r1cs")
    ca.write_r1cs(path, r)
    back = ca.parse_r1cs(path)
    assert back.prime == r.prime
    assert (back.n_wires, back.n_pub_out, back.n_pub_in, back.n_prv_in,
            back.n_labels) == (5, 1, 1, 1, 7)
    assert back.constraints == r.constraints
    assert back.wire_to_label == r.wire_to_label


def test_wtns_rejects_bad_magic(tmp_path):
    path = str(tmp_path / "bad.wtns")
    with open(path, "wb") as f:
        f.write(b"nope" + b"\0" * 100)
    with pytest.raises(ValueError, match="magic"):
        ca.parse_wtns(path)


def test_container_rejects_truncation(tmp_path):
    import struct
    path = str(tmp_path / "trunc.wtns")
    with open(path, "wb") as f:
        f.write(b"wtns" + struct.pack("<II", 2, 1)
                + struct.pack("<IQ", 1, 1 << 20))
    with pytest.raises(ValueError, match="truncated"):
        ca.parse_wtns(path)
