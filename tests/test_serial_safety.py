"""Safe proof serialization: JSON-only formats, hostile-file behavior.

The round-1 pickle format made the verify path execute attacker-controlled
bytecode (ADVICE.md); these tests pin the data-only JSON replacement
(reference parity: serde JSON keys/proofs, rust_fold/src/main.rs:337-346).
"""

import json

import pytest

from hotproofs_tpu.nova import serial


def test_roundtrip(tmp_path):
    path = str(tmp_path / "x.json")
    serial.dump("thing", {"a": [1, 2 ** 300], "pt": serial.enc_point((3, 4))},
                path)
    d = serial.load("thing", path)
    assert d["a"] == [1, 2 ** 300]
    assert serial.dec_point(d["pt"]) == (3, 4)
    assert serial.dec_point(serial.enc_point(None)) is None


def test_rejects_wrong_kind(tmp_path):
    path = str(tmp_path / "x.json")
    serial.dump("proof", {}, path)
    with pytest.raises(ValueError, match="kind"):
        serial.load("checkpoint", path)


def test_rejects_not_ours(tmp_path):
    path = str(tmp_path / "x.json")
    with open(path, "w") as f:
        json.dump({"something": "else"}, f)
    with pytest.raises(ValueError):
        serial.load("proof", path)


def test_rejects_pickle_bytes(tmp_path):
    """A pickle file (the old format / an attack payload) must be rejected
    by the JSON parser, never executed."""
    import pickle
    path = str(tmp_path / "x.bin")
    with open(path, "wb") as f:
        pickle.dump({"format": "hotproofs_tpu"}, f)
    with pytest.raises(Exception):
        serial.load("proof", path)


def test_rejects_wrong_version(tmp_path):
    path = str(tmp_path / "x.json")
    serial.dump("proof", {}, path)
    with open(path) as f:
        doc = json.load(f)
    doc["version"] = 999
    with open(path, "w") as f:
        json.dump(doc, f)
    with pytest.raises(ValueError, match="version"):
        serial.load("proof", path)
