"""Standalone verification-key export/import.

Reference parity: rust_fold writes `vk_zm.json` + `proof.json` for an
external (Solidity) verifier (rust_fold/src/main.rs:334-337,342-346). This
module is the equivalent for the fold stack: `export_vk` emits a
self-contained JSON document from which `ivc_from_vk` reconstructs a
verifier-capable IVC WITHOUT compiling the circuit DSL or building any
prover machinery:

  * the R1CS shape ships as raw COO triples (canonical-int values);
  * the commitment key ships as (label, n) — generators are re-derived
    deterministically via hash-to-curve (ops/curve.derive_generators), so
    the vk stays small; an optional generator digest binds the derivation;
  * the Poseidon transcript parameterisation ships as (t, R_F, R_P) so a
    foreign verifier knows the exact Fiat-Shamir sponge;
  * the pp digest is RECOMPUTED from the reconstructed shape+key and must
    equal both the vk's claim and the proof's pp_digest — a tampered vk
    cannot redirect a proof to a different circuit.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..ops import curve as C
from ..ops import field as F
from . import serial
from .ivc import IVC
from .pedersen import CommitmentKey
from .r1cs import ShapeDevice, SparseMat, _mat_from_coo
from .transcript import transcript_poseidon_params


def _mat_to_dict(spec: F.FieldSpec, m: SparseMat) -> dict:
    rinv = pow(spec.r_mod_p, spec.p - 2, spec.p)
    vals = [int(F.limbs_to_int(v)) * rinv % spec.p for v in m.vals_mont]
    return {
        "rows": [int(r) for r in m.rows],
        "cols": [int(c) for c in m.cols],
        "vals": vals,
    }


def export_vk(ivc: IVC, path: str, statement: str = "blake3-chunk",
              io_arity: Optional[int] = None) -> None:
    shape = ivc.shape
    if ivc.pspec is not None:
        t, r_full, r_partial = (ivc.pspec.t, ivc.pspec.r_full,
                                ivc.pspec.r_partial)
    else:
        t, r_full, r_partial = transcript_poseidon_params(shape.field.name)
    serial.dump("verification_key", {
        "curve": ivc.curve.name,
        "field": shape.field.name,
        "label": ivc.label.decode(),
        "ck_label": ivc.ck.label.decode(),
        "ck_n": int(ivc.ck.n),
        "n_cons": int(shape.n_cons),
        "n_vars": int(shape.n_vars),
        "n_io": int(shape.n_io),
        "A": _mat_to_dict(shape.field, shape.A),
        "B": _mat_to_dict(shape.field, shape.B),
        "C": _mat_to_dict(shape.field, shape.C),
        "poseidon": {"t": t, "r_full": r_full, "r_partial": r_partial},
        "pp_digest": int(ivc.pp_digest),
        "statement": statement,
        "io_arity": int(io_arity) if io_arity is not None else None,
    }, path)


def ivc_from_vk(path: str) -> IVC:
    """Reconstruct a verifier-capable IVC from a vk document.

    The prover stack is never built: no DSL compile, no witness machinery.
    Raises if the recomputed pp digest disagrees with the vk's claim."""
    d = serial.load("verification_key", path)
    curve = C.CURVES[d["curve"]]
    spec = F.FIELDS[d["field"]]
    assert curve.scalar.p == spec.p, "vk curve/field mismatch"
    n_cons = int(d["n_cons"])
    mats = []
    for k in ("A", "B", "C"):
        md = d[k]
        rows = np.asarray([int(v) for v in md["rows"]], np.int64)
        cols = np.asarray([int(v) for v in md["cols"]], np.int64)
        vals = np.asarray([int(v) % spec.p for v in md["vals"]],
                          dtype=object)
        assert len(rows) == len(cols) == len(vals), "vk matrix ragged"
        assert rows.size == 0 or (0 <= rows.min()
                                  and rows.max() < n_cons), "vk row range"
        assert cols.size == 0 or (0 <= cols.min()
                                  and cols.max() < int(d["n_vars"])), \
            "vk col range"
        mats.append(_mat_from_coo(spec, rows, cols, vals, n_cons))
    shape = ShapeDevice(spec, n_cons, int(d["n_vars"]), int(d["n_io"]),
                        *mats)
    # ADOPT the vk's recorded sponge parameterisation rather than asserting
    # it matches this process's HOTPROOFS_POSEIDON selection: both the
    # default and the neptune-parameterised spec draw constants from the
    # same Grain stream keyed by (n_bits, t, R_F, R_P), so (t, R_F, R_P)
    # fully determines the transcript. A vk exported under
    # HOTPROOFS_POSEIDON=neptune therefore verifies in a default-spec
    # process and vice versa.
    from ..ops import poseidon as P
    pd = d["poseidon"]
    t, r_full, r_partial = (int(pd["t"]), int(pd["r_full"]),
                            int(pd["r_partial"]))
    # Validate the adopted sponge BEFORE building anything from it:
    # (a) structural ranges (t > 16 would hand the native sponge registry
    # a negative handle — round-4 advisor finding); (b) a security lower
    # bound — the round numbers must be at least neptune's search result
    # for this arity, so a vk cannot degrade the permutation to a
    # grindable near-linear map. pp_digest additionally binds (t,R_F,R_P)
    # (nova/ivc.py), so a degraded-sponge vk also fails the digest check.
    assert 2 <= t <= 16, f"vk poseidon t={t} out of range [2,16]"
    rf_min, rp_min = P.neptune_round_numbers(t, n_bits=255)
    assert r_full >= rf_min and r_partial >= rp_min, (
        f"vk poseidon rounds ({r_full},{r_partial}) below the security "
        f"lower bound ({rf_min},{rp_min}) for t={t}")
    pspec = P.make_spec(spec.name, t=t, r_full=r_full, r_partial=r_partial)
    ck = CommitmentKey.create(curve, d["ck_label"].encode(), int(d["ck_n"]))
    ivc = IVC(shape, curve, ck, big_wit_idx=None,
              label=d["label"].encode(), pspec=pspec)
    assert ivc.pp_digest == int(d["pp_digest"]), \
        "vk pp digest mismatch (tampered or stale vk)"
    return ivc
