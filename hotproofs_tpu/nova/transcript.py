"""Poseidon Fiat–Shamir transcript for Nova folds.

Replaces arecibo's RO trait instantiation (neptune Poseidon — SURVEY.md §2b).
Challenges are derived over the circuit's scalar field; group elements are
absorbed as affine coordinates split into two 128-bit halves (injective for
<2^255 coordinates regardless of base/scalar field size mismatch); the point
at infinity absorbs as (0,0,1) with an explicit infinity tag.

The transcript is host-side in round 1 (one comm_T per fold crosses
host<->device; the vectors never do). Keep every absorb explicit and ordered
— the verifier replays the exact sequence.
"""

from __future__ import annotations

import hashlib
from typing import Optional, Sequence, Tuple

from ..ops import poseidon as P

HALF_BITS = 128
HALF_MASK = (1 << HALF_BITS) - 1


class Transcript:
    def __init__(self, field_name: str, domain: bytes, pp_digest: int,
                 pspec: Optional[P.PoseidonSpec] = None):
        """pspec overrides the process-wide sponge parameterisation — a vk
        records (t, R_F, R_P) and the verifier ADOPTS them (nova/vk.py),
        rather than requiring the process env to match the prover's."""
        self.spec = pspec if pspec is not None else P.spec_for(field_name)
        tag = int.from_bytes(
            hashlib.sha256(b"hotproofs/transcript/" + domain).digest(),
            "little") % self.spec.field.p
        from ..core import native_ff
        if native_ff.available():
            # ~25x faster identical math (native/ffec.cc); bit-parity with
            # HostSponge is enforced by tests/test_native_ff.py.
            self.sponge = native_ff.NativeSponge(self.spec, domain_tag=tag)
        else:
            self.sponge = P.HostSponge(self.spec, domain_tag=tag)
        self.absorb_scalar(pp_digest)

    def absorb_scalar(self, v: int) -> None:
        self.sponge.absorb([v % self.spec.field.p])

    def absorb_scalars(self, vs: Sequence[int]) -> None:
        self.sponge.absorb([v % self.spec.field.p for v in vs])

    def absorb_point(self, pt: Optional[Tuple[int, int]]) -> None:
        """pt is affine (x, y) ints or None for infinity.

        Fixed-width encoding — ALWAYS 5 sponge elements
        (x_lo, x_hi, y_lo, y_hi, infinity_flag) — so every absorb sequence
        has a unique parse; a variable-length point encoding would let
        scalar/point boundaries shift between colliding transcripts."""
        if pt is None:
            self.sponge.absorb([0, 0, 0, 0, 1])
        else:
            x, y = pt
            self.sponge.absorb([x & HALF_MASK, x >> HALF_BITS,
                                y & HALF_MASK, y >> HALF_BITS, 0])

    def challenge(self) -> int:
        return self.sponge.squeeze()


def transcript_poseidon_params(field_name: str) -> Tuple[int, int, int]:
    """(t, R_F, R_P) of the transcript's Poseidon instance — part of the
    exported verification key (nova/vk.py) so a foreign verifier knows the
    exact Fiat-Shamir sponge."""
    spec = P.spec_for(field_name)
    return spec.t, spec.r_full, spec.r_partial


def digest_of(*parts: bytes) -> int:
    h = hashlib.sha256()
    for p in parts:
        h.update(hashlib.sha256(p).digest())
    return int.from_bytes(h.digest(), "little")
