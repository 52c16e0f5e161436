"""Poseidon permutation + sponge (Nova's random oracle), TPU-native.

Replaces `neptune` 13.0.0 (the reference's transitive Poseidon dependency via
arecibo — SURVEY.md §2b): Nova uses Poseidon as the Fiat–Shamir RO for fold
challenges. Constants are generated host-side with the Grain-LFSR procedure
of the Poseidon reference implementation (generate_parameters_grain.sage from
the Poseidon paper, the same procedure neptune follows): 80-bit LFSR seeded
from (field tag, sbox tag, n, t, R_F, R_P), 160 warm-up clocks, self-shrinking
output, rejection sampling of field elements; MDS is the Cauchy matrix
1/(x_i + y_j).

NOTE on bit-exactness: the reference's exact transcript depends on arecibo's
internal neptune parameterisation (strength/arity/HashType tags), which is
not observable in this environment (no Rust toolchain; SURVEY.md §4 item 3).
This stack ships TWO selectable parameterisations (HOTPROOFS_POSEIDON):

  * "default": t=3, R_F=8, R_P=57 (the Poseidon paper script's output for
    255-bit primes at 128-bit security INCLUDING its security margin applied
    to the pre-margin R_P bound of 53);
  * "neptune": neptune 13.0.0's round numbers — R_F/R_P from a port of its
    `round_numbers.rs::calc_round_numbers` search (neptune_round_numbers
    below; (8, 55) for t=3 / arity 2 at 255 bits, the published
    Filecoin/neptune numbers), the same Grain-LFSR constant stream, and the
    same Cauchy MDS 1/(x_i + y_j) with x = 0..t, y = t..2t that
    neptune's `mds.rs::generate_mds` builds. neptune_domain_tag computes
    neptune's `hash_type.rs` tags (Standard/MerkleTree: 2^arity - 1;
    ConstantLength(l): l * 2^64) for callers that need them, but the
    TRANSCRIPT sponge IO stays hotproofs-specific in BOTH modes: the
    Transcript/HostSponge seeds its domain tag from a sha256-derived label
    and uses its own absorb/squeeze pattern, so "neptune" mode changes only
    round numbers + constants, not the sponge wire format. What remains
    UNVERIFIABLE without a Rust toolchain: neptune's published test vectors
    cannot be executed here, so "neptune" is best-effort parity, kept
    selectable rather than default; prover/verifier remain self-consistent
    under either spec and the exported vk records (t, R_F, R_P), which the
    verifier ADOPTS when loading a vk (nova/vk.ivc_from_vk).

The JAX permutation is branchless (full/partial round masks) and batched; a
host exact-integer mirror serves as the test oracle.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import field as F

ALPHA = 5
R_FULL = 8
R_PARTIAL = 57  # 128-bit security for ~255-bit primes, alpha=5, t=3


def _grain_bits(p_bits: int, t: int, r_f: int, r_p: int):
    """Self-shrinking Grain LFSR bit stream per the Poseidon paper."""
    def enc(val, width):
        return [(val >> (width - 1 - i)) & 1 for i in range(width)]

    state = (enc(1, 2) + enc(0, 4) + enc(p_bits, 12) + enc(t, 12)
             + enc(r_f, 10) + enc(r_p, 10) + [1] * 30)
    assert len(state) == 80

    def clock():
        nb = (state[62] ^ state[51] ^ state[38] ^ state[23]
              ^ state[13] ^ state[0])
        state.pop(0)
        state.append(nb)
        return nb

    for _ in range(160):
        clock()

    while True:
        b1 = clock()
        b2 = clock()
        if b1:
            yield b2


@dataclass(frozen=True)
class PoseidonSpec:
    field: F.FieldSpec
    t: int
    r_full: int
    r_partial: int
    round_constants: Tuple[Tuple[int, ...], ...]  # (n_rounds, t)
    mds: Tuple[Tuple[int, ...], ...]              # (t, t)

    @property
    def n_rounds(self) -> int:
        return self.r_full + self.r_partial


@lru_cache(maxsize=None)
def make_spec(field_name: str, t: int = 3, r_full: int = R_FULL,
              r_partial: int = R_PARTIAL) -> PoseidonSpec:
    field = F.FIELDS[field_name]
    p = field.p
    n_bits = p.bit_length()
    bits = _grain_bits(n_bits, t, r_full, r_partial)

    def sample_field():
        while True:
            v = 0
            for _ in range(n_bits):
                v = (v << 1) | next(bits)
            if v < p:
                return v

    n_rounds = r_full + r_partial
    rc = tuple(tuple(sample_field() for _ in range(t))
               for _ in range(n_rounds))
    xs = list(range(t))
    ys = list(range(t, 2 * t))
    mds = tuple(tuple(pow((x + y) % p, p - 2, p) for y in ys) for x in xs)
    return PoseidonSpec(field, t, r_full, r_partial, rc, mds)


# ---------------------------------------------------------------------------
# neptune 13.0.0-compatible parameterisation (SURVEY.md §2b neptune row).
# ---------------------------------------------------------------------------


def neptune_round_numbers(t: int, n_bits: int = 255, m: int = 128,
                          security_margin: bool = True) -> Tuple[int, int]:
    """(R_F, R_P) per neptune 13.0.0's `round_numbers.rs::calc_round_numbers`
    (itself a port of the Poseidon paper's calc_round_numbers.py for GF(p),
    alpha=5): minimise sbox count t*R_F + R_P over even R_F subject to the
    statistical / interpolation / Groebner bounds, then apply the standard
    margin (R_F += 2, R_P *= 1.075). Reproduces the published
    Filecoin/neptune numbers: arity 2 -> (8, 55), 4 -> (8, 56),
    8 -> (8, 57), 11 -> (8, 57) at 255-bit primes, 128-bit security."""
    import math

    def secure(rf: int, rp: int) -> bool:
        rf_stat = 6.0 if m <= (n_bits - 3.0) * (t + 1.0) else 10.0
        rf_interp = 0.43 * m + math.log2(t) - rp
        rf_grob_1 = 0.21 * n_bits - rp
        rf_grob_2 = (0.14 * n_bits - 1.0 - rp) / (t - 1.0)
        return rf >= max(rf_stat, rf_interp, rf_grob_1, rf_grob_2)

    best = None
    for rf in range(2, 1001, 2):
        for rp in range(4, 1001):
            if secure(rf, rp):
                rf_f, rp_f = rf, rp
                if security_margin:
                    rf_f = rf + 2
                    rp_f = math.ceil(rp * 1.075)
                cost = t * rf_f + rp_f
                if best is None or cost < best[0]:
                    best = (cost, rf_f, rp_f)
                break  # larger rp at this rf only raises the cost
    assert best is not None
    return best[1], best[2]


def neptune_domain_tag(arity: int = None, const_len: int = None) -> int:
    """neptune `hash_type.rs` domain tags: Standard/MerkleTree(arity) =
    2^arity - 1; ConstantLength(l) = l * 2^64. Exactly one selector."""
    assert (arity is None) != (const_len is None)
    if arity is not None:
        return (1 << arity) - 1
    return const_len << 64


@lru_cache(maxsize=None)
def make_spec_neptune(field_name: str, arity: int = 2) -> PoseidonSpec:
    """neptune 13.0.0-parameterised spec: t = arity + 1, round numbers from
    neptune's search, constants from the shared Grain stream, Cauchy MDS
    (identical construction to neptune's generate_mds)."""
    t = arity + 1
    # n_bits is HARDCODED to 255, matching the ported source: neptune's
    # round_numbers_are_secure fixes n = 255 regardless of the concrete
    # prime (its fields are all ~255-bit). Using p.bit_length() (254 for
    # BN254/Grumpkin) gives identical results for every arity checked
    # (t <= 37) but could drift from neptune on other fields.
    r_f, r_p = neptune_round_numbers(t, n_bits=255)
    return make_spec(field_name, t, r_f, r_p)


def spec_for(field_name: str) -> PoseidonSpec:
    """The process-wide transcript spec, selected by HOTPROOFS_POSEIDON
    (utils/config.py): "default" or "neptune" (arity-2, Nova's RO shape)."""
    from ..utils.config import CONFIG
    if CONFIG.poseidon == "neptune":
        return make_spec_neptune(field_name, arity=2)
    return make_spec(field_name)


# ---------------------------------------------------------------------------
# Host oracle (exact ints).
# ---------------------------------------------------------------------------


def host_permute(spec: PoseidonSpec, state: Sequence[int]) -> List[int]:
    p = spec.field.p
    s = [v % p for v in state]
    half = spec.r_full // 2
    for rnd in range(spec.n_rounds):
        s = [(v + c) % p for v, c in zip(s, spec.round_constants[rnd])]
        is_full = rnd < half or rnd >= half + spec.r_partial
        if is_full:
            s = [pow(v, ALPHA, p) for v in s]
        else:
            s[0] = pow(s[0], ALPHA, p)
        s = [sum(m * v for m, v in zip(row, s)) % p for row in spec.mds]
    return s


# ---------------------------------------------------------------------------
# Batched JAX permutation (Montgomery-form limb state).
# ---------------------------------------------------------------------------


_DEV_CONST_CACHE = {}


def _device_constants(spec: PoseidonSpec):
    key = (spec.field.name, spec.t, spec.r_full, spec.r_partial)
    if key in _DEV_CONST_CACHE:
        return _DEV_CONST_CACHE[key]
    fld = spec.field
    r = fld.r_mod_p
    rc = np.stack([
        np.stack([F.int_to_limbs(c * r % fld.p) for c in row])
        for row in spec.round_constants])                    # (R, t, L)
    mds = np.stack([
        np.stack([F.int_to_limbs(m * r % fld.p) for m in row])
        for row in spec.mds])                                # (t, t, L)
    half = spec.r_full // 2
    full_mask = np.array(
        [1 if (i < half or i >= half + spec.r_partial) else 0
         for i in range(spec.n_rounds)], np.int32)
    # Cache NUMPY arrays (jnp conversion inside a jit trace would leak
    # tracers into the cache); jnp.asarray at use site is free.
    out = (rc, mds, full_mask)
    _DEV_CONST_CACHE[key] = out
    return out


def permute(spec: PoseidonSpec, state: jnp.ndarray) -> jnp.ndarray:
    """state: (..., t, L) Montgomery limbs -> permuted state."""
    fld = spec.field
    rc_np, mds_np, mask_np = _device_constants(spec)
    rc, mds, full_mask = (jnp.asarray(rc_np), jnp.asarray(mds_np),
                          jnp.asarray(mask_np))

    def sbox(x):
        x2 = F.mont_mul(fld, x, x)
        x4 = F.mont_mul(fld, x2, x2)
        return F.mont_mul(fld, x4, x)

    def round_fn(s, inputs):
        rc_r, is_full = inputs
        s = F.add(fld, s, rc_r)
        sb = sbox(s)
        # partial round: sbox only lane 0.
        lane0 = jnp.arange(spec.t) == 0
        keep = jnp.broadcast_to(is_full.astype(bool), s.shape[:-1]) | lane0
        s = jnp.where(keep[..., None], sb, s)
        # MDS: out_i = sum_j mds[i,j] * s_j.
        prod = F.mont_mul(fld, mds, s[..., None, :, :])  # (..., t, t, L)
        acc = prod[..., 0, :]
        for j in range(1, spec.t):
            acc = F.add(fld, acc, prod[..., j, :])
        return acc, None

    state, _ = jax.lax.scan(round_fn, state, (rc, full_mask))
    return state


# ---------------------------------------------------------------------------
# Sponge (rate t-1, capacity 1) — duplex for transcript use.
# ---------------------------------------------------------------------------


class HostSponge:
    """Host-side sponge over exact ints; the transcript reference semantics.

    Domain separation: initial state = [domain_tag, 0, 0] with domain_tag =
    (label bytes interpreted LE) mod p. Absorb overwrites-adds into rate
    lanes in pairs with a permute after each pair; squeeze returns rate lanes,
    permuting between blocks."""

    def __init__(self, spec: PoseidonSpec, domain_tag: int):
        self.spec = spec
        self.p = spec.field.p
        self.state = [domain_tag % self.p] + [0] * (spec.t - 1)
        self._absorbed = 0

    def absorb(self, vals: Sequence[int]):
        rate = self.spec.t - 1
        for v in vals:
            lane = 1 + (self._absorbed % rate)
            self.state[lane] = (self.state[lane] + v) % self.p
            self._absorbed += 1
            if self._absorbed % rate == 0:
                self.state = host_permute(self.spec, self.state)

    def squeeze(self) -> int:
        if self._absorbed % (self.spec.t - 1) != 0:
            self.state = host_permute(self.spec, self.state)
            self._absorbed = 0
        self.state = host_permute(self.spec, self.state)
        return self.state[1]
