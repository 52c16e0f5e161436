"""Batched prime-field arithmetic for TPU (JAX/XLA), limb representation.

TPU-native replacement for the reference's CPU field stacks (`pasta_curves`,
`halo2curves` via rust_fold/Cargo.toml:24,29). TPUs have no 64-bit integer
multiplier, so field elements are vectors of 32 base-2^8 limbs held in int32:

  * a limb product is <= 255*255 = 65025,
  * a schoolbook column sum accumulates <= 32 products (< 2^21),
  * Montgomery reduction adds one more m*p row per step (< 2^23 total),

so every intermediate fits comfortably in int32 on the VPU — no emulated
64-bit arithmetic anywhere. All ops are elementwise/batched over leading axes
and shard trivially under pjit/shard_map (the batch axis is the data axis).

Montgomery form with R = 2^256 is used for multiplication chains. The
canonical external representation is little-endian base-2^8 digit vectors in
[0, p).

Supported fields (FieldSpec instances at module bottom): the Pasta pair
(Pallas base/scalar — the reference's test configuration, main.rs:364-371)
and the BN254 pair (the reference's default engine, main.rs:319-331).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field as dc_field
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

N_LIMBS = 32
LIMB_BITS = 8
LIMB_MASK = (1 << LIMB_BITS) - 1


def int_to_limbs(x: int, n: int = N_LIMBS) -> np.ndarray:
    return np.array([(x >> (LIMB_BITS * i)) & LIMB_MASK for i in range(n)],
                    dtype=np.int32)


def limbs_to_int(limbs) -> int:
    arr = np.asarray(limbs)
    return sum(int(v) << (LIMB_BITS * i) for i, v in enumerate(arr.tolist()))


@dataclass(frozen=True)
class FieldSpec:
    """Precomputed constants for one prime field."""

    name: str
    p: int
    p_limbs: np.ndarray = dc_field(repr=False, default=None)
    n0inv: int = 0              # -p^{-1} mod 2^8
    r_mod_p: int = 0            # R = 2^256 mod p
    r2_limbs: np.ndarray = dc_field(repr=False, default=None)  # R^2 mod p
    one_mont_limbs: np.ndarray = dc_field(repr=False, default=None)
    exp_p_minus_2_bits: tuple = dc_field(repr=False, default=())

    @staticmethod
    def make(name: str, p: int) -> "FieldSpec":
        r = (1 << (N_LIMBS * LIMB_BITS)) % p
        r2 = (r * r) % p
        n0inv = (-pow(p, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
        e = p - 2
        bits = tuple((e >> i) & 1 for i in range(e.bit_length()))
        return FieldSpec(
            name=name, p=p,
            p_limbs=int_to_limbs(p),
            n0inv=n0inv,
            r_mod_p=r,
            r2_limbs=int_to_limbs(r2),
            one_mont_limbs=int_to_limbs(r),
            exp_p_minus_2_bits=bits,
        )

    # -- host-side conversions ------------------------------------------
    def to_limbs(self, x: int) -> np.ndarray:
        return int_to_limbs(x % self.p)

    def batch_to_limbs(self, xs: Sequence[int]) -> np.ndarray:
        return np.stack([self.to_limbs(int(x)) for x in xs])

    def limbs_to_ints(self, arr) -> np.ndarray:
        arr = np.asarray(arr)
        flat = arr.reshape(-1, arr.shape[-1])
        out = np.array([limbs_to_int(row) for row in flat], dtype=object)
        return out.reshape(arr.shape[:-1])


# ---------------------------------------------------------------------------
# Core limb kernels (pure jnp; batched over leading axes).
# ---------------------------------------------------------------------------


def _carry_normalize(t: jnp.ndarray, out_limbs: int) -> jnp.ndarray:
    """Propagate carries of a lazy digit vector into base-2^8 digits.

    t: (..., k) int32 with entries < 2^23. Returns (..., out_limbs) digits;
    overflow beyond out_limbs is dropped (callers guarantee it is zero)."""
    k = t.shape[-1]
    tt = jnp.moveaxis(t, -1, 0)  # (k, ...)

    def step(carry, limb):
        v = limb + carry
        return v >> LIMB_BITS, v & LIMB_MASK

    _, digits = jax.lax.scan(step, jnp.zeros_like(tt[0]), tt)
    digits = jnp.moveaxis(digits, 0, -1)
    if k < out_limbs:
        pad = [(0, 0)] * (digits.ndim - 1) + [(0, out_limbs - k)]
        digits = jnp.pad(digits, pad)
    return digits[..., :out_limbs]


def _sub_with_borrow(a: jnp.ndarray, b: jnp.ndarray):
    """a - b over base-2^8 digit vectors; returns (diff_digits, borrow_out)."""
    d = a - b
    dd = jnp.moveaxis(d, -1, 0)

    def step(borrow, limb):
        v = limb - borrow
        new_borrow = (v < 0).astype(jnp.int32)
        return new_borrow, v + (new_borrow << LIMB_BITS)

    borrow, digits = jax.lax.scan(step, jnp.zeros_like(dd[0]), dd)
    return jnp.moveaxis(digits, 0, -1), borrow


def _cond_sub_p(a: jnp.ndarray, p_limbs: jnp.ndarray) -> jnp.ndarray:
    """Return a - p if a >= p else a (a < 2p, canonical digits)."""
    diff, borrow = _sub_with_borrow(a, p_limbs)
    return jnp.where((borrow == 0)[..., None], diff, a)


def add(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    s = _carry_normalize(a + b, N_LIMBS + 1)
    p_ext = jnp.concatenate(
        [jnp.asarray(spec.p_limbs), jnp.zeros((1,), jnp.int32)])
    return _cond_sub_p(s, p_ext)[..., :N_LIMBS]


def sub(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    diff, borrow = _sub_with_borrow(a, b)
    corrected = _carry_normalize(diff + jnp.asarray(spec.p_limbs), N_LIMBS)
    return jnp.where((borrow > 0)[..., None], corrected, diff)


def neg(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    z = jnp.zeros_like(a)
    is_zero = jnp.all(a == 0, axis=-1, keepdims=True)
    diff, _ = _sub_with_borrow(jnp.broadcast_to(
        jnp.asarray(spec.p_limbs), a.shape), a)
    return jnp.where(is_zero, z, diff)


def _schoolbook(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Full 64-column lazy product of two 32-limb vectors (col sums < 2^21)."""
    cols = jnp.zeros(a.shape[:-1] + (2 * N_LIMBS,), jnp.int32)
    for i in range(N_LIMBS):
        contrib = a[..., i: i + 1] * b  # (..., 32)
        cols = cols.at[..., i: i + N_LIMBS].add(contrib)
    return cols


def mont_mul(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product: a*b*R^{-1} mod p. Inputs/outputs canonical digits.

    Structure: lazy schoolbook product, carry-normalize to exact base-2^8
    digits, then 32 word-serial Montgomery steps (each clears one low digit by
    adding m*p, m = t0 * (-p^{-1}) mod 2^8), final conditional subtract."""
    p_limbs = jnp.asarray(spec.p_limbs)
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape)
    b = jnp.broadcast_to(b, shape)
    t = _schoolbook(a, b)                      # (..., 64) lazy
    t = _carry_normalize(t, 2 * N_LIMBS + 1)   # exact digits + headroom digit

    for i in range(N_LIMBS):
        m = (t[..., i] * spec.n0inv) & LIMB_MASK        # (...,)
        t = t.at[..., i: i + N_LIMBS].add(m[..., None] * p_limbs)
        # Clear digit i exactly, pushing its (multiple-of-256) value upward.
        carry = (t[..., i] >> LIMB_BITS)
        t = t.at[..., i + 1].add(carry)
        t = t.at[..., i].set(0)
        # Keep accumulated limbs small: periodic normalization not needed —
        # each limb gains at most one 16-bit product per step (< 2^23 total
        # after 32 steps)… except the carry chain; bound it instead:
        # carry < 2^15 + 2^15 = 2^16, added once — safe.

    res = t[..., N_LIMBS: 2 * N_LIMBS + 1]
    res = _carry_normalize(res, N_LIMBS + 1)
    p_ext = jnp.concatenate([p_limbs, jnp.zeros((1,), jnp.int32)])
    return _cond_sub_p(res, p_ext)[..., :N_LIMBS]


def to_mont(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return mont_mul(spec, a, jnp.asarray(spec.r2_limbs))


def from_mont(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    one = jnp.zeros((N_LIMBS,), jnp.int32).at[0].set(1)
    return mont_mul(spec, a, one)


def mont_square(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return mont_mul(spec, a, a)


def inv_mont(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Batched inversion of Montgomery-form elements via Fermat: a^(p-2).

    Square-and-multiply under lax.scan (graph stays two mont_muls deep).
    0 maps to 0 (matching circomlib IsZero semantics and keeping the op
    total, which batch callers rely on)."""
    bits = jnp.asarray(spec.exp_p_minus_2_bits[::-1], jnp.int32)  # MSB first
    acc0 = jnp.broadcast_to(jnp.asarray(spec.one_mont_limbs), a.shape)

    def step(acc, bit):
        acc = mont_square(spec, acc)
        acc = jnp.where(bit.astype(bool), mont_mul(spec, acc, a), acc)
        return acc, None

    acc, _ = jax.lax.scan(step, acc0, bits)
    is_zero = jnp.all(a == 0, axis=-1, keepdims=True)
    return jnp.where(is_zero, jnp.zeros_like(acc), acc)


def select(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """mask ? a : b, broadcasting a trailing limb axis onto the mask."""
    return jnp.where(mask[..., None].astype(bool), a, b)


def zeros(shape=()) -> jnp.ndarray:
    return jnp.zeros(tuple(shape) + (N_LIMBS,), jnp.int32)


def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == 0, axis=-1)


def eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b, axis=-1)


# ---------------------------------------------------------------------------
# Cached jitted entry points. Limb kernels decompose into hundreds of small
# XLA ops; eager dispatch is pathological. Production code paths are always
# inside jit; these wrappers give tests and host tools the same treatment.
# ---------------------------------------------------------------------------

_JIT_CACHE = {}
_OPS = {}


def jitted(op_name: str, spec: "FieldSpec"):
    key = (op_name, spec.name)
    if key not in _JIT_CACHE:
        _JIT_CACHE[key] = jax.jit(functools.partial(_OPS[op_name], spec))
    return _JIT_CACHE[key]


# ---------------------------------------------------------------------------
# Field instances.
# ---------------------------------------------------------------------------

PALLAS_P = 0x40000000000000000000000000000000224698FC094CF91B992D30ED00000001
VESTA_P = 0x40000000000000000000000000000000224698FC0994A8DD8C46EB2100000001
BN254_FQ = 21888242871839275222246405745257275088696311157297823662689037894645226208583
BN254_FR = 21888242871839275222246405745257275088548364400416034343698204186575808495617

# Pasta cycle: the Pallas curve's points live over PALLAS_BASE and its group
# order is VESTA_P (= the circuit field of the reference's pasta build).
pallas_base = FieldSpec.make("pallas_base", PALLAS_P)
pallas_scalar = FieldSpec.make("pallas_scalar", VESTA_P)
vesta_base = FieldSpec.make("vesta_base", VESTA_P)
vesta_scalar = FieldSpec.make("vesta_scalar", PALLAS_P)
bn254_base = FieldSpec.make("bn254_base", BN254_FQ)
bn254_scalar = FieldSpec.make("bn254_scalar", BN254_FR)
grumpkin_base = FieldSpec.make("grumpkin_base", BN254_FR)
grumpkin_scalar = FieldSpec.make("grumpkin_scalar", BN254_FQ)

_OPS.update({
    "add": add, "sub": sub, "neg": neg, "mul": mont_mul,
    "to_mont": to_mont, "from_mont": from_mont, "inv": inv_mont,
})

FIELDS = {s.name: s for s in (
    pallas_base, pallas_scalar, vesta_base, vesta_scalar,
    bn254_base, bn254_scalar, grumpkin_base, grumpkin_scalar,
)}
