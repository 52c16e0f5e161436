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
    mu_limbs: np.ndarray = dc_field(repr=False, default=None)  # -p^{-1} mod R
    exp_p_minus_2_bits: tuple = dc_field(repr=False, default=())

    @staticmethod
    def make(name: str, p: int) -> "FieldSpec":
        big_r = 1 << (N_LIMBS * LIMB_BITS)
        r = big_r % p
        r2 = (r * r) % p
        n0inv = (-pow(p, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
        mu = (-pow(p, -1, big_r)) % big_r
        e = p - 2
        bits = tuple((e >> i) & 1 for i in range(e.bit_length()))
        return FieldSpec(
            name=name, p=p,
            p_limbs=int_to_limbs(p),
            n0inv=n0inv,
            r_mod_p=r,
            r2_limbs=int_to_limbs(r2),
            one_mont_limbs=int_to_limbs(r),
            mu_limbs=int_to_limbs(mu),
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


def _shift_up(x: jnp.ndarray) -> jnp.ndarray:
    """Move digit k to position k+1 (drop the top, zero into the bottom)."""
    pad = [(0, 0)] * (x.ndim - 1) + [(1, 0)]
    return jnp.pad(x, pad)[..., :-1]


def _ks_prefix(g: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Kogge–Stone inclusive prefix of the carry operator over the limb axis.

    (g, p) are int32 0/1 generate/propagate flags; the operator is
    (g1,p1)∘(g2,p2) = (g1 | (p1 & g2), p1 & p2) with (older) on the right.
    Returns the inclusive aggregate G (carry OUT of each position). Loop-free:
    log2(L) doubling rounds of pure vector ops — no lax control flow, which
    keeps XLA graphs flat and fast to compile (a lax.scan here costs a
    compiled while-loop PER INSTANTIATION inside big kernels like MSM)."""
    L = g.shape[-1]
    d = 1
    while d < L:
        pad = [(0, 0)] * (g.ndim - 1) + [(d, 0)]
        g_old = jnp.pad(g, pad)[..., :-d]
        p_old = jnp.pad(p, pad, constant_values=0)[..., :-d]
        g = g | (p & g_old)
        p = p & p_old
        d *= 2
    return g


def _carry_normalize(t: jnp.ndarray, out_limbs: int) -> jnp.ndarray:
    """Propagate carries of a lazy digit vector into base-2^8 digits.

    t: (..., k) int32 with entries < 2^23. Returns (..., out_limbs) digits;
    overflow beyond out_limbs is dropped (callers guarantee it is zero).

    Loop-free: three shrink rounds (2^23 -> 2^16 -> 2^9 -> <=256 per digit)
    then exact carry-lookahead via Kogge–Stone."""
    k = t.shape[-1]
    if k < out_limbs:
        pad = [(0, 0)] * (t.ndim - 1) + [(0, out_limbs - k)]
        t = jnp.pad(t, pad)
    for _ in range(3):
        t = (t & LIMB_MASK) + _shift_up(t >> LIMB_BITS)
    # Now every digit <= 256: one lookahead round finishes exactly.
    g = (t > LIMB_MASK).astype(jnp.int32)
    p = (t == LIMB_MASK).astype(jnp.int32)
    carry_in = _shift_up(_ks_prefix(g, p))
    return ((t + carry_in) & LIMB_MASK)[..., :out_limbs]


def _sub_with_borrow(a: jnp.ndarray, b: jnp.ndarray):
    """a - b over canonical base-2^8 digit vectors (entries in [0, 255]);
    returns (diff_digits, borrow_out). Loop-free borrow-lookahead."""
    s = a - b
    g = (s < 0).astype(jnp.int32)
    p = (s == 0).astype(jnp.int32)
    agg = _ks_prefix(g, p)
    borrow_in = _shift_up(agg)
    d = s - borrow_in
    digits = jnp.where(d < 0, d + (1 << LIMB_BITS), d)
    return digits, agg[..., -1]


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


# Anti-diagonal contraction matrices: limb-product outer(i,j) -> column i+j.
# One dot against a 0/1 constant turns the 32x32 outer product into the 63
# convolution columns — 3 large fusable ops per field-mul instead of dozens
# of slice updates (keeps XLA graphs small and feeds the TPU dot units; all
# values stay < 2^22, exact in int32).
_DIAG_IDX = np.arange(N_LIMBS)[:, None] + np.arange(N_LIMBS)[None, :]
_M_FULL = (_DIAG_IDX.reshape(-1, 1) ==
           np.arange(2 * N_LIMBS - 1)).astype(np.int32)      # (1024, 63)
_M_TRUNC = _M_FULL[:, :N_LIMBS]                               # (1024, 32)


def _conv(a: jnp.ndarray, b: jnp.ndarray, mat: np.ndarray) -> jnp.ndarray:
    """Lazy convolution columns of two digit vectors via outer-product+dot."""
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape)
    b = jnp.broadcast_to(b, shape)
    outer = (a[..., :, None] * b[..., None, :]).reshape(
        shape[:-1] + (N_LIMBS * N_LIMBS,))
    return jax.lax.dot_general(
        outer, jnp.asarray(mat),
        ((( outer.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def mont_mul(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product: a*b*R^{-1} mod p. Inputs/outputs canonical digits.

    Full-width Montgomery reduction (no word-serial loop):
        T = a*b;  m = (T mod R) * mu mod R  with mu = -p^{-1} mod R;
        U = T + m*p  (divisible by R);  result = U/R, one conditional
    subtract. Three digit convolutions + three carry scans total."""
    p_limbs = jnp.asarray(spec.p_limbs)
    t = _carry_normalize(_conv(a, b, _M_FULL), 2 * N_LIMBS)   # exact T digits
    m_lazy = _conv(t[..., :N_LIMBS], jnp.asarray(spec.mu_limbs), _M_TRUNC)
    m = _carry_normalize(m_lazy, N_LIMBS)     # m = mu*T mod R (carry dropped)
    mp = _conv(m, p_limbs, _M_FULL)           # (..., 63) lazy, cols < 2^21
    u = t.at[..., : 2 * N_LIMBS - 1].add(mp)  # digits + lazy cols < 2^22
    res = _carry_normalize(u, 2 * N_LIMBS + 1)[..., N_LIMBS:]  # 33 digits
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
