"""Pallas TPU kernels for prime-field limb arithmetic — the hot-path engine.

Round-2 profiling showed the XLA formulation of mont_mul (outer product +
one-hot dot, ops/field.py) runs at ~5-15M mulmods/s on a v5e because every
conv materializes a (N, 1024) intermediate in HBM and the int32 dot does 63x
redundant MACs off the MXU. Here the schoolbook convolution runs entirely in
VMEM with a limb-major layout:

    limbs on the SUBLANE axis (32 rows for base-2^8 digits),
    elements on the LANE axis (blocks of N_LANES=512),

so each partial-product row  t_j = a[j] * b  is one broadcast-multiply over a
(32, N) tile and accumulates into rows j..j+32 of a (64, N) VMEM accumulator
— zero HBM traffic between the ~1k multiply-adds of a field mul. Carry
propagation (shrink rounds + Kogge-Stone lookahead) shifts along the sublane
axis via static row slices.

The kernels are exact replacements for ops/field.mont_mul on canonical
base-2^8 digit vectors; tests compare bit-for-bit against the XLA path and
the host-int oracle (tests/test_pallas_field.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import field as F

N_LANES = 512  # lane-block width (multiple of 128)
L = F.N_LIMBS  # 32


def interpret() -> bool:
    """Pallas kernels compile only for TPU; every pallas_call in this stack
    passes interpret=interpret() so the CPU test mesh (tests/conftest.py)
    runs the same kernels through the interpreter."""
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# In-kernel helpers: all arrays are (rows, lanes) with limbs on axis 0.
# ---------------------------------------------------------------------------


def _shrink_rows(t, rounds: int = 3):
    """Lazy carry shrink: digits <= 2^23 -> <= 256 in three rounds (each
    round: keep low byte, push the high bits one row up). Carries out of the
    top row are dropped — callers guarantee the represented value fits."""
    for _ in range(rounds):
        hi = t >> 8
        t = (t & 0xFF) + jnp.pad(hi[:-1], ((1, 0), (0, 0)))
    return t


def _ks_fix_rows(t):
    """Exact canonicalization of digits <= ~511 (post-shrink, possibly with
    a small additive bump): Kogge-Stone lookahead of the single +1 carries."""
    rows = t.shape[0]
    g = (t > 0xFF).astype(jnp.int32)
    p = (t == 0xFF).astype(jnp.int32)
    d = 1
    while d < rows:
        g = g | (p & jnp.pad(g[:-d], ((d, 0), (0, 0))))
        p = p & jnp.pad(p[:-d], ((d, 0), (0, 0)), constant_values=1)
        d *= 2
    carry_in = jnp.pad(g[:-1], ((1, 0), (0, 0)))
    return (t + carry_in) & 0xFF


def _ks_carry_rows(t):
    """Exact carry propagation for digits <= 2^23, limbs along axis 0.

    Three shrink rounds bring every digit <= 256, then one Kogge-Stone
    lookahead resolves the +1 carries exactly (see field._carry_normalize)."""
    return _ks_fix_rows(_shrink_rows(t))


def _conv_rows(a, b, out_rows):
    """Digit convolution: a (32, N) x b (32, N) -> (out_rows, N) lazy columns.
    Unrolled schoolbook: 32 broadcast-multiplies + 32 shifted adds, all on
    VMEM tiles. Lazy column values < 32 * 255^2 < 2^21."""
    n = a.shape[1]
    acc = jnp.zeros((out_rows, n), jnp.int32)
    for j in range(L):
        t = a[j:j + 1, :] * b          # (32, N)
        hi = min(j + L, out_rows)
        acc = acc + jnp.pad(t[: hi - j], ((j, out_rows - hi), (0, 0)))
    return acc


def _conv_const_rows(a, c_col, out_rows):
    """Convolution of a (rows_a, N) with a constant digit COLUMN (32, 1)."""
    n = a.shape[1]
    rows_a = a.shape[0]
    acc = jnp.zeros((out_rows, n), jnp.int32)
    for j in range(rows_a):
        t = a[j:j + 1, :] * c_col               # (32, N)
        hi = min(j + L, out_rows)
        acc = acc + jnp.pad(t[: hi - j], ((j, out_rows - hi), (0, 0)))
    return acc


def _cond_sub_rows(x, p_col):
    """x - p if x >= p else x; x (rows, N) digits, p_col (rows, 1)."""
    s = x - p_col
    g = (s < 0).astype(jnp.int32)
    pf = (s == 0).astype(jnp.int32)
    rows = x.shape[0]
    d = 1
    while d < rows:
        g = g | (pf & jnp.pad(g[:-d], ((d, 0), (0, 0))))
        pf = pf & jnp.pad(pf[:-d], ((d, 0), (0, 0)), constant_values=1)
        d *= 2
    borrow_in = jnp.pad(g[:-1], ((1, 0), (0, 0)))
    dd = s - borrow_in
    diff = jnp.where(dd < 0, dd + 256, dd)
    no_borrow = (g[-1:] == 0)            # (1, N)
    return jnp.where(no_borrow, diff, x)


def field_consts(spec: F.FieldSpec) -> np.ndarray:
    """Kernel-input constant pack, LIMB-MAJOR (33, 2): column 0 = p extended
    by a zero digit, column 1 = mu = -p^{-1} mod R. Pallas kernels may not
    capture array constants, so every kernel that needs field constants
    takes this as an operand; the limb-major layout keeps all accesses
    static column slices (integer indexing of values inside Mosaic control
    flow lowers to unsupported gathers)."""
    out = np.zeros((L + 1, 2), np.int32)
    out[:L, 0] = spec.p_limbs
    out[:L, 1] = spec.mu_limbs
    return out


def toeplitz_of(digits, out_rows: int) -> np.ndarray:
    """(out_rows, L) Toeplitz matrix of a digit COLUMN c, so that
    T @ a == conv(a, c) truncated to out_rows (row i = sum_j c[i-j]*a[j])."""
    c = np.asarray(digits, np.int64)
    out = np.zeros((out_rows, L), np.int64)
    for j in range(L):
        hi = min(j + L, out_rows)
        out[j:hi, j] = c[: hi - j]
    return out


def toep_consts(spec: F.FieldSpec) -> np.ndarray:
    """MXU constant pack (3L, L) bf16: rows [0,L) = Toeplitz of mu truncated
    mod R, rows [L,3L) = full Toeplitz of p. Digits are <= 255, hence exact
    in bf16; matmul products <= 2^16 accumulate exactly in f32 (< 2^24).

    This turns the two constant digit-convolutions of a Montgomery reduction
    (x mu mod R, x p) into MXU matmuls — the VPU keeps only the variable
    a*b convolution and the carry shrinks."""
    out = np.zeros((3 * L, L), np.int64)
    out[:L] = toeplitz_of(spec.mu_limbs, L)
    out[L:] = toeplitz_of(spec.p_limbs, 2 * L)
    return out.astype(np.float32)  # cast to bf16 at device upload


def _dot_rows(tm, x):
    """(R, L) bf16 constant @ (L, N) digit tile -> (R, N) int32 lazy digits.
    Operands are exact in bf16 (digits <= 256); f32 accumulation is exact
    (partial sums < 2^22 < 2^24)."""
    return jax.lax.dot_general(
        tm, x.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int32)


def _mont_reduce_rows(consts, t):
    """Montgomery reduction of lazy product digits t (2L, N), digits <= 256
    (post-shrink). consts = (cols (33,2) int32, toep (>=3L, L) bf16).

    MXU path: m = Toep_mu @ t_low (exact in bf16/f32), shrink; u = t +
    Toep_p @ m. u is divisible by R and u < 2^512, so after a shrink its low
    32 lazy digits represent a value in {0, R} (they are < 1.004*R): the
    division by R is u_hi plus a single carry bit = any(u_low != 0) — no
    full-width carry-lookahead over 65 rows."""
    cols, toep = consts
    p_ext = cols[:, 0:1]                     # (33, 1)
    # m must be the CANONICAL digits of T*mu mod R: a lazy m could represent
    # m_c + R (value < 1.004R), which shifts the result by p and breaks
    # bit-exactness with ops/field.mont_mul. Carries out of row 31 drop on
    # purpose (that is the mod-R truncation).
    m = _ks_fix_rows(_shrink_rows(_dot_rows(toep[:L], t[:L])))
    u = _shrink_rows(t + _dot_rows(toep[L:3 * L], m))     # <= 256
    carry = jnp.any(u[:L] != 0, axis=0, keepdims=True).astype(jnp.int32)
    res = jnp.pad(u[L:], ((0, 1), (0, 0)))                # (33, N)
    res = res + jnp.pad(carry, ((0, L), (0, 0)))          # bump row 0
    res = _ks_fix_rows(res)                               # canonical digits
    return _cond_sub_rows(res, p_ext)[:L]


def mont_mul_rows(consts, a, b):
    """Montgomery product on limb-major (32, N) canonical digit tiles.

    Pure jnp on VMEM-resident values — call INSIDE a pallas kernel (or any
    fused context). Semantics identical to field.mont_mul (bit-exact same
    canonical output). `consts` is either the legacy field_consts() pack
    (33, 2) — all-VPU convolutions — or a (cols, toep) tuple with the
    toep_consts() bf16 pack, which runs the two constant convolutions of
    the reduction on the MXU (the fast path for all hot kernels)."""
    if isinstance(consts, (tuple, list)):
        t = _shrink_rows(_conv_rows(a, b, 2 * L))         # digits <= 256
        return _mont_reduce_rows(consts, t)
    p_ext = consts[:, 0:1]     # (33, 1)
    mu = consts[:L, 1:2]       # (32, 1)
    p_l = p_ext[:L]
    t = _ks_carry_rows(_conv_rows(a, b, 2 * L))          # (64, N) exact T
    m = _ks_carry_rows(_conv_const_rows(t[:L], mu, L))   # m = T*mu mod R
    mp = _conv_const_rows(m, p_l, 2 * L)                 # (64, N) lazy
    u = t + mp
    # u is divisible by R; propagate carries over 65 rows then drop low 32.
    u = jnp.pad(u, ((0, 1), (0, 0)))
    res = _ks_carry_rows(u)[L:]                          # (33, N)
    return _cond_sub_rows(res, p_ext)[:L]


def mont_mul_toep_rows(consts, tconst, a):
    """Montgomery product of a (32, N) canonical tile with a CONSTANT whose
    full conv Toeplitz (2L, L) bf16 is precomputed (e.g. the curve's 3b):
    the entire product convolution runs on the MXU."""
    return _mont_reduce_rows(consts, _shrink_rows(_dot_rows(tconst, a)))


def add_rows(consts, a, b):
    """Field add on (32, N) canonical digit tiles."""
    if isinstance(consts, (tuple, list)):
        consts = consts[0]
    s = a + b                                    # digits <= 510
    s = jnp.pad(s, ((0, 1), (0, 0)))
    s = _ks_fix_rows(_shrink_rows(s, rounds=1))  # one round suffices
    return _cond_sub_rows(s, consts[:, 0:1])[:L]


def sub_rows(consts, a, b):
    """Field sub on (32, N) canonical digit tiles."""
    if isinstance(consts, (tuple, list)):
        consts = consts[0]
    s = a - b
    g = (s < 0).astype(jnp.int32)
    pf = (s == 0).astype(jnp.int32)
    d = 1
    while d < L:
        g = g | (pf & jnp.pad(g[:-d], ((d, 0), (0, 0))))
        pf = pf & jnp.pad(pf[:-d], ((d, 0), (0, 0)), constant_values=1)
        d *= 2
    borrow_in = jnp.pad(g[:-1], ((1, 0), (0, 0)))
    dd = s - borrow_in
    diff = jnp.where(dd < 0, dd + 256, dd)
    borrowed = g[-1:] > 0                # (1, N)
    corrected = _ks_carry_rows(diff + consts[:L, 0:1])
    return jnp.where(borrowed, corrected, diff)


# ---------------------------------------------------------------------------
# pallas_call wrappers (standalone kernels; the MSM fuses these inline).
# ---------------------------------------------------------------------------


def _mont_mul_kernel(c_ref, t_ref, a_ref, b_ref, o_ref):
    o_ref[:] = mont_mul_rows((c_ref[:], t_ref[:]), a_ref[:], b_ref[:])


_MM_CACHE = {}
_CONSTS_CACHE = {}
_TOEP_CACHE = {}


def field_consts_dev(spec: F.FieldSpec) -> jnp.ndarray:
    """Device-resident consts pack. MUST be threaded into jitted programs as
    a RUNTIME ARGUMENT: a jit-closure-captured constant feeding a pallas
    input makes every call ~70x slower (measured 2.43 ms vs 0.034 ms on a
    v5e — the embedded literal is re-staged per call). Only the HOST array
    is cached: caching the jnp value would capture a tracer when first
    called inside a jit trace and leak it into later traces."""
    if spec.name not in _CONSTS_CACHE:
        _CONSTS_CACHE[spec.name] = field_consts(spec)
    return jnp.asarray(_CONSTS_CACHE[spec.name])


def toep_consts_dev(spec: F.FieldSpec) -> jnp.ndarray:
    """Device bf16 Toeplitz pack (3L, L) for the MXU reduction path (same
    runtime-argument rule as field_consts_dev)."""
    if spec.name not in _TOEP_CACHE:
        _TOEP_CACHE[spec.name] = toep_consts(spec)
    return jnp.asarray(_TOEP_CACHE[spec.name], jnp.bfloat16)


def mont_mul_lm(spec: F.FieldSpec, a, b):
    """Montgomery mul over limb-major arrays (32, N); N % N_LANES == 0."""
    key = (spec.name, a.shape[1])
    if key not in _MM_CACHE:
        n = key[1]
        fn = pl.pallas_call(
            _mont_mul_kernel,
            out_shape=jax.ShapeDtypeStruct((L, n), jnp.int32),
            grid=(n // N_LANES,),
            in_specs=[pl.BlockSpec((L + 1, 2), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((3 * L, L), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)]
            + [pl.BlockSpec((L, N_LANES), lambda i: (0, i),
                            memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec((L, N_LANES), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            interpret=interpret(),
        )
        _MM_CACHE[key] = jax.jit(fn)
    return _MM_CACHE[key](field_consts_dev(spec), toep_consts_dev(spec),
                          a, b)


def mont_mul_em(spec: F.FieldSpec, a, b):
    """Drop-in for field.mont_mul on element-major (N, 32) arrays: pad to a
    lane-block multiple, transpose at the boundary, run the pallas kernel."""
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape).reshape(-1, L)
    b = jnp.broadcast_to(b, shape).reshape(-1, L)
    n = a.shape[0]
    n_pad = -(-n // N_LANES) * N_LANES
    if n_pad != n:
        a = jnp.pad(a, ((0, n_pad - n), (0, 0)))
        b = jnp.pad(b, ((0, n_pad - n), (0, 0)))
    out = mont_mul_lm(spec, a.T, b.T).T
    return out[:n].reshape(shape)
