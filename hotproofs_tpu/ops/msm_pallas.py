"""Fused Pallas MSM — fixed-base Pippenger with VMEM-resident buckets.

Replaces the XLA sort-based MSM (ops/msm.py) on TPU. Round-3 profiling
showed the XLA path is arithmetic-bound at ~13M mulmods/s (HBM-materialized
conv intermediates); the pallas_field limb engine measures ~3.8G mulmods/s,
so the MSM is redesigned around it:

  * radix-16 digits, all windows flattened into one lane axis (the window
    weight 16^w lives in pre-scaled AFFINE bases, computed once per
    commitment key via a device batch inversion and cached);
  * NO SORT: each lane owns a contiguous run of B points of one window and
    accumulates them into a private 16-slot bucket set via one-hot
    gather/add/scatter — digit 0 lands in slot 0 which is discarded, so
    zero/padding entries are free (round-2's sorted-run design materialized
    per-call sorted copies of the 400MB base array; this streams the bases
    in natural order);
  * bucket kernel: grid (lane_blocks, t_chunks); the OUTPUT block (the
    bucket set of one lane block) stays resident in VMEM across all
    t_chunks (pallas revisiting), so buckets never touch HBM during
    accumulation — the classic matmul-k-loop pattern;
  * bucket additions are RCB15 complete MIXED adds (11M, affine operand;
    identity-safe because the streamed base is never the identity);
  * merge kernel: per bucket slot, fori-reduce the lane axis in VMEM
    chunks, then an unrolled halving tree; final 15-slot weighted suffix
    sum runs in XLA at width 1 (trivial).

Capability parity: arecibo's rayon CPU Pippenger inside Pedersen commits
(SURVEY.md §3.2); same group output as ops/msm.msm bit-for-bit after affine
normalization (tests/test_msm_pallas.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import curve as C
from . import field as F
from . import msm as M
from . import pallas_curve as PC
from . import pallas_field as PF

L = F.N_LIMBS
NSLOT = 16     # bucket slots per lane: digit value 0..15; slot 0 = dump
LB = 512       # lanes per grid block
BC = 8         # points per lane per grid step


# ---------------------------------------------------------------------------
# Key preparation: affine pre-scaled bases in time-major limb-major layout.
# ---------------------------------------------------------------------------


def batch_inv_mont_lm(spec: F.FieldSpec, z_lm: jnp.ndarray) -> jnp.ndarray:
    """Batched Fermat inversion of Montgomery-form limb-major (32, N) tiles
    using the pallas mul engine (0 -> 0). One-time key-prep cost."""
    bits = spec.exp_p_minus_2_bits[::-1]  # MSB first
    acc = jnp.broadcast_to(jnp.asarray(spec.one_mont_limbs)[:, None],
                           z_lm.shape)
    for bit in bits:  # unrolled on host; each step is 1-2 pallas kernels
        acc = PF.mont_mul_lm(spec, acc, acc)
        if bit:
            acc = PF.mont_mul_lm(spec, acc, z_lm)
    is_zero = jnp.all(z_lm == 0, axis=0, keepdims=True)
    return jnp.where(is_zero, jnp.zeros_like(acc), acc)


def plan(m: int, max_bits: int) -> Tuple[int, int, int, int]:
    """(B, lanes_per_window, windows, n_lanes_padded) for an m-point MSM."""
    w4 = M.n_windows4(max_bits)
    b = 256
    while b > 8 and m // b < 16:   # keep >= ~16 lanes/window for small m
        b //= 2
    lpw = -(-m // b)
    n_lanes = w4 * lpw
    n_lanes_pad = -(-n_lanes // LB) * LB
    return b, lpw, w4, n_lanes_pad


def to_tm(a, m: int, b: int, lpw: int, w4: int, n_lanes_pad: int):
    """(W4, m, 32) per-window array -> time-major tiles (B, 32, n_lanes).

    Lane l = w * lpw + c holds points [c*b, (c+1)*b) of window w; padding
    lanes/points are zeros (their digits are forced to 0 = dump). Works on
    numpy or jnp arrays."""
    xp = np if isinstance(a, np.ndarray) else jnp
    pad_pts = lpw * b - m
    if pad_pts:
        a = xp.pad(a, ((0, 0), (0, pad_pts), (0, 0)))
    a = a.reshape(w4, lpw, b, L).transpose(2, 3, 0, 1)  # (B, 32, W4, lpw)
    a = a.reshape(b, L, w4 * lpw)
    if n_lanes_pad > w4 * lpw:
        a = xp.pad(a, ((0, 0), (0, 0), (0, n_lanes_pad - w4 * lpw)))
    return a


def scaled_affine_device(spec: C.CurveSpec, scaled_proj: C.Point,
                         m: int, w4: int):
    """(W4, m) projective pre-scaled bases -> affine Montgomery (W4, m, 32)
    x/y arrays via a device batch inversion (one-time key prep)."""
    f = spec.base
    xs, ys, zs = (x[:w4] for x in scaled_proj)          # (W4, m, 32)
    flat = lambda a: a.reshape(-1, L).T                 # (32, W4*m)
    n_flat = w4 * m
    n_pad = -(-n_flat // PF.N_LANES) * PF.N_LANES
    padf = lambda a: jnp.pad(flat(a), ((0, 0), (0, n_pad - n_flat)))
    zinv = batch_inv_mont_lm(f, padf(zs))
    xa = PF.mont_mul_lm(f, padf(xs), zinv)              # (32, pad) mont
    ya = PF.mont_mul_lm(f, padf(ys), zinv)
    unflat = lambda a: a[:, :n_flat].T.reshape(w4, m, L)
    return unflat(xa), unflat(ya)


def scaled_affine_host(spec: C.CurveSpec, gens: list, w4: int):
    """Host-exact affine pre-scaled bases: gens = [(x, y) ints]; returns
    (W4, m, 32) Montgomery x/y numpy arrays. Used on the CPU test mesh and
    as the oracle for scaled_affine_device."""
    f = spec.base
    m = len(gens)
    xa = np.zeros((w4, m, L), np.int32)
    ya = np.zeros((w4, m, L), np.int32)
    for i, g in enumerate(gens):
        pt = g
        for w in range(w4):
            assert pt is not None, "16^w * G may never be the identity"
            xa[w, i] = F.int_to_limbs(pt[0] * f.r_mod_p % f.p)
            ya[w, i] = F.int_to_limbs(pt[1] * f.r_mod_p % f.p)
            for _ in range(4):
                pt = C.host_add(spec, pt, pt)
    return xa, ya


def digits_tm(scalars_canon: jnp.ndarray, m: int, b: int, lpw: int,
              w4: int, n_lanes_pad: int) -> jnp.ndarray:
    """Canonical-limb scalars (m, 32) -> time-major digits (B, n_lanes)."""
    d = M._digits4(scalars_canon, w4)                   # (W4, m)
    pad_pts = lpw * b - m
    if pad_pts:
        d = jnp.pad(d, ((0, 0), (0, pad_pts)))
    d = d.reshape(w4, lpw, b).transpose(2, 0, 1).reshape(b, w4 * lpw)
    if n_lanes_pad > w4 * lpw:
        d = jnp.pad(d, ((0, 0), (0, n_lanes_pad - w4 * lpw)))
    return d


# ---------------------------------------------------------------------------
# Bucket kernel.
# ---------------------------------------------------------------------------


def _bucket_kernel(cc_ref, d_ref, px_ref, py_ref, out_ref):
    cc = cc_ref[:]
    t_chunk = pl.program_id(1)

    @pl.when(t_chunk == 0)
    def _():
        out_ref[0] = jnp.zeros((NSLOT, L, LB), jnp.int32)
        out_ref[1] = jnp.broadcast_to(cc[3, :L, None], (NSLOT, L, LB))
        out_ref[2] = jnp.zeros((NSLOT, L, LB), jnp.int32)

    def body(tt, _):
        d = d_ref[pl.ds(tt, 1), :]                       # (1, LB)
        px = px_ref[pl.ds(tt, 1)].reshape(L, LB)
        py = py_ref[pl.ds(tt, 1)].reshape(L, LB)
        # one-hot gather of each lane's target bucket
        bx = jnp.zeros((L, LB), jnp.int32)
        by = jnp.zeros((L, LB), jnp.int32)
        bz = jnp.zeros((L, LB), jnp.int32)
        for s in range(NSLOT):
            m = d == s                                   # (1, LB)
            bx = jnp.where(m, out_ref[0, s], bx)
            by = jnp.where(m, out_ref[1, s], by)
            bz = jnp.where(m, out_ref[2, s], bz)
        nx, ny, nz = PC.pt_add_mixed_rows(cc, (bx, by, bz), (px, py))
        for s in range(NSLOT):
            m = d == s
            out_ref[0, s] = jnp.where(m, nx, out_ref[0, s])
            out_ref[1, s] = jnp.where(m, ny, out_ref[1, s])
            out_ref[2, s] = jnp.where(m, nz, out_ref[2, s])
        return 0

    jax.lax.fori_loop(0, d_ref.shape[0], body, 0)


def _bucket_call(n_lanes: int, b: int):
    bc = min(BC, b)
    assert b % bc == 0
    return pl.pallas_call(
        _bucket_kernel,
        out_shape=jax.ShapeDtypeStruct((3, NSLOT, L, n_lanes), jnp.int32),
        grid=(n_lanes // LB, b // bc),
        in_specs=[
            pl.BlockSpec((4, L + 1), lambda g, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, LB), lambda g, t: (t, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, L, LB), lambda g, t: (t, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, L, LB), lambda g, t: (t, 0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, NSLOT, L, LB), lambda g, t: (0, 0, 0, g),
                               memory_space=pltpu.VMEM),
        interpret=PF.interpret(),
    )


# ---------------------------------------------------------------------------
# Merge kernel: reduce the lane axis per bucket slot.
# ---------------------------------------------------------------------------


def _merge_kernel(cc_ref, bk_ref, out_ref):
    cc = cc_ref[:]
    n_lanes = bk_ref.shape[3]
    n_chunks = n_lanes // LB

    def body(i, acc):
        chunk = (bk_ref[0, 0, :, pl.ds(i * LB, LB)],
                 bk_ref[1, 0, :, pl.ds(i * LB, LB)],
                 bk_ref[2, 0, :, pl.ds(i * LB, LB)])
        return PC.pt_add_rows(cc, acc, chunk)

    acc = PC.identity_rows(cc, LB)
    acc = jax.lax.fori_loop(0, n_chunks, body, acc)
    w = LB
    while w > 128:   # halving tree down to one 128-wide tile
        h = w // 2
        acc = PC.pt_add_rows(cc, tuple(a[:, :h] for a in acc),
                             tuple(a[:, h:w] for a in acc))
        w = h
    out_ref[0, 0] = acc[0]
    out_ref[1, 0] = acc[1]
    out_ref[2, 0] = acc[2]


def _merge_call(n_lanes: int):
    return pl.pallas_call(
        _merge_kernel,
        out_shape=jax.ShapeDtypeStruct((3, NSLOT, L, 128), jnp.int32),
        grid=(NSLOT,),
        in_specs=[
            pl.BlockSpec((4, L + 1), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 1, L, n_lanes), lambda s: (0, s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, 1, L, 128), lambda s: (0, s, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=PF.interpret(),
    )


def _tree_128(spec: C.CurveSpec, pts):
    """(3, NSLOT, 32, 128) -> per-slot points (element-major (NSLOT, 32) x3)
    by reducing the 128 residual lanes in XLA (tiny widths)."""
    x, y, z = (jnp.moveaxis(pts[i], 1, 2) for i in range(3))  # (NSLOT,128,32)
    p = (x, y, z)
    w = 128
    while w > 1:
        h = w // 2
        p = C.pt_add(spec, tuple(a[:, :h] for a in p),
                     tuple(a[:, h:w] for a in p))
        w = h
    return tuple(a[:, 0] for a in p)                     # (NSLOT, 32) each


def _wsum(spec: C.CurveSpec, slot_pts):
    """Weighted suffix sum over slots 15..1: S = sum_v v * B_v."""
    tail = tuple(a[1:][::-1] for a in slot_pts)          # v = 15..1

    def step(carry, bv):
        t, s = carry
        t = C.pt_add(spec, t, bv)
        s = C.pt_add(spec, s, t)
        return (t, s), None

    zero = C.identity_for(spec)
    (_, s), _ = jax.lax.scan(step, (zero, zero), tail)
    return s


def msm_pallas(spec: C.CurveSpec, scalars_canon: jnp.ndarray,
               px_tm: jnp.ndarray, py_tm: jnp.ndarray,
               m: int, max_bits: int) -> C.Point:
    """MSM over canonical-limb scalars (m, 32) and cached time-major affine
    bases (from scaled_affine_tm). Returns a projective element-major point
    (same convention as ops/msm.msm)."""
    b, lpw, w4, n_lanes = plan(m, max_bits)
    cc = PC.curve_consts_dev(spec)
    d = digits_tm(scalars_canon, m, b, lpw, w4, n_lanes)
    buckets = _bucket_call(n_lanes, b)(cc, d, px_tm, py_tm)
    reduced = _merge_call(n_lanes)(cc, buckets)
    slot_pts = _tree_128(spec, reduced)
    return _wsum(spec, slot_pts)
