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
BC = 16        # points per lane per grid step (on-chip sweep r04: 16 beats
               # 8 by ~7% at the comm_T shape; 32 is slightly worse, 64 and
               # LB=1024 exceed the Mosaic compiler's limits)


# ---------------------------------------------------------------------------
# Key preparation: affine pre-scaled bases in time-major limb-major layout.
# ---------------------------------------------------------------------------


_INV_CACHE = {}


def _inv_kernel(c_ref, tp_ref, bits_ref, z_ref, o_ref):
    """Fermat inversion, fully in-kernel: fori over the 255 exponent bits
    (bit array in SMEM), two VMEM mont_muls per bit. One kernel launch for
    the whole batch instead of a 510-launch XLA scan (which took ~17 min to
    compile through the remote relay)."""
    c = c_ref[:]
    fc = (c[:, :2], tp_ref[:])
    z = z_ref[:]
    one_col = c[:L, 2:3]                    # one_mont column
    acc0 = jnp.broadcast_to(one_col, z.shape)

    def body(i, acc):
        acc = PF.mont_mul_rows(fc, acc, acc)
        withz = PF.mont_mul_rows(fc, acc, z)
        bit = bits_ref[0, i]
        return jnp.where(bit > 0, withz, acc)

    acc = jax.lax.fori_loop(0, bits_ref.shape[1], body, acc0)
    is_zero = jnp.all(z == 0, axis=0, keepdims=True)
    o_ref[:] = jnp.where(is_zero, jnp.zeros_like(acc), acc)


def batch_inv_mont_lm(spec: F.FieldSpec, z_lm: jnp.ndarray) -> jnp.ndarray:
    """Batched Fermat inversion of Montgomery-form limb-major (32, N) tiles
    on the pallas engine (0 -> 0). One-time key-prep cost."""
    n = z_lm.shape[1]
    key = (spec.name, n)
    if key not in _INV_CACHE:
        nbits = len(spec.exp_p_minus_2_bits)
        fn = pl.pallas_call(
            _inv_kernel,
            out_shape=jax.ShapeDtypeStruct((L, n), jnp.int32),
            grid=(n // PF.N_LANES,),
            in_specs=[
                pl.BlockSpec((L + 1, 4), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3 * L, L), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nbits), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((L, PF.N_LANES), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((L, PF.N_LANES), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            interpret=PF.interpret(),
        )
        cpack = np.zeros((L + 1, 4), np.int32)
        cpack[:, :2] = PF.field_consts(spec)
        cpack[:L, 2] = spec.one_mont_limbs
        bits = np.ascontiguousarray(
            np.asarray(spec.exp_p_minus_2_bits,
                       np.int32)[::-1][None])  # MSB first, (1, nbits)
        # Cache HOST arrays only (a jnp value cached from inside a trace
        # would leak a tracer into later traces).
        _INV_CACHE[key] = (jax.jit(fn), cpack, bits)
    fn, cpack, bits = _INV_CACHE[key]
    return fn(jnp.asarray(cpack), PF.toep_consts_dev(spec),
              jnp.asarray(bits), z_lm)


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


def _bucket_kernel(cc_ref, tp_ref, d_ref, px_ref, py_ref, out_ref):
    cci = cc_ref[:]
    cc = (cci, tp_ref[:])
    t_chunk = pl.program_id(2)
    # Precompute the identity-Y fill OUTSIDE the when-branch: integer
    # indexing of a value inside a Mosaic cond branch lowers to an
    # unsupported gather.
    y_fill = jnp.broadcast_to(cci[:L, 3:4][None], (NSLOT, L, LB))

    @pl.when(t_chunk == 0)
    def _():
        out_ref[0] = jnp.zeros((NSLOT, L, LB), jnp.int32)
        out_ref[1] = y_fill
        out_ref[2] = jnp.zeros((NSLOT, L, LB), jnp.int32)

    def body(tt, _):
        d = d_ref[0, pl.ds(tt, 1), :]                    # (1, LB)
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

    jax.lax.fori_loop(0, d_ref.shape[1], body, 0)


def _bucket_call(n_jobs: int, n_lanes: int, b: int):
    """Grid (jobs, lane_blocks, t_chunks), t innermost so the output block
    (one lane block's bucket set of one job) stays VMEM-resident across all
    t iterations. The BASE blocks index only (t, lane_block): all jobs
    stream the SAME base array — one HBM copy regardless of J (the whole
    point of job batching: K lockstep comm_T MSMs or a chunk of W commits
    in ONE dispatch instead of K serialized ~30 ms dispatches)."""
    bc = min(BC, b)
    assert b % bc == 0
    gb = n_lanes // LB
    return pl.pallas_call(
        _bucket_kernel,
        out_shape=jax.ShapeDtypeStruct((3, NSLOT, L, n_jobs * n_lanes),
                                       jnp.int32),
        grid=(n_jobs, gb, b // bc),
        in_specs=[
            pl.BlockSpec((L + 1, 4), lambda j, g, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5 * L, L), lambda j, g, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc, LB), lambda j, g, t: (j, t, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, L, LB), lambda j, g, t: (t, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, L, LB), lambda j, g, t: (t, 0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, NSLOT, L, LB),
                               lambda j, g, t: (0, 0, 0, j * gb + g),
                               memory_space=pltpu.VMEM),
        interpret=PF.interpret(),
    )


# ---------------------------------------------------------------------------
# Merge kernel: reduce the lane axis per bucket slot.
# ---------------------------------------------------------------------------


def _merge_kernel(cc_ref, tp_ref, bk_ref, out_ref):
    """Reduce one bucket slot's lane axis all the way to a single point
    (broadcast across the 128-lane output tile). The full halving tree runs
    in-kernel: doing the tail reduction in XLA costs ~37 sequential
    tiny-width point adds (~40 ms of in-graph overhead per MSM — measured
    dominant over the bucket kernel itself)."""
    cc = (cc_ref[:], tp_ref[:])
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
    while w > 128:   # halving tree by lane slices down to one 128-tile
        h = w // 2
        acc = PC.pt_add_rows(cc, tuple(a[:, :h] for a in acc),
                             tuple(a[:, h:w] for a in acc))
        w = h
    # Below 128 lanes, slice-halving hits a Mosaic layout bug (sub-tile
    # lane offsets in concatenate); reduce by circular lane ROTATION on
    # full-width tiles instead — field ops are lane-independent, so after
    # log2(128) roll-adds EVERY lane holds the total.
    if PF.interpret():
        # Compile-light variant for the CPU test mesh: the unrolled adds
        # blow up XLA:CPU compile (each pt_add is ~3k primitives); a fori
        # with a dynamic shift keeps one body. TPU keeps the unroll
        # (Mosaic compiles it once; dynamic rotate amounts are riskier).
        def roll_body(i, a):
            h = 64 >> i
            rot = tuple(jnp.roll(x, h, 1) for x in a)
            return PC.pt_add_rows(cc, a, rot)

        acc = jax.lax.fori_loop(0, 7, roll_body, acc)
    else:
        h = 64
        while h >= 1:
            rot = tuple(pltpu.roll(a, h, 1) for a in acc)
            acc = PC.pt_add_rows(cc, acc, rot)
            h //= 2
    out_ref[0, 0] = acc[0]
    out_ref[1, 0] = acc[1]
    out_ref[2, 0] = acc[2]


def _merge_call(n_jobs: int, n_lanes: int):
    return pl.pallas_call(
        _merge_kernel,
        out_shape=jax.ShapeDtypeStruct((3, NSLOT, L, n_jobs * 128),
                                       jnp.int32),
        grid=(n_jobs, NSLOT),
        in_specs=[
            pl.BlockSpec((L + 1, 4), lambda j, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5 * L, L), lambda j, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 1, L, n_lanes), lambda j, s: (0, s, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, 1, L, 128), lambda j, s: (0, s, 0, j),
                               memory_space=pltpu.VMEM),
        interpret=PF.interpret(),
    )


def _wsum_kernel(cc_ref, tp_ref, id_ref, sl_ref, out_ref):
    """Weighted suffix sum over slots 15..1 (S = sum_v v * B_v), unrolled
    in-kernel on width-128 tiles. 30 point adds of fixed cost instead of an
    XLA scan of tiny-width ops. The identity tiles arrive as an OPERAND —
    broadcasting the one_mont column in-kernel trips a Mosaic layout bug
    (offset-lane scalar -> (32,128) broadcast)."""
    cc = (cc_ref[:], tp_ref[:])
    t = (id_ref[0], id_ref[1], id_ref[2])
    s = t
    if PF.interpret():
        # One fori body instead of 15 unrolled double-adds: keeps the
        # XLA:CPU test-mesh compile tractable (see _merge_kernel note).
        sl = sl_ref[:]

        def body(i, ts):
            t, s = ts
            v = NSLOT - 1 - i
            bv = tuple(jax.lax.dynamic_index_in_dim(sl[c], v, 0,
                                                    keepdims=False)
                       for c in range(3))
            t = PC.pt_add_rows(cc, t, bv)
            s = PC.pt_add_rows(cc, s, t)
            return (t, s)

        t, s = jax.lax.fori_loop(0, NSLOT - 1, body, (t, s))
    else:
        for v in range(NSLOT - 1, 0, -1):
            bv = (sl_ref[0, v], sl_ref[1, v], sl_ref[2, v])
            t = PC.pt_add_rows(cc, t, bv)
            s = PC.pt_add_rows(cc, s, t)
    out_ref[0] = s[0]
    out_ref[1] = s[1]
    out_ref[2] = s[2]


def _wsum_call(n_jobs: int):
    return pl.pallas_call(
        _wsum_kernel,
        out_shape=jax.ShapeDtypeStruct((3, L, n_jobs * 128), jnp.int32),
        grid=(n_jobs,),
        in_specs=[
            pl.BlockSpec((L + 1, 4), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5 * L, L), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, L, 128), lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, NSLOT, L, 128), lambda j: (0, 0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, L, 128), lambda j: (0, 0, j),
                               memory_space=pltpu.VMEM),
        interpret=PF.interpret(),
    )


def _identity_tiles(spec: C.CurveSpec) -> jnp.ndarray:
    """(3, L, 128) projective identity tiles, built in XLA outside the
    kernel (constant-folded)."""
    one = jnp.asarray(np.asarray(spec.base.one_mont_limbs, np.int32))
    z = jnp.zeros((L, 128), jnp.int32)
    return jnp.stack([z, jnp.broadcast_to(one[:, None], (L, 128)), z])


def msm_pallas_many(spec: C.CurveSpec, scalars_canon: jnp.ndarray,
                    px_tm: jnp.ndarray, py_tm: jnp.ndarray,
                    m: int, max_bits: int) -> C.Point:
    """J same-shape MSMs over ONE shared base array in ONE dispatch chain.

    scalars_canon: (J, m, 32) canonical limbs. Returns stacked projective
    (J, 32) x3. This is the lockstep batching fix (VERDICT r03 #1): the K
    per-chain comm_T commits and the per-chunk W commits each become a
    single program — profiling showed ~27 ms of fixed dispatch overhead
    per standalone MSM (tools/profile_msm_phases.py), which at K x chunk
    dispatches per step dominated the lockstep fold loop."""
    J = scalars_canon.shape[0]
    b, lpw, w4, n_lanes = plan(m, max_bits)
    cc = PC.curve_consts_dev(spec)
    ct = PC.curve_toep_dev(spec)
    d = jax.vmap(lambda s: digits_tm(s, m, b, lpw, w4, n_lanes))(
        scalars_canon)                                   # (J, B, n_lanes)
    buckets = _bucket_call(J, n_lanes, b)(cc, ct, d, px_tm, py_tm)
    reduced = _merge_call(J, n_lanes)(cc, ct, buckets)
    s = _wsum_call(J)(cc, ct, _identity_tiles(spec), reduced)
    return tuple(s[i].reshape(L, J, 128)[:, :, 0].T
                 for i in range(3))                      # (J, 32) x3


def msm_pallas(spec: C.CurveSpec, scalars_canon: jnp.ndarray,
               px_tm: jnp.ndarray, py_tm: jnp.ndarray,
               m: int, max_bits: int) -> C.Point:
    """MSM over canonical-limb scalars (m, 32) and cached time-major affine
    bases (from scaled_affine_tm). Returns a projective element-major point
    (same convention as ops/msm.msm)."""
    s = msm_pallas_many(spec, scalars_canon[None], px_tm, py_tm, m, max_bits)
    return (s[0][0], s[1][0], s[2][0])
