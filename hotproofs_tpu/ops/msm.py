"""Multi-scalar multiplication (Pippenger) for TPU.

TPU-native replacement for the MSMs inside arecibo's Pedersen commitments
(witness W and cross-term T commits in RecursiveSNARK::prove_step — SURVEY.md
§3.2). The reference runs rayon-parallel CPU Pippenger; a TPU has no
efficient per-element scatter loops, so the bucket phase is reformulated as
sort + blocked running-segment reduction, engineered for XLA's compilation
model: every curve-add "combine" is instantiated exactly ONCE inside a
lax.scan body (an associative_scan would inline the ~6k-op complete-addition
graph O(log N) times and blow compile time up by two orders of magnitude).

Pipeline per radix-2^8 window (digits ARE the base-2^8 scalar limbs):
  1. sort point indices by digit (argsort + gather)
  2. reshape into C parallel chunks x B positions; lax.scan down B with a
     running (segment value, segment digit) carry per chunk; on digit change
     flush the finished segment into a per-chunk bucket slot (one masked
     scatter per step — slot 256 is a dump for non-flushing lanes)
  3. merge the C per-chunk bucket arrays (scan, 256-wide adds)
  4. weighted sum  S = Σ v·B_v  via one scan v=255..1 with carry (T, S):
     T += B_v; S += T
Windows run inside an outer lax.scan (MSB-first) with the Horner step (8
doublings + add) fused into the body, so the full MSM graph stays ~25k ops
regardless of N. Work is O(N + 2^c) curve adds per window — the Pippenger
optimum — all batched C-wide (C=64 lanes by default).

Scalars with known small bit-width (witness vectors are mostly bits/u32
words) use fewer windows via max_bits — a ~6x saving the reference cannot
express.

Sharding: points/scalars split along N across devices under shard_map; each
device computes a partial MSM and partials combine with one pt_add reduction
(parallel/msm_sharded.py).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from . import curve as C
from . import field as F

DUMP = 256  # scatter slot for "no flush"


def _bucket_weighted_sum(spec: C.CurveSpec, digits: jnp.ndarray,
                         pts: C.Point, n_chunks: int) -> C.Point:
    """One window: Σ v · (Σ points with digit v). digits: (N,) int32."""
    n = digits.shape[0]
    b = -(-n // n_chunks)  # ceil
    pad = n_chunks * b - n

    order = jnp.argsort(digits)
    d_sorted = digits[order]
    p_sorted = tuple(x[order] for x in pts)

    d_sorted = jnp.concatenate(
        [d_sorted, jnp.full((pad,), DUMP, jnp.int32)])
    identity_pad = C.identity_for(spec, (pad,))
    p_sorted = tuple(jnp.concatenate([x, ip], axis=0)
                     for x, ip in zip(p_sorted, identity_pad))

    # (C, B) row-major: each chunk is a contiguous run of the sorted order.
    d_cb = d_sorted.reshape(n_chunks, b)
    p_cb = tuple(x.reshape(n_chunks, b, F.N_LIMBS) for x in p_sorted)

    lanes = jnp.arange(n_chunks)
    buckets0 = C.identity_for(spec, (n_chunks, DUMP + 1))
    run0 = C.identity_for(spec, (n_chunks,))
    dig0 = jnp.full((n_chunks,), -1, jnp.int32)

    def step(carry, inp):
        run, run_dig, buckets = carry
        cur_pt, cur_dig = inp
        same = cur_dig == run_dig
        slot = jnp.where(same | (run_dig < 0), DUMP, run_dig)
        buckets = tuple(bk.at[lanes, slot].set(rv)
                        for bk, rv in zip(buckets, run))
        merged = C.pt_add(spec, run, cur_pt)
        run = C.pt_select(same, merged, cur_pt)
        return (run, cur_dig, buckets), None

    xs = (tuple(jnp.moveaxis(x, 0, 1) for x in p_cb),
          jnp.moveaxis(d_cb, 0, 1))
    (run, run_dig, buckets), _ = jax.lax.scan(
        step, (run0, dig0, buckets0), xs)
    # Final flush of the trailing segments.
    slot = jnp.where(run_dig < 0, DUMP, run_dig)
    buckets = tuple(bk.at[lanes, slot].set(rv)
                    for bk, rv in zip(buckets, run))

    # Merge per-chunk buckets: unrolled pairwise tree over the chunk axis
    # (log2(C) wide launches instead of a C-iteration scan).
    cur = buckets
    width = n_chunks
    while width > 1:
        half = width // 2
        top = tuple(x[..., :half, :, :] for x in cur)
        bot = tuple(x[..., half: 2 * half, :, :] for x in cur)
        summed = C.pt_add(spec, top, bot)
        if width % 2:
            summed = tuple(
                jnp.concatenate([s, x[..., 2 * half: width, :, :]],
                                axis=-3)
                for s, x in zip(summed, cur))
            width = half + 1
        else:
            width = half
        cur = summed
    bk = tuple(x[..., 0, :DUMP, :] for x in cur)  # (256, limbs)
    return _weighted_bucket_sum(spec, bk)


def _weighted_bucket_sum(spec: C.CurveSpec, bk: C.Point) -> C.Point:
    """S = Σ_v v·B_v over 256 buckets via bit decomposition of v:
    S = Σ_{k<8} 2^k · (Σ_{v: bit k set} B_v). The masked sums run as ONE
    8-way-batched unrolled pairwise tree (8 wide launches) instead of a
    255-iteration sequential scan — sequential-launch count is what bounds
    MSM time on TPU, not arithmetic (measured ~2ms per while-loop step
    regardless of width)."""
    vbits = ((jnp.arange(DUMP)[None, :] >> jnp.arange(8)[:, None]) & 1)
    ident = C.identity_for(spec, (DUMP,))
    cur = tuple(jnp.where(vbits[..., None].astype(bool), x[None],
                          id_c[None])
                for x, id_c in zip(bk, ident))      # (8, 256, limbs)
    width = DUMP
    while width > 1:
        half = width // 2
        top = tuple(x[..., :half, :] for x in cur)
        bot = tuple(x[..., half: 2 * half, :] for x in cur)
        cur = C.pt_add(spec, top, bot)
        width = half
    mk = tuple(x[..., 0, :] for x in cur)           # (8, limbs)

    def horner_bit(acc, p_k):
        acc = C.pt_double(spec, acc)
        return C.pt_add(spec, acc, p_k), None

    rev = tuple(x[::-1] for x in mk)
    acc, _ = jax.lax.scan(horner_bit, C.identity_for(spec), rev)
    return acc


def msm(spec: C.CurveSpec, scalar_limbs: jnp.ndarray, points: C.Point,
        max_bits: int = 256, n_chunks: int = 64) -> C.Point:
    """MSM over canonical-digit scalars (N, 32) and batched points (N, ...).

    max_bits bounds scalar magnitude: witness vectors (bits/u32/u34 values)
    use max_bits=40 → 5 windows instead of 32.

    The bucket phase runs vmapped across ALL windows at once (maximum lane
    width, ~W× fewer sequential scan iterations); only the cheap Horner
    combine is window-sequential."""
    n = scalar_limbs.shape[0]
    n_windows = (max_bits + F.LIMB_BITS - 1) // F.LIMB_BITS
    n_chunks = max(1, min(n_chunks, n))
    digits = jnp.moveaxis(
        scalar_limbs[..., :n_windows], -1, 0)  # (W, N), LSB window first

    per_window = jax.vmap(
        lambda dg: _bucket_weighted_sum(spec, dg, points, n_chunks))
    S = per_window(digits)  # window-batched point, LSB first

    def horner(acc, s_w):
        acc, _ = jax.lax.scan(lambda p, _: (C.pt_double(spec, p), None),
                              acc, None, length=F.LIMB_BITS)
        return C.pt_add(spec, acc, s_w), None

    rev = tuple(x[::-1] for x in S)  # MSB window first
    acc, _ = jax.lax.scan(horner, C.identity_for(spec), rev)
    return acc


def msm_jitted(spec: C.CurveSpec, max_bits: int = 256):
    return jax.jit(lambda s, p: msm(spec, s, p, max_bits=max_bits))


# ---------------------------------------------------------------------------
# Fixed-base MSM: the commitment-key bases never change, so each radix-256
# window's 256^w weighting is folded into precomputed scaled generators
# 256^w * G_j. The whole multi-window MSM becomes ONE flat single-window
# bucket problem over W*N (point, digit) pairs — no Horner doublings, no
# per-window phase. Sequential structure is engineered for TPU launch
# overhead (~ms per XLA while-loop step regardless of width): a wide bucket
# scan (few dozen iterations), an unrolled pairwise merge tree over chunks,
# and a bit-decomposed bucket weighting (8 masked tree-sums).
# ---------------------------------------------------------------------------


def scale_generators(spec: C.CurveSpec, points: C.Point,
                     n_windows: int) -> C.Point:
    """Device precompute of (W, N, ...) scaled generators: 256^w * G_j."""
    def next_window(p, _):
        def dbl(q, __):
            return C.pt_double(spec, q), None
        p8, _ = jax.lax.scan(dbl, p, None, length=F.LIMB_BITS)
        return p8, p

    _, stacked = jax.lax.scan(next_window, points, None, length=n_windows)
    return stacked  # (W, N, limbs) per coordinate


def msm_fixed(spec: C.CurveSpec, scalar_limbs: jnp.ndarray,
              scaled_pts: C.Point, n_windows: int,
              n_chunks: int = 2048) -> C.Point:
    """MSM with pre-scaled generators. scalar_limbs (N, 32); scaled_pts
    (W, N, ...) with W >= n_windows.

    STATUS (measured on TPU v5e, N=16k, 32 windows): correct, but NOT faster
    than `msm` yet — the dense per-chunk bucket buffer (C, 257, limbs) makes
    the scatter phase memory-bound (n_chunks=4096 ran 3.6x slower than the
    default path; 8192 OOMs from tiling padding). Keep default commits on
    `msm`; revisit with a radix-2^4 variant (17-slot buckets, 15x smaller
    buffers) or a Pallas bucket kernel. See docs/ROADMAP.md."""
    n = scalar_limbs.shape[0]
    digits = jnp.moveaxis(scalar_limbs[..., :n_windows], -1, 0)  # (W, N)
    flat_d = digits.reshape(n_windows * n)
    flat_p = tuple(x[:n_windows].reshape(n_windows * n, F.N_LIMBS)
                   for x in scaled_pts)

    total = n_windows * n
    n_chunks = max(1, min(n_chunks, total))
    b = -(-total // n_chunks)
    pad = n_chunks * b - total

    order = jnp.argsort(flat_d)
    d_sorted = jnp.concatenate(
        [flat_d[order], jnp.full((pad,), DUMP, jnp.int32)])
    identity_pad = C.identity_for(spec, (pad,))
    p_sorted = tuple(jnp.concatenate([x[order], ip], axis=0)
                     for x, ip in zip(flat_p, identity_pad))

    d_cb = d_sorted.reshape(n_chunks, b)
    p_cb = tuple(x.reshape(n_chunks, b, F.N_LIMBS) for x in p_sorted)

    lanes = jnp.arange(n_chunks)
    buckets0 = C.identity_for(spec, (n_chunks, DUMP + 1))
    run0 = C.identity_for(spec, (n_chunks,))
    dig0 = jnp.full((n_chunks,), -1, jnp.int32)

    def step(carry, inp):
        run, run_dig, buckets = carry
        cur_pt, cur_dig = inp
        same = cur_dig == run_dig
        slot = jnp.where(same | (run_dig < 0), DUMP, run_dig)
        buckets = tuple(bk.at[lanes, slot].set(rv)
                        for bk, rv in zip(buckets, run))
        merged = C.pt_add(spec, run, cur_pt)
        run = C.pt_select(same, merged, cur_pt)
        return (run, cur_dig, buckets), None

    xs = (tuple(jnp.moveaxis(x, 0, 1) for x in p_cb),
          jnp.moveaxis(d_cb, 0, 1))
    (run, run_dig, buckets), _ = jax.lax.scan(
        step, (run0, dig0, buckets0), xs)
    slot = jnp.where(run_dig < 0, DUMP, run_dig)
    buckets = tuple(bk.at[lanes, slot].set(rv)
                    for bk, rv in zip(buckets, run))

    # Pairwise merge tree over the chunk axis (unrolled log2 rounds; each
    # round is ONE wide pt_add launch).
    cur = buckets
    width = n_chunks
    while width > 1:
        half = width // 2
        top = tuple(x[:half] for x in cur)
        bot = tuple(x[half: 2 * half] for x in cur)
        summed = C.pt_add(spec, top, bot)
        if width % 2:
            summed = tuple(jnp.concatenate([s, x[2 * half: width]], axis=0)
                           for s, x in zip(summed, cur))
            width = half + 1
        else:
            width = half
        cur = summed
    bk = tuple(x[0, :DUMP] for x in cur)  # (256, limbs)

    # Weighted sum via bit decomposition of the bucket value: S = sum_k 2^k *
    # (sum of buckets whose index has bit k) — 8 masked tree-sums, batched
    # over k, then an 8-step Horner.
    vbits = ((jnp.arange(DUMP)[None, :] >> jnp.arange(8)[:, None]) & 1)
    ident = C.identity_for(spec, (DUMP,))
    masked = tuple(jnp.where(vbits[..., None].astype(bool),
                             x[None], id_c[None])
                   for x, id_c in zip(bk, ident))
    # masked: (8, 256, limbs). Tree-reduce over the bucket axis.
    cur = masked
    width = DUMP
    while width > 1:
        half = width // 2
        top = tuple(x[:, :half] for x in cur)
        bot = tuple(x[:, half: 2 * half] for x in cur)
        cur = C.pt_add(spec, top, bot)
        width = half
    mk = tuple(x[:, 0] for x in cur)  # (8, limbs)

    def horner_bit(acc, p_k):
        acc = C.pt_double(spec, acc)
        return C.pt_add(spec, acc, p_k), None

    rev = tuple(x[::-1] for x in mk)
    acc, _ = jax.lax.scan(horner_bit, C.identity_for(spec), rev)
    return acc
