"""Multi-scalar multiplication (Pippenger) for TPU — radix-16 flat design.

TPU-native replacement for the MSMs inside arecibo's Pedersen commitments
(witness W and cross-term T commits in RecursiveSNARK::prove_step — SURVEY.md
§3.2). The reference runs rayon-parallel CPU Pippenger; a TPU has no
efficient per-element scatter loops, so the bucket phase is reformulated as
per-window sort + blocked running-segment reduction.

Design rules learned from round-1 measurements (docs/ROADMAP.md):
  * XLA while-loop steps cost ~1-2 ms EACH on TPU regardless of width, so
    the graph must minimise SEQUENTIAL steps, not arithmetic.
  * Python tracing + XLA compile time scale with the number of times the
    ~2-3k-op curve-add graph is INSTANTIATED, so every reduction phase is a
    lax.scan whose body instantiates the combine exactly once (round 1's
    unrolled pairwise trees instantiated it ~20x: a single full-width MSM
    cost 62 s trace + 178 s compile on CPU).

Pipeline (radix-2^4 digits, all windows processed in ONE flat bucket pass):
  1. pre-scale points: scaled[w] = 16^w * P  (one scan; for commitment keys
     the bases never change, so pedersen.py caches this per key and the
     ~256-step scaling scan disappears from the hot path entirely)
  2. per-window argsort of the 4-bit digits (vmapped over windows)
  3. reshape each window into lanes of B positions (lanes never span
     windows, so each digit has exactly one run per lane); ONE lax.scan of
     length B accumulates running segments into 17-slot buckets per lane
  4. lane merge: ONE lax.scan of log2(C) fixed-width halving steps
  5. weighted sum  S = sum_v v*B_v  over 15 buckets: ONE 15-step suffix
     scan (T += B_v; S += T)
No Horner phase, no per-window loop: window weighting lives in the scaled
points. Sequential depth ~ B + log2(C) + 15 (+64*4 doublings when scaling
on the fly for variable bases).

Scalars with known small bit-width (witness vectors are bits/u32 words) use
max_bits=40 -> 10 windows instead of 64, a ~6x work saving the reference
cannot express.

Sharding: points/scalars split along N across devices under shard_map; each
device computes a partial MSM and partials combine with one pt_add reduction
(parallel/msm_sharded.py).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import curve as C
from . import field as F

DUMP = 16          # bucket slot for "no flush" (digit 0 also lands here)
RADIX_BITS = 4
N_BUCKETS = 17     # slots 1..15 carry value; 0 and 16 are dumps


def n_windows4(max_bits: int) -> int:
    return (max_bits + RADIX_BITS - 1) // RADIX_BITS


def scale_points16(spec: C.CurveSpec, points: C.Point,
                   windows: int) -> C.Point:
    """(W4, N, ...) scaled points 16^w * P_j via one doubling scan."""
    def next_window(p, _):
        def dbl(q, __):
            return C.pt_double(spec, q), None
        p16, _ = jax.lax.scan(dbl, p, None, length=RADIX_BITS)
        return p16, p

    _, stacked = jax.lax.scan(next_window, points, None, length=windows)
    return stacked


def _digits4(scalar_limbs: jnp.ndarray, windows: int) -> jnp.ndarray:
    """(N, 32) radix-256 canonical limbs -> (W4, N) radix-16 digits."""
    lo = scalar_limbs & 0xF
    hi = (scalar_limbs >> RADIX_BITS) & 0xF
    inter = jnp.stack([lo, hi], axis=-1)             # (N, 32, 2)
    flat = inter.reshape(scalar_limbs.shape[0], -1)  # (N, 64) LSB first
    return jnp.moveaxis(flat[:, :windows], -1, 0)


def msm(spec: C.CurveSpec, scalar_limbs: jnp.ndarray, points: C.Point,
        max_bits: int = 256, block: Optional[int] = None,
        merge_width: Optional[int] = None,
        scaled: Optional[C.Point] = None) -> C.Point:
    """MSM over canonical-limb scalars (N, 32) and points (N, ...).

    max_bits bounds scalar magnitude (witness vectors use 40 -> 10 4-bit
    windows). block is the per-lane scan length B (the dominant sequential
    cost on TPU, where a while-loop step costs ~1-2ms regardless of width;
    default 32 there). CPU executes width as real work, so its default
    trades sequential steps for fewer lanes (block 256). Pass `scaled`
    (from scale_points16) for fixed bases to skip the on-the-fly scaling
    scan."""
    if block is None:
        block = 256 if jax.default_backend() == "cpu" else 32
    if merge_width is None:
        # CPU pays the halving scan's idle rows as real work -> small R;
        # TPU pays sequential steps -> large R (fewer slab iterations).
        merge_width = 64 if jax.default_backend() == "cpu" else 2048
    n = scalar_limbs.shape[0]
    w4 = n_windows4(max_bits)
    if scaled is None:
        scaled = scale_points16(spec, points, w4)
    else:
        scaled = tuple(x[:w4] for x in scaled)

    digits = _digits4(scalar_limbs, w4)              # (W4, N)

    # Per-window sort (digit runs stay within one window's lanes).
    order = jnp.argsort(digits, axis=-1)
    d_sorted = jnp.take_along_axis(digits, order, axis=-1)
    p_sorted = tuple(
        jnp.take_along_axis(x, order[..., None], axis=1) for x in scaled)

    b = max(1, min(block, n))
    lanes_per_w = -(-n // b)                         # ceil
    pad = lanes_per_w * b - n
    if pad:
        d_sorted = jnp.concatenate(
            [d_sorted, jnp.full((w4, pad), DUMP, jnp.int32)], axis=1)
        ident = C.identity_for(spec, (w4, pad))
        p_sorted = tuple(jnp.concatenate([x, ip], axis=1)
                         for x, ip in zip(p_sorted, ident))

    n_lanes = w4 * lanes_per_w
    d_cb = d_sorted.reshape(n_lanes, b)
    p_cb = tuple(x.reshape(n_lanes, b, F.N_LIMBS) for x in p_sorted)

    buckets0 = C.identity_for(spec, (n_lanes, N_BUCKETS))
    run0 = C.identity_for(spec, (n_lanes,))
    dig0 = jnp.full((n_lanes,), -1, jnp.int32)
    slot_cols = jnp.arange(N_BUCKETS)[None, :]

    def _flush(buckets, slot, run):
        # Dense masked write, NOT a scatter: XLA lowers per-row scatters on
        # TPU to a serialized update loop (~2-5us per row — measured 2s for
        # one 32k-lane comm_T); the one-hot where() is pure vector writes.
        mask = slot_cols == slot[:, None]                # (C, 17)
        return tuple(jnp.where(mask[..., None], rv[:, None, :], bk)
                     for bk, rv in zip(buckets, run))

    def seg_step(carry, inp):
        run, run_dig, buckets = carry
        cur_pt, cur_dig = inp
        same = cur_dig == run_dig
        slot = jnp.where(same | (run_dig < 0), DUMP, run_dig)
        buckets = _flush(buckets, slot, run)
        merged = C.pt_add(spec, run, cur_pt)
        run = C.pt_select(same, merged, cur_pt)
        return (run, cur_dig, buckets), None

    xs = (tuple(jnp.moveaxis(x, 0, 1) for x in p_cb),
          jnp.moveaxis(d_cb, 0, 1))
    (run, run_dig, buckets), _ = jax.lax.scan(
        seg_step, (run0, dig0, buckets0), xs)
    buckets = _flush(buckets, jnp.where(run_dig < 0, DUMP, run_dig), run)

    # Lane merge in two levels, both single-instantiation scans with zero
    # wasted adds in level 1:
    #   1. slab scan: reshape (C, 17) -> (C/R, R, 17) and accumulate slabs
    #      into an (R, 17) carry (C/R sequential steps, work exactly C*17);
    #   2. halving scan over the R rows: step k pairs rows (2i, 2i+1) into
    #      row i; rows past the valid prefix are identities, so the fixed
    #      index set stays correct as the prefix shrinks (log2(R) steps).
    r_rows = max(1, min(merge_width, n_lanes))
    n_slab = -(-n_lanes // r_rows)
    lane_pad = n_slab * r_rows - n_lanes
    if lane_pad:
        ident_rows = C.identity_for(spec, (lane_pad, N_BUCKETS))
        buckets = tuple(jnp.concatenate([bk, ir], axis=0)
                        for bk, ir in zip(buckets, ident_rows))
    slabs = tuple(x.reshape(n_slab, r_rows, N_BUCKETS, F.N_LIMBS)
                  for x in buckets)

    def slab_step(carry, slab):
        return C.pt_add(spec, carry, slab), None

    carry0 = C.identity_for(spec, (r_rows, N_BUCKETS))
    buckets, _ = jax.lax.scan(slab_step, carry0, slabs)

    if r_rows > 1:
        if r_rows % 2:
            ident_row = C.identity_for(spec, (1, N_BUCKETS))
            buckets = tuple(jnp.concatenate([bk, ir], axis=0)
                            for bk, ir in zip(buckets, ident_row))
            r_rows += 1
        n_pair = r_rows // 2
        depth = (r_rows - 1).bit_length()
        idx_a = 2 * jnp.arange(n_pair)
        idx_b = idx_a + 1
        ident_half = C.identity_for(spec, (r_rows - n_pair, N_BUCKETS))

        def merge_step(bk, _):
            top = tuple(x[idx_a] for x in bk)
            bot = tuple(x[idx_b] for x in bk)
            s = C.pt_add(spec, top, bot)
            nxt = tuple(jnp.concatenate([sx, ir], axis=0)
                        for sx, ir in zip(s, ident_half))
            return nxt, None

        buckets, _ = jax.lax.scan(merge_step, buckets, None, length=depth)
    bk = tuple(x[0] for x in buckets)                # (17, limbs)

    # Weighted sum over buckets 1..15: suffix scan T += B_v; S += T.
    tail = tuple(x[1:16][::-1] for x in bk)          # v = 15 .. 1

    def wsum_step(carry, bv):
        T, S = carry
        T = C.pt_add(spec, T, bv)
        S = C.pt_add(spec, S, T)
        return (T, S), None

    zero = C.identity_for(spec)
    (_, S), _ = jax.lax.scan(wsum_step, (zero, zero), tail)
    return S


def msm_scan(spec: C.CurveSpec, scalar_limbs: jnp.ndarray,
             points: C.Point, max_bits: int = 256) -> C.Point:
    """Compile-light exact MSM: one vmapped double-and-add scan (each
    element computes s_i * P_i in lockstep over the 256 scalar bits) plus
    a log-depth pairwise point-add tree.

    Exists because the windowed Pippenger path (msm with in-graph
    scale_points16) lowers PATHOLOGICALLY on XLA:CPU — measured 96-250 s
    of compile per jit at ANY size, even 2 points (round-5 probe,
    docs/ROADMAP.md) — which made every IPA round of the Spartan
    compressor a multi-minute compile on the CPU test mesh. This
    formulation is a single scan body + ~log2(n) adds and compiles in
    seconds; output is bit-identical (same group element). Use it
    wherever the caller cannot pre-scale its bases (the IPA's per-round
    folded generators, the preprocessed-Spartan Com(L) tables); the
    fixed-base commitment paths keep the windowed fast path.

    max_bits caps the scan length (e.g. 40 for small-scalar witness
    commits: 40 sequential steps instead of 256)."""
    nbits = min(max_bits, F.N_LIMBS * F.LIMB_BITS)
    bits = []
    for i in range(nbits):
        limb, off = divmod(i, F.LIMB_BITS)
        bits.append((scalar_limbs[..., limb] >> off) & 1)
    bits_arr = jnp.stack(bits[::-1])                    # MSB first

    def step(acc, bit):
        acc = C.pt_double(spec, acc)
        added = C.pt_add(spec, acc, points)
        return C.pt_select(bit, added, acc), None

    acc0 = C.identity_for(spec, points[0].shape[:-1])
    per, _ = jax.lax.scan(step, acc0, bits_arr)         # (n,) s_i * P_i
    n = per[0].shape[0]
    while n > 1:
        h = (n + 1) // 2
        if n % 2:
            ident = C.identity_for(spec, (1,))
            per = tuple(jnp.concatenate([x, i], axis=0)
                        for x, i in zip(per, ident))
        per = C.pt_add(spec, tuple(x[:h] for x in per),
                       tuple(x[h:] for x in per))
        n = h
    return tuple(x[0] for x in per)


def use_scan_msm() -> bool:
    """Backend-adaptive MSM selection for non-fixed-base callers: the
    windowed path compiles fine on TPU but pathologically on XLA:CPU."""
    return jax.default_backend() != "tpu"


def msm_jitted(spec: C.CurveSpec, max_bits: int = 256):
    return jax.jit(lambda s, p: msm(spec, s, p, max_bits=max_bits))
