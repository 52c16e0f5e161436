"""EXPERIMENT: signed-digit radix-16 bucket kernel with 2-block interleave.

Hypothesis (round-4 sweep): the bucket kernel is LATENCY-bound on its
dependent point-add chain (~32 us per (32,512)-tile add vs ~0.1 us of MXU
work); LB=1024 would double the independent work per step but exceeds VMEM
with 16 bucket slots. Signed digits (d in [-8,8], sign folded into the
point's y) cut the slots to 9, freeing enough VMEM to interleave TWO
512-lane blocks per grid step — two independent add chains for the
scheduler to overlap.

Measures bucket-kernel time at the comm_T shape (m=16162, 256-bit) for:
  A. production unsigned kernel (16 slots, 1 block)   [baseline]
  B. signed 9-slot, 1 half
  C. signed 9-slot, 2 halves interleaved
and checks the signed bucket kernel's bucket sums against a host mirror
on a small case.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from hotproofs_tpu.utils.config import setup_jax
setup_jax()
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hotproofs_tpu.nova.pedersen import CommitmentKey
from hotproofs_tpu.ops import curve as C, field as F
from hotproofs_tpu.ops import msm as M
from hotproofs_tpu.ops import msm_pallas as MP
from hotproofs_tpu.ops import pallas_curve as PC
from hotproofs_tpu.ops import pallas_field as PF

SPEC = C.PALLAS
L = MP.L
LB = MP.LB
NS = 9  # signed slots: magnitude 0..8 (0 = dump)


def signed_recode(digits):
    """(W4, m) unsigned 4-bit digits -> encoded mag | (neg << 4), mag in
    0..8. Valid for scalars with top digit <= 7 (field elements < 2^255):
    the final carry folds into the top window without overflow."""
    def step(c, d):
        dp = d + c
        neg = (dp >= 9).astype(jnp.int32)
        mag = jnp.where(neg == 1, 16 - dp, dp)
        return neg, mag | (neg << 4)

    _, enc = jax.lax.scan(step, jnp.zeros(digits.shape[1], jnp.int32),
                          digits)
    return enc


def signed_digits_tm(scalars_canon, m, b, lpw, w4, n_lanes_pad):
    d = signed_recode(M._digits4(scalars_canon, w4))
    pad_pts = lpw * b - m
    if pad_pts:
        d = jnp.pad(d, ((0, 0), (0, pad_pts)))
    d = d.reshape(w4, lpw, b).transpose(2, 0, 1).reshape(b, w4 * lpw)
    if n_lanes_pad > w4 * lpw:
        d = jnp.pad(d, ((0, 0), (0, n_lanes_pad - w4 * lpw)))
    return d


def bucket_signed_call(n_jobs, n_lanes, b, bc, halves):
    """Arrays are pre-reshaped: digits (J, B, gb, halves, LB); bases
    (B, L, gb, halves, LB); out (3, NS, L, J*gb, halves, LB)."""
    gb = n_lanes // (LB * halves)

    def kern(cc_ref, tp_ref, d_ref, px_ref, py_ref, out_ref):
        cci = cc_ref[:]
        cc = (cci, tp_ref[:])
        p_col = cci[:L, 0:1]
        t_chunk = pl.program_id(2)
        y_fill = jnp.broadcast_to(cci[:L, 3:4][None, :, None, None],
                                  (NS, L, 1, halves, LB))

        @pl.when(t_chunk == 0)
        def _():
            out_ref[0] = jnp.zeros((NS, L, 1, halves, LB), jnp.int32)
            out_ref[1] = y_fill
            out_ref[2] = jnp.zeros((NS, L, 1, halves, LB), jnp.int32)

        def body(tt, _):
            ms, pts = [], []
            for h in range(halves):
                d = d_ref[0, pl.ds(tt, 1), 0, h]              # (1, LB)
                mag = d & 15
                neg = d >> 4
                px_ = px_ref[pl.ds(tt, 1), :, 0, h].reshape(L, LB)
                py_ = py_ref[pl.ds(tt, 1), :, 0, h].reshape(L, LB)
                # -y = (0 - y) mod p with real borrow handling (an
                # elementwise p - y would leave negative limbs, which the
                # shrink-only carry rounds do not admit).
                pneg = PF.sub_rows(cci, jnp.zeros((L, LB), jnp.int32),
                                   py_)
                py_ = jnp.where(neg == 1, pneg, py_)
                ms.append(mag)
                pts.append((px_, py_))
            gath = []
            for h in range(halves):
                mag = ms[h]
                bx = jnp.zeros((L, LB), jnp.int32)
                by = bx
                bz = bx
                for s in range(NS):
                    mm = mag == s
                    bx = jnp.where(mm, out_ref[0, s, :, 0, h], bx)
                    by = jnp.where(mm, out_ref[1, s, :, 0, h], by)
                    bz = jnp.where(mm, out_ref[2, s, :, 0, h], bz)
                gath.append((bx, by, bz))
            added = [PC.pt_add_mixed_rows(cc, gath[h], pts[h])
                     for h in range(halves)]
            for h in range(halves):
                mag = ms[h]
                nx, ny, nz = added[h]
                for s in range(NS):
                    mm = mag == s
                    out_ref[0, s, :, 0, h] = jnp.where(
                        mm, nx, out_ref[0, s, :, 0, h])
                    out_ref[1, s, :, 0, h] = jnp.where(
                        mm, ny, out_ref[1, s, :, 0, h])
                    out_ref[2, s, :, 0, h] = jnp.where(
                        mm, nz, out_ref[2, s, :, 0, h])
            return 0

        jax.lax.fori_loop(0, d_ref.shape[1], body, 0)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(
            (3, NS, L, n_jobs * gb, halves, LB), jnp.int32),
        grid=(n_jobs, gb, b // bc),
        in_specs=[
            pl.BlockSpec((L + 1, 4), lambda j, g, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5 * L, L), lambda j, g, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc, 1, halves, LB),
                         lambda j, g, t: (j, t, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, L, 1, halves, LB),
                         lambda j, g, t: (t, 0, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, L, 1, halves, LB),
                         lambda j, g, t: (t, 0, g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, NS, L, 1, halves, LB),
                               lambda j, g, t: (0, 0, 0, j * gb + g, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=PF.interpret(),
    )


def main():
    m, bits = 16162, 256
    ck = CommitmentKey.create(SPEC, b"blake3-nova", 16384)
    px, py = ck.scaled_tm(m, bits)               # (B, 32, n_lanes)
    b, lpw, w4, n_lanes = MP.plan(m, bits)
    print(f"plan b={b} lpw={lpw} w4={w4} n_lanes={n_lanes}", flush=True)
    cc = PC.curve_consts_dev(SPEC)
    ct = PC.curve_toep_dev(SPEC)
    rng = np.random.RandomState(5)
    REPS = 5
    scal = []
    for _ in range(REPS):
        raw = rng.randint(0, 256, size=(m, 32)).astype(np.int32)
        raw[:, -1] = 0
        scal.append(jnp.asarray(raw))

    # --- baseline: production kernel -------------------------------------
    dj = jax.jit(lambda s: MP.digits_tm(s, m, b, lpw, w4, n_lanes)[None])
    digs = [dj(s) for s in scal]
    bj = jax.jit(lambda d, x, y: MP._bucket_call(1, n_lanes, b)(
        cc, ct, d, x, y))
    t0 = time.time(); jax.block_until_ready(bj(digs[0], px, py))
    print(f"A compile {time.time()-t0:.0f}s", flush=True)
    ts = []
    for d in digs:
        t0 = time.time(); jax.block_until_ready(bj(d, px, py))
        ts.append(time.time() - t0)
    base_ms = sorted(ts)[2] * 1e3
    print(f"A unsigned 16-slot 1-block: {base_ms:8.2f} ms", flush=True)

    # --- signed variants --------------------------------------------------
    sdj = jax.jit(lambda s: signed_digits_tm(s, m, b, lpw, w4,
                                             n_lanes))
    sdigs = [sdj(s) for s in scal]
    jax.block_until_ready(sdigs)

    bc = min(MP.BC, b)
    for halves in (1, 2):
        hb = LB * halves
        if n_lanes % hb:
            print(f"halves={halves}: skip (n_lanes % {hb})", flush=True)
            continue
        gb = n_lanes // hb
        dz = [d.reshape(1, b, gb, halves, LB) for d in sdigs]
        pxz = px.reshape(b, L, gb, halves, LB)
        pyz = py.reshape(b, L, gb, halves, LB)
        call = bucket_signed_call(1, n_lanes, b, bc, halves)
        try:
            f = jax.jit(lambda d, x, y, c=call: c(cc, ct, d, x, y))
            t0 = time.time(); jax.block_until_ready(f(dz[0], pxz, pyz))
            print(f"signed halves={halves} compile {time.time()-t0:.0f}s",
                  flush=True)
            ts = []
            for d in dz:
                t0 = time.time(); jax.block_until_ready(f(d, pxz, pyz))
                ts.append(time.time() - t0)
            print(f"signed 9-slot halves={halves}: "
                  f"{sorted(ts)[2]*1e3:8.2f} ms  "
                  f"(baseline {base_ms:.2f})", flush=True)
        except Exception as e:
            print(f"halves={halves} FAIL: {type(e).__name__} "
                  f"{str(e)[:200]}", flush=True)

    # --- correctness spot-check of the signed buckets --------------------
    # Reconstruct S = sum_w sum_lane [ sum over slots v of v * B_v ] from
    # the halves=1 kernel output and compare against the XLA MSM result.
    halves = 1
    gb = n_lanes // LB
    call = bucket_signed_call(1, n_lanes, b, bc, halves)
    f = jax.jit(lambda d, x, y: call(cc, ct, d, x, y))
    out = f(sdigs[0].reshape(1, b, gb, halves, LB),
            px.reshape(b, L, gb, halves, LB),
            py.reshape(b, L, gb, halves, LB))
    out = np.asarray(out).reshape(3, NS, L, gb * LB)
    fld = SPEC.base
    rinv = pow(fld.r_mod_p, fld.p - 2, fld.p)

    def lane_pt(c, s, lane):
        X = F.limbs_to_int(out[0, s, :, lane]) * rinv % fld.p
        Y = F.limbs_to_int(out[1, s, :, lane]) * rinv % fld.p
        Z = F.limbs_to_int(out[2, s, :, lane]) * rinv % fld.p
        if Z == 0:
            return None
        zi = pow(Z, fld.p - 2, fld.p)
        return (X * zi % fld.p, Y * zi % fld.p)

    acc = None
    for s in range(1, NS):
        for lane in range(w4 * lpw):
            pt = lane_pt(0, s, lane)
            if pt is not None:
                for _ in range(s):
                    acc = C.host_add(SPEC, acc, pt)
    want_dev = ck.commit(scal[0], max_bits=256)
    want = C.pt_to_affine_host(SPEC, tuple(x[None] for x in want_dev))[0]
    assert acc == want, ("signed bucket sums wrong", acc, want)
    print("signed bucket correctness vs XLA MSM: OK", flush=True)


if __name__ == "__main__":
    main()
