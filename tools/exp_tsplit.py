"""EXPERIMENT (round 5): t-interleaved bucket kernel (4D layout).

exp_bucket2.py showed the bucket kernel is PURE dependent-add-chain latency
(pure chain 57.8 ms vs production 59.3 ms — the 16-slot gather/scatter is
free) and LB=1024 fails Mosaic compile, as do 5D block shapes. So: split
each lane block's t-range into H independent halves, each accumulating into
its OWN bucket set inside the same 512-lane block, with the bucket sets
folded into the SLOT axis (slot index s*H + h — all shapes stay 4D, the
layout Mosaic compiles). Each fori iteration carries H independent mixed
adds — the scheduler overlaps their MXU/VPU chains — and each bucket set
sees B/H sequential steps: ideal speedup H x until throughput-bound.

Measures H = 2, 4 vs the production kernel at the comm_T shape and checks
bucket-sum correctness for H=2.
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
NSLOT = MP.NSLOT


def bucket_tsplit_call(n_jobs, n_lanes, b, bc, H, vmem_mb=None):
    """Grid (jobs, lane_blocks, t_chunks over b/H). Inputs are passed H
    times with t-offset index maps; output slot axis is NSLOT*H with set h
    of digit value s at slot s*H + h (same-weight sets adjacent, so the
    weighted suffix sum just adds H copies per value)."""
    gb = n_lanes // LB
    toff = (b // H) // bc

    def kern(cc_ref, tp_ref, *refs):
        d_refs = refs[:H]
        px_refs = refs[H:2 * H]
        py_refs = refs[2 * H:3 * H]
        out_ref = refs[3 * H]
        cci = cc_ref[:]
        cc = (cci, tp_ref[:])
        t_chunk = pl.program_id(2)
        y_fill = jnp.broadcast_to(cci[:L, 3:4][None], (NSLOT * H, L, LB))

        @pl.when(t_chunk == 0)
        def _():
            out_ref[0] = jnp.zeros((NSLOT * H, L, LB), jnp.int32)
            out_ref[1] = y_fill
            out_ref[2] = jnp.zeros((NSLOT * H, L, LB), jnp.int32)

        def body(tt, _):
            ds, pts, gats = [], [], []
            for h in range(H):
                d = d_refs[h][0, pl.ds(tt, 1), :]
                px = px_refs[h][pl.ds(tt, 1)].reshape(L, LB)
                py = py_refs[h][pl.ds(tt, 1)].reshape(L, LB)
                bx = jnp.zeros((L, LB), jnp.int32)
                by = bx
                bz = bx
                for s in range(NSLOT):
                    mk = d == s
                    bx = jnp.where(mk, out_ref[0, s * H + h], bx)
                    by = jnp.where(mk, out_ref[1, s * H + h], by)
                    bz = jnp.where(mk, out_ref[2, s * H + h], bz)
                ds.append(d)
                pts.append((px, py))
                gats.append((bx, by, bz))
            added = [PC.pt_add_mixed_rows(cc, gats[h], pts[h])
                     for h in range(H)]
            for h in range(H):
                d = ds[h]
                nx, ny, nz = added[h]
                for s in range(NSLOT):
                    mk = d == s
                    out_ref[0, s * H + h] = jnp.where(
                        mk, nx, out_ref[0, s * H + h])
                    out_ref[1, s * H + h] = jnp.where(
                        mk, ny, out_ref[1, s * H + h])
                    out_ref[2, s * H + h] = jnp.where(
                        mk, nz, out_ref[2, s * H + h])
            return 0

        jax.lax.fori_loop(0, d_refs[0].shape[1], body, 0)

    in_specs = [
        pl.BlockSpec((L + 1, 4), lambda j, g, t: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((5 * L, L), lambda j, g, t: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    for h in range(H):
        in_specs.append(pl.BlockSpec(
            (1, bc, LB), (lambda h: lambda j, g, t: (j, t + h * toff, g))(h),
            memory_space=pltpu.VMEM))
    for coord in range(2):
        for h in range(H):
            in_specs.append(pl.BlockSpec(
                (bc, L, LB),
                (lambda h: lambda j, g, t: (t + h * toff, 0, g))(h),
                memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(
            (3, NSLOT * H, L, n_jobs * n_lanes), jnp.int32),
        grid=(n_jobs, gb, (b // H) // bc),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (3, NSLOT * H, L, LB),
            lambda j, g, t: (0, 0, 0, j * gb + g),
            memory_space=pltpu.VMEM),
        compiler_params=(pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb << 20) if vmem_mb else None),
        interpret=PF.interpret(),
    )


def main():
    m, bits = 16162, 256
    ck = CommitmentKey.create(SPEC, b"blake3-nova", 16384)
    px, py = ck.scaled_tm(m, bits)
    b, lpw, w4, n_lanes = MP.plan(m, bits)
    print(f"plan b={b} lpw={lpw} w4={w4} n_lanes={n_lanes}", flush=True)
    cc = PC.curve_consts_dev(SPEC)
    ct = PC.curve_toep_dev(SPEC)
    rng = np.random.RandomState(5)
    scal = []
    for _ in range(5):
        raw = rng.randint(0, 256, size=(m, 32)).astype(np.int32)
        raw[:, -1] = 0
        scal.append(jnp.asarray(raw))
    dj = jax.jit(lambda s: MP.digits_tm(s, m, b, lpw, w4, n_lanes)[None])
    digs = [dj(s) for s in scal]
    jax.block_until_ready(digs)

    for H, bc, vmem_mb in ((2, 8, None), (2, 16, 64), (4, 8, 64),
                           (4, 16, 100)):
        try:
            call = bucket_tsplit_call(1, n_lanes, b, bc, H, vmem_mb)
            f = jax.jit(lambda d, x, y, c=call, n=H: c(
                cc, ct, *([d] * n), *([x] * n), *([y] * n)))
            t0 = time.time()
            out0 = f(digs[0], px, py)
            jax.block_until_ready(out0)
            comp = time.time() - t0
            ts = []
            for d in digs:
                t0 = time.time()
                jax.block_until_ready(f(d, px, py))
                ts.append(time.time() - t0)
            print(f"t-split H={H} bc={bc} vmem={vmem_mb}: "
                  f"{sorted(ts)[2]*1e3:8.2f} ms "
                  f"(compile {comp:.0f}s; baseline 59.3)", flush=True)
        except Exception as e:
            msg = str(e)
            key = msg[msg.find("Ran out of memory"):][:140] \
                if "Ran out" in msg else msg[:140]
            print(f"H={H} bc={bc} vmem={vmem_mb} FAIL: "
                  f"{type(e).__name__} {key}", flush=True)
            continue

        if H == 2 and vmem_mb is None:
            out = np.asarray(out0)       # (3, NSLOT*H, L, n_lanes)
            fld = SPEC.base
            rinv = pow(fld.r_mod_p, fld.p - 2, fld.p)
            acc = None
            for sh in range(NSLOT * H):
                s = sh // H
                if s == 0:
                    continue
                for lane in range(n_lanes):
                    X = F.limbs_to_int(out[0, sh, :, lane]) * rinv % fld.p
                    Y = F.limbs_to_int(out[1, sh, :, lane]) * rinv % fld.p
                    Z = F.limbs_to_int(out[2, sh, :, lane]) * rinv % fld.p
                    if Z == 0:
                        continue
                    zi = pow(Z, fld.p - 2, fld.p)
                    pt = (X * zi % fld.p, Y * zi % fld.p)
                    for _ in range(s):
                        acc = C.host_add(SPEC, acc, pt)
            want_dev = ck.commit(scal[0], max_bits=256)
            want = C.pt_to_affine_host(
                SPEC, tuple(x[None] for x in want_dev))[0]
            assert acc == want, "t-split bucket sums wrong"
            print("t-split H=2 correctness vs XLA MSM: OK", flush=True)


if __name__ == "__main__":
    main()
