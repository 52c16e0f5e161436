"""Per-phase Pallas-MSM breakdown on the real chip (VERDICT r03 item #2).

Times, at the comm_T shape (m=16162, 256-bit) and comm_W shape
(m=15922, 40-bit):
  * digits packing alone
  * bucket kernel alone
  * merge kernel alone
  * wsum kernel alone
  * full msm_pallas dispatch chain
  * a scatter-free bucket variant (pure mixed-add arithmetic ceiling)
plus the host-side per-fold costs (transcript absorb sequence, instance
fold EC math) that VERDICT r03 flags as unexplained lockstep overhead.

Each rep uses distinct inputs (the compile relay reuses results for
identical dispatches).
"""
import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from hotproofs_tpu.utils.config import setup_jax
setup_jax()
import jax, jax.numpy as jnp, numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hotproofs_tpu.nova.pedersen import CommitmentKey, SMALL_BITS
from hotproofs_tpu.ops import curve as C
from hotproofs_tpu.ops import field as F
from hotproofs_tpu.ops import msm as M
from hotproofs_tpu.ops import msm_pallas as MP
from hotproofs_tpu.ops import pallas_curve as PC
from hotproofs_tpu.ops import pallas_field as PF

SPEC = C.PALLAS
rng = np.random.RandomState(7)
REPS = 6
RESULTS = {}


def timeit(label, fn, inputs, warm=True):
    if warm:
        t0 = time.time()
        out = fn(*inputs[0])
        jax.block_until_ready(out)
        print(f"  {label}: compile+run {time.time()-t0:.1f}s", flush=True)
    ts = []
    for args in inputs:
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"  {label}: {med*1e3:9.2f} ms med  (min {min(ts)*1e3:.2f})",
          flush=True)
    RESULTS[label] = med
    return med


def rand_canon(m, bits):
    raw = rng.randint(0, 256, size=(m, 32), dtype=np.int64).astype(np.int32)
    nb = bits // 8
    raw[:, nb:] = 0
    return jnp.asarray(raw)


def main():
    m, bits = 16162, 256
    t0 = time.time()
    ck = CommitmentKey.create(SPEC, b"blake3-nova", 16384)
    px, py = ck.scaled_tm(m, bits)
    jax.block_until_ready((px, py))
    print(f"key+scaled_tm prep: {time.time()-t0:.1f}s", flush=True)

    b, lpw, w4, n_lanes = MP.plan(m, bits)
    print(f"comm_T plan: b={b} lpw={lpw} w4={w4} n_lanes={n_lanes}")
    cc = PC.curve_consts_dev(SPEC)

    scal = [rand_canon(m, bits) for _ in range(REPS)]
    digs = [jax.jit(lambda s: MP.digits_tm(s, m, b, lpw, w4, n_lanes))(s)
            for s in scal]
    jax.block_until_ready(digs)

    # 1. full msm
    full = jax.jit(ck.commit_pallas_fn(m, bits))
    timeit("full_msm_T", full, [(s, px, py) for s in scal])

    # 2. digits only
    dj = jax.jit(lambda s: MP.digits_tm(s, m, b, lpw, w4, n_lanes))
    timeit("digits_T", dj, [(s,) for s in scal])

    # 3. bucket kernel only
    bj = jax.jit(lambda d, x, y: MP._bucket_call(n_lanes, b)(cc, d, x, y))
    buckets = [bj(d, px, py) for d in digs[:1]]
    timeit("bucket_T", bj, [(d, px, py) for d in digs])

    # 4. merge only
    jax.block_until_ready(buckets)
    bks = [jax.jit(lambda d, x, y: MP._bucket_call(n_lanes, b)(cc, d, x, y))(d, px, py)
           for d in digs]
    jax.block_until_ready(bks)
    mj = jax.jit(lambda bk: MP._merge_call(n_lanes)(cc, bk))
    timeit("merge_T", mj, [(bk,) for bk in bks])

    # 5. wsum only
    reds = [mj(bk) for bk in bks]
    jax.block_until_ready(reds)
    wj = jax.jit(lambda r: MP._wsum_call()(cc, MP._identity_tiles(SPEC), r))
    timeit("wsum_T", wj, [(r,) for r in reds])

    # 6. scatter-free bucket variant: same shapes/grid, adds every streamed
    # point into slot (t mod NSLOT) unconditionally — pure arithmetic.
    def _pure_kernel(cc_ref, d_ref, px_ref, py_ref, out_ref):
        ccv = cc_ref[:]
        t_chunk = pl.program_id(1)
        y_fill = jnp.broadcast_to(ccv[:PF.L, 3:4][None],
                                  (MP.NSLOT, PF.L, MP.LB))

        @pl.when(t_chunk == 0)
        def _():
            out_ref[0] = jnp.zeros((MP.NSLOT, PF.L, MP.LB), jnp.int32)
            out_ref[1] = y_fill
            out_ref[2] = jnp.zeros((MP.NSLOT, PF.L, MP.LB), jnp.int32)

        def body(tt, _):
            px_ = px_ref[pl.ds(tt, 1)].reshape(PF.L, MP.LB)
            py_ = py_ref[pl.ds(tt, 1)].reshape(PF.L, MP.LB)
            bx = out_ref[0, 0]
            by = out_ref[1, 0]
            bz = out_ref[2, 0]
            nx, ny, nz = PC.pt_add_mixed_rows(ccv, (bx, by, bz), (px_, py_))
            out_ref[0, 0] = nx
            out_ref[1, 0] = ny
            out_ref[2, 0] = nz
            return 0

        jax.lax.fori_loop(0, d_ref.shape[0], body, 0)

    bc = min(MP.BC, b)
    pure_call = pl.pallas_call(
        _pure_kernel,
        out_shape=jax.ShapeDtypeStruct((3, MP.NSLOT, PF.L, n_lanes),
                                       jnp.int32),
        grid=(n_lanes // MP.LB, b // bc),
        in_specs=[
            pl.BlockSpec((PF.L + 1, 4), lambda g, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, MP.LB), lambda g, t: (t, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, PF.L, MP.LB), lambda g, t: (t, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, PF.L, MP.LB), lambda g, t: (t, 0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, MP.NSLOT, PF.L, MP.LB),
                               lambda g, t: (0, 0, 0, g),
                               memory_space=pltpu.VMEM),
        interpret=PF.interpret(),
    )
    pj = jax.jit(lambda d, x, y: pure_call(cc, d, x, y))
    timeit("bucket_T_noscatter", pj, [(d, px, py) for d in digs])

    # 7. comm_W shape
    mw, bw = 15922, SMALL_BITS
    pxw, pyw = ck.scaled_tm(mw, bw)
    jax.block_until_ready((pxw, pyw))
    bW, lpwW, w4W, n_lanesW = MP.plan(mw, bw)
    print(f"comm_W plan: b={bW} lpw={lpwW} w4={w4W} n_lanes={n_lanesW}")
    scw = [rand_canon(mw, bw) for _ in range(REPS)]
    fullw = jax.jit(ck.commit_pallas_fn(mw, bw))
    timeit("full_msm_W", fullw, [(s, pxw, pyw) for s in scw])

    # 8. host-side per-fold costs
    from hotproofs_tpu.nova.transcript import Transcript
    from hotproofs_tpu.nova import fold as NF
    tr = Transcript(SPEC.scalar.name, b"profile", 12345)
    x, y = SPEC.gen
    pt = (x, y)
    X = [int(rng.randint(1 << 30)) for _ in range(30)]
    t0 = time.time()
    NREP = 20
    for _ in range(NREP):
        tr.absorb_scalar(7)
        for v in X:
            tr.absorb_scalar(v)
        tr.absorb_point(pt)
        tr.absorb_point(pt)
        for v in X:
            tr.absorb_scalar(v)
        tr.absorb_point(pt)
        tr.absorb_point(pt)
        r = tr.challenge()
    dt = (time.time() - t0) / NREP
    print(f"  host transcript per fold: {dt*1e3:9.2f} ms")
    RESULTS["host_transcript_fold"] = dt

    acc = NF.AccumulatorInstance(u=0, X=[0] * 30)
    spec = SPEC.scalar
    t0 = time.time()
    for i in range(NREP):
        acc = NF.fold_instance(spec, SPEC, acc, X, pt, pt,
                               (r + i) % spec.p)
    dt = (time.time() - t0) / NREP
    print(f"  host fold_instance:       {dt*1e3:9.2f} ms")
    RESULTS["host_fold_instance"] = dt

    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
