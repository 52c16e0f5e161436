"""EXPERIMENT (round 5): decompose the bucket kernel's 29 us/step chain.

The signed-digit 9-slot experiment LOST (77 ms vs 59 ms baseline,
tools/exp_signed_msm.py run recorded in docs/ROADMAP.md), so measure where
the per-step latency actually goes and whether wider lane blocks pay:

  A. production kernel (LB=512, BC=16, 16 slots)        [baseline]
  B. pure add chain, no buckets (isolates gather/scatter cost)
  C. LB=1024 (halves the sequential chain; VMEM permitting)
  D. LB=1024, BC=8 (smaller streamed base blocks)
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
from hotproofs_tpu.ops import msm_pallas as MP
from hotproofs_tpu.ops import pallas_curve as PC
from hotproofs_tpu.ops import pallas_field as PF

SPEC = C.PALLAS
L = MP.L


def pure_chain_call(n_lanes, b, bc, lb):
    """Mixed-add chain with NO bucket gather/scatter: one accumulator per
    lane. Wrong result, right dependency structure."""
    gb = n_lanes // lb

    def kern(cc_ref, tp_ref, px_ref, py_ref, out_ref):
        cci = cc_ref[:]
        cc = (cci, tp_ref[:])
        t_chunk = pl.program_id(1)

        @pl.when(t_chunk == 0)
        def _():
            out_ref[0] = jnp.zeros((L, lb), jnp.int32)
            out_ref[1] = jnp.broadcast_to(cci[:L, 3:4], (L, lb))
            out_ref[2] = jnp.zeros((L, lb), jnp.int32)

        def body(tt, acc):
            px = px_ref[pl.ds(tt, 1)].reshape(L, lb)
            py = py_ref[pl.ds(tt, 1)].reshape(L, lb)
            return PC.pt_add_mixed_rows(cc, acc, (px, py))

        acc = (out_ref[0], out_ref[1], out_ref[2])
        acc = jax.lax.fori_loop(0, bc, body, acc)
        out_ref[0], out_ref[1], out_ref[2] = acc

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((3, L, n_lanes), jnp.int32),
        grid=(n_lanes // lb, b // bc),
        in_specs=[
            pl.BlockSpec((L + 1, 4), lambda g, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5 * L, L), lambda g, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, L, lb), lambda g, t: (t, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, L, lb), lambda g, t: (t, 0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, L, lb), lambda g, t: (0, 0, g),
                               memory_space=pltpu.VMEM),
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
    REPS = 5
    scal = []
    for _ in range(REPS):
        raw = rng.randint(0, 256, size=(m, 32)).astype(np.int32)
        raw[:, -1] = 0
        scal.append(jnp.asarray(raw))
    dj = jax.jit(lambda s: MP.digits_tm(s, m, b, lpw, w4, n_lanes)[None])
    digs = [dj(s) for s in scal]
    jax.block_until_ready(digs)

    def bench(label, make):
        try:
            f = jax.jit(make())
            t0 = time.time()
            jax.block_until_ready(f(digs[0], px, py))
            comp = time.time() - t0
            ts = []
            for d in digs:
                t0 = time.time()
                jax.block_until_ready(f(d, px, py))
                ts.append(time.time() - t0)
            print(f"{label}: {sorted(ts)[2]*1e3:8.2f} ms  "
                  f"(compile {comp:.0f}s)", flush=True)
        except Exception as e:
            print(f"{label}: FAIL {type(e).__name__} {str(e)[:300]}",
                  flush=True)

    # A. production
    bench("A prod LB=512 BC=16",
          lambda: (lambda d, x, y: MP._bucket_call(1, n_lanes, b)(
              cc, ct, d, x, y)))

    # B. pure chain (no buckets) at LB=512
    bench("B pure-chain LB=512",
          lambda: (lambda d, x, y: pure_chain_call(n_lanes, b, MP.BC, 512)(
              cc, ct, x, y)))

    # C/D: LB=1024 variants (monkeypatch the module constant)
    for lb, bcv in ((1024, 16), (1024, 8)):
        MP.LB, MP.BC = lb, bcv
        bench(f"LB={lb} BC={bcv}",
              lambda: (lambda d, x, y: MP._bucket_call(1, n_lanes, b)(
                  cc, ct, d, x, y)))
    MP.LB, MP.BC = 512, 16


if __name__ == "__main__":
    main()
