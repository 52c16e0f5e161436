"""Per-dispatch breakdown of the lockstep fold loop on the real chip.

Times each device program of IVC.prove_lockstep separately: the K-wide
fused fold+cross-term, the J=K batched comm_T MSM, the J=K*chunk batched
split W commit (and its small-only part), and the host affine syncs.
Doubles as the persistent-compile-cache probe: if the relay/XLA cache works
across processes, these programs (just compiled by bench.py) load fast.
"""
import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from hotproofs_tpu.utils.config import setup_jax
setup_jax()
import jax, jax.numpy as jnp, numpy as np

from hotproofs_tpu.models.chunk_prover import ChunkProver
from hotproofs_tpu.nova import fold as NF
from hotproofs_tpu.ops import curve as C, field as F

K, CHUNK = 8, 16
R = {}


def timeit(label, fn, inputs):
    t0 = time.time()
    out = fn(*inputs[0]); jax.block_until_ready(out)
    print(f"{label}: compile+run {time.time()-t0:.1f}s", flush=True)
    ts = []
    for args in inputs:
        t0 = time.time()
        out = fn(*args); jax.block_until_ready(out)
        ts.append(time.time() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"{label}: {med*1e3:9.2f} ms med", flush=True)
    R[label] = round(med, 5)
    return med


def main():
    t0 = time.time()
    prover = ChunkProver()
    ivc = prover.ivc
    shape, spec = ivc.shape, ivc.shape.field
    print(f"stack build: {time.time()-t0:.1f}s", flush=True)
    rng = np.random.RandomState(3)

    def rnd(shp, bits=256):
        a = rng.randint(0, 256, size=shp + (32,), dtype=np.int64).astype(np.int32)
        a[..., bits // 8:] = 0
        return jnp.asarray(a)

    # --- fused lockstep program (fold + cross term, K-wide) ---
    def _fused(acc, pW2, paz, pbz, pcz, pT, r_prev, az, bz, cz, u):
        acc = NF.fold_witness(spec, acc, pW2, paz, pbz, pcz, pT, r_prev)
        T = NF.cross_term(spec, acc, az, bz, cz, u)
        return acc, T, F.from_mont(spec, T)

    fused_v = jax.jit(jax.vmap(_fused, in_axes=(0,) * 11))
    acc = NF.AccumulatorDevice(
        W=rnd((K, shape.n_wit)), E=rnd((K, shape.n_cons)),
        az=rnd((K, shape.n_cons)), bz=rnd((K, shape.n_cons)),
        cz=rnd((K, shape.n_cons)))
    args = (acc, rnd((K, shape.n_wit)), rnd((K, shape.n_cons)),
            rnd((K, shape.n_cons)), rnd((K, shape.n_cons)),
            rnd((K, shape.n_cons)), rnd((K,)),
            rnd((K, shape.n_cons)), rnd((K, shape.n_cons)),
            rnd((K, shape.n_cons)), rnd((K,)))
    timeit("fused_lockstep_K8", fused_v, [args, args, args])

    # --- batched comm_T (J=8) ---
    ins = [rnd((K, shape.n_cons)) for _ in range(4)]
    timeit("commT_many_J8", lambda s: ivc.ck.commit_many_pallas(s, 256),
           [(s,) for s in ins])

    # --- batched split W commit (J=128) ---
    insw = [rnd((K * CHUNK, shape.n_wit), bits=40) for _ in range(3)]
    timeit("commW_many_split_J128",
           lambda s: ivc.ck.commit_many_split_pallas(s, ivc.big_wit_idx),
           [(s,) for s in insw])
    # small-only part for comparison
    timeit("commW_many_small_J128",
           lambda s: ivc.ck.commit_many_pallas(s, 40),
           [(s,) for s in insw])
    # J=16 variant (single-chain chunk)
    insw16 = [rnd((CHUNK, shape.n_wit), bits=40) for _ in range(3)]
    timeit("commW_many_split_J16",
           lambda s: ivc.ck.commit_many_split_pallas(s, ivc.big_wit_idx),
           [(s,) for s in insw16])

    # --- J=1 comm_T (single-chain path) ---
    ins1 = [rnd((shape.n_cons,)) for _ in range(4)]
    timeit("commT_J1", lambda s: ivc.ck.commit_pallas(s, 256),
           [(s,) for s in ins1])

    # --- affine sync cost ---
    pt = ivc.ck.commit_many_pallas(ins[0], 256)
    jax.block_until_ready(pt)
    t0 = time.time()
    for _ in range(3):
        C.pt_to_affine_host(ivc.curve, pt)
    R["affine_sync_K8"] = round((time.time() - t0) / 3, 5)
    print(f"affine_sync_K8: {R['affine_sync_K8']*1e3:.2f} ms", flush=True)

    print("nwit", shape.n_wit, "ncons", shape.n_cons,
          "nbig", len(ivc.big_wit_idx) if ivc.big_wit_idx is not None else 0)
    print(json.dumps(R))


if __name__ == "__main__":
    main()
