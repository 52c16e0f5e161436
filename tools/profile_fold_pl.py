"""Per-fold cost breakdown of the PALLAS fold path (round 3).

Times each component of one fold at the real blake3_nova shape on the chip:
  dispatch    — trivial jit round trip (tunnel/launch latency floor)
  commT_msm   — the standalone pallas comm_T MSM (n_cons pts, 64 windows)
  commW_msm   — the split W commit (n_wit pts, 10 windows + 3 full-width)
  fused_pl    — the fused fold+cross-term program (elementwise XLA)
  affine      — pt_to_affine_host of one point (blocking readback)
  host_fold   — fold_instance (host EC scalar mults) + transcript prefix
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hotproofs_tpu.utils.config import setup_jax
setup_jax()

import jax
import jax.numpy as jnp
import numpy as np

print(f"devices: {jax.devices()}", file=sys.stderr)

from hotproofs_tpu.models.chunk_prover import ChunkProver
from hotproofs_tpu.nova import fold as NF
from hotproofs_tpu.ops import curve as C
from hotproofs_tpu.ops import field as F


def timeit(name, fn, reps=5):
    fn()  # warm
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    dt = sorted(ts)[len(ts) // 2]
    print(f"{name:28s} {dt * 1e3:10.2f} ms")
    return dt


prover = ChunkProver()
ivc = prover.ivc
shape, spec, curve = ivc.shape, ivc.shape.field, ivc.curve
print(f"n_cons={shape.n_cons} n_vars={shape.n_vars}")

rng = np.random.RandomState(11)


def rand_canon(n):
    a = rng.randint(0, 256, size=(n, 32)).astype(np.int32)
    a[:, -1] = 0
    return jnp.asarray(a)


x = jnp.zeros((8, 8), jnp.int32)
triv = jax.jit(lambda a: a + 1)
triv(x).block_until_ready()
timeit("dispatch (trivial jit)", lambda: triv(x).block_until_ready(), reps=10)

t_c = rand_canon(shape.n_cons)
timeit("commT_msm (pallas, 64w)",
       lambda: jax.block_until_ready(ivc.ck.commit_pallas(t_c, 256)))

w_c = rand_canon(shape.n_wit)
w_np = np.asarray(w_c)
w_np[:, 5:] = 0
w_c = jnp.asarray(w_np)
timeit("commW_msm (split, 10w)",
       lambda: jax.block_until_ready(
           ivc.ck.commit_split_pallas(w_c, ivc.big_wit_idx)))

# fused fold program (no MSM inside on the pallas path)
fused_key = [k for k in ivc._jit_cache] if hasattr(ivc, "_jit_cache") else []
acc_dev, _ = NF.empty_accumulator(shape)
zeros_wit = jnp.zeros((shape.n_wit, F.N_LIMBS), jnp.int32)
zeros_cons = jnp.zeros((shape.n_cons, F.N_LIMBS), jnp.int32)
zeros_r = jnp.zeros((F.N_LIMBS,), jnp.int32)
u_mont = jnp.asarray(F.int_to_limbs(0))


def _fused(acc, pW2, paz, pbz, pcz, pT, r_prev, az, bz, cz, u):
    acc = NF.fold_witness(spec, acc, pW2, paz, pbz, pcz, pT, r_prev)
    T = NF.cross_term(spec, acc, az, bz, cz, u)
    return acc, T, F.from_mont(spec, T)


fused_j = jax.jit(_fused)
az = jnp.zeros((shape.n_cons, F.N_LIMBS), jnp.int32)
args = (acc_dev, zeros_wit, zeros_cons, zeros_cons, zeros_cons, zeros_cons,
        zeros_r, az, az, az, u_mont)
t0 = time.time()
jax.block_until_ready(fused_j(*args))
print(f"fused compile+run: {time.time() - t0:.1f}s", file=sys.stderr)
timeit("fused fold+crossT (device)",
       lambda: jax.block_until_ready(fused_j(*args)))

pt = ivc.ck.commit_pallas(t_c, 256)
timeit("pt_to_affine_host (1 pt)",
       lambda: C.pt_to_affine_host(curve, tuple(v[None] for v in pt)))

# host-side instance fold + transcript prefix
from hotproofs_tpu.nova.transcript import Transcript

aff = C.pt_to_affine_host(curve, tuple(v[None] for v in pt))[0]
from hotproofs_tpu.nova.fold import AccumulatorInstance
acc_inst = AccumulatorInstance(u=0, X=[0] * shape.n_io)
X = [1] * (2 * 15)


def host_fold():
    tr = Transcript(spec.name, b"prof", ivc.pp_digest)
    ivc._fold_challenge_prefix(tr, acc_inst, X, aff)
    tr.absorb_point(aff)
    return tr.challenge()


timeit("host transcript+challenge", host_fold)
timeit("host fold_instance",
       lambda: NF.fold_instance(spec, curve, acc_inst, X, aff, aff, 12345))
