"""Break down where the ~2.4 s/fold in BENCH_r02 actually goes.

Times, on the real chip, each component of one batched-pipeline fold:
  dispatch    — a trivial jitted add round trip (tunnel/launch latency floor)
  fused       — the fused fold+cross-term+comm_T program (device only)
  affine      — pt_to_affine_host of one point (3 from_mont launches + pows)
  poseidon    — one fold's worth of host transcript absorbs + challenge
  inst_fold   — host fold_instance (2 × 256-bit scalar mults, Python ints)
  batched/16  — per-fold share of the chunk phases (to_mont+matvec+commitW)
"""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hotproofs_tpu.utils.config import setup_jax
setup_jax()

import jax
import jax.numpy as jnp
import numpy as np

print(f"devices: {jax.devices()}", file=sys.stderr)

from hotproofs_tpu.core import blake3_ref as b3
from hotproofs_tpu.models.chunk_prover import ChunkProver
from hotproofs_tpu.nova import fold as NF
from hotproofs_tpu.nova.r1cs import matvec_all
from hotproofs_tpu.ops import curve as C
from hotproofs_tpu.ops import field as F


def timeit(name, fn, reps=3, warmup=1):
    for _ in range(warmup):
        fn()
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    if hasattr(out, "block_until_ready"):
        out.block_until_ready()
    elif isinstance(out, tuple) and hasattr(out[0], "block_until_ready"):
        jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{name:28s} {dt*1e3:10.1f} ms")
    return dt


prover = ChunkProver()
ivc = prover.ivc
shape = ivc.shape
spec = shape.field
curve = ivc.curve
print(f"n_cons={shape.n_cons} n_vars={shape.n_vars} n_wit={shape.n_wit}")

data = bytes(1024)
proof_data = prover._hash_with_path(data, 0)
zs, sched, canon, X_host = prover._device_witness_chain(proof_data)
n_steps = canon.shape[0]
print(f"chain: {n_steps} steps")

# --- dispatch floor ---------------------------------------------------------
x = jnp.zeros((8, 8), jnp.int32)
triv = jax.jit(lambda a: a + 1)
triv(x).block_until_ready()
timeit("dispatch (trivial jit)", lambda: triv(x).block_until_ready(), reps=10)

# --- batched phases ---------------------------------------------------------
to_mont_j = F.jitted("to_mont", spec)
from_mont_j = F.jitted("from_mont", spec)
matvec_b = jax.jit(jax.vmap(lambda z: matvec_all(shape, z)))
n_io = shape.n_io

sl = canon[:16]
z_mont = to_mont_j(sl)
z_mont.block_until_ready()
timeit("to_mont (16 z)", lambda: to_mont_j(sl))
az_b, bz_b, cz_b = matvec_b(z_mont)
jax.block_until_ready((az_b, bz_b, cz_b))
timeit("matvec_b (16 z)", lambda: matvec_b(z_mont))

one_commit = ivc.ck.commit_fn(shape.n_wit, max_bits=256)
from hotproofs_tpu.nova.pedersen import SMALL_BITS
one_commit_s = ivc.ck.commit_split_fn(shape.n_wit, ivc.big_wit_idx)
scaled_W = ivc.ck.scaled(shape.n_wit, SMALL_BITS)
commit_b = jax.jit(jax.vmap(one_commit_s, in_axes=(0, None)))
cw = commit_b(sl[:, 1 + n_io:, :], scaled_W)
jax.block_until_ready(cw)
timeit("commitW_b (16 W)", lambda: commit_b(sl[:, 1 + n_io:, :], scaled_W))

# --- fused fold program -----------------------------------------------------
commitT_fn = ivc.ck.commit_fn(shape.n_cons, max_bits=256)
scaled_T = ivc.ck.scaled(shape.n_cons, 256)

def _fused(acc, pW2, paz, pbz, pcz, pT, r_prev, az, bz, cz, u, scaledT):
    acc = NF.fold_witness(spec, acc, pW2, paz, pbz, pcz, pT, r_prev)
    T = NF.cross_term(spec, acc, az, bz, cz, u)
    comm_T = commitT_fn(F.from_mont(spec, T), scaledT)
    return acc, T, comm_T

fused_j = jax.jit(_fused)
acc_dev, acc_inst = NF.empty_accumulator(shape)
zeros_wit = jnp.zeros((shape.n_wit, F.N_LIMBS), jnp.int32)
zeros_cons = jnp.zeros((shape.n_cons, F.N_LIMBS), jnp.int32)
zeros_r = jnp.zeros((F.N_LIMBS,), jnp.int32)
u_mont = jnp.asarray(F.int_to_limbs(0))

args = (acc_dev, zeros_wit, zeros_cons, zeros_cons, zeros_cons, zeros_cons,
        zeros_r, az_b[0], bz_b[0], cz_b[0], u_mont, scaled_T)
t0 = time.time()
out = fused_j(*args)
jax.block_until_ready(out)
print(f"fused compile+run: {time.time()-t0:.1f}s")
timeit("fused fold+commT (device)", lambda: jax.block_until_ready(fused_j(*args)))

# comm_T MSM alone
msm_j = jax.jit(lambda t, s: commitT_fn(t, s))
t_canon = from_mont_j(az_b[0])
out = msm_j(t_canon, scaled_T)
jax.block_until_ready(out)
timeit("commT MSM alone (device)", lambda: jax.block_until_ready(msm_j(t_canon, scaled_T)))

# fold_witness + cross_term alone
fw_j = jax.jit(lambda acc, az, bz, cz, u: NF.cross_term(spec, acc, az, bz, cz, u))
out = fw_j(acc_dev, az_b[0], bz_b[0], cz_b[0], u_mont)
out.block_until_ready()
timeit("cross_term alone", lambda: fw_j(acc_dev, az_b[0], bz_b[0], cz_b[0], u_mont).block_until_ready())

# --- affine conversion ------------------------------------------------------
comm_dev = out_pt = msm_j(t_canon, scaled_T)
jax.block_until_ready(comm_dev)
timeit("pt_to_affine_host (1 pt)",
       lambda: C.pt_to_affine_host(curve, tuple(x[None] for x in comm_dev)),
       reps=5)

# --- host transcript + instance fold ----------------------------------------
comm_aff = C.pt_to_affine_host(curve, tuple(x[None] for x in comm_dev))[0]
tr = ivc._new_transcript(sched.z0)
X_i = X_host[0]

def _transcript_once():
    ivc._fold_challenge_prefix(tr, acc_inst, X_i, comm_aff)
    tr.absorb_point(comm_aff)
    return tr.challenge()

timeit("poseidon transcript/fold", _transcript_once, reps=5)
r = _transcript_once()
timeit("host fold_instance",
       lambda: NF.fold_instance(spec, curve, acc_inst, X_i, comm_aff,
                                comm_aff, r), reps=5)
