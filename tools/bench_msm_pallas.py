"""TPU benchmark: pallas MSM vs XLA MSM at the real commitment shapes.

Each rep uses DISTINCT scalars (pre-materialized on device) and blocks per
rep: repeated identical dispatches through the remote relay can return in
~0 ms (result reuse), which makes same-input timing loops meaningless.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from hotproofs_tpu.utils.config import setup_jax
setup_jax()
import jax, jax.numpy as jnp, numpy as np
from hotproofs_tpu.nova.pedersen import CommitmentKey
from hotproofs_tpu.ops import curve as C
from hotproofs_tpu.ops import field as F
from hotproofs_tpu.ops import msm as M
from hotproofs_tpu.ops import msm_pallas as MP

SPEC = C.PALLAS
rng = np.random.RandomState(0)
REPS = 8

n_key = 16384
t0 = time.time()
ck = CommitmentKey.create(SPEC, b"blake3-nova", n_key)
print(f"key load: {time.time()-t0:.1f}s")


def rand_canon(m, bits):
    canon = np.zeros((m, 32), np.int32)
    for i in range(m):
        canon[i] = F.int_to_limbs(
            int.from_bytes(rng.bytes(bits // 8), "little"))
    return jnp.asarray(canon)


for (m, bits, label) in [(16162, 256, "comm_T (full width)"),
                         (15922, 40, "comm_W (small scalars)")]:
    inputs = [rand_canon(m, bits) for _ in range(REPS)]
    jax.block_until_ready(inputs)

    t0 = time.time()
    px, py = ck.scaled_tm(m, bits)
    jax.block_until_ready((px, py))
    print(f"{label}: scaled_tm prep {time.time()-t0:.1f}s")

    fn = jax.jit(ck.commit_pallas_fn(m, bits))
    t0 = time.time()
    out = fn(inputs[0], px, py); jax.block_until_ready(out)
    print(f"  compile+run: {time.time()-t0:.1f}s")
    ts = []
    for i in range(REPS):
        t0 = time.time()
        out = fn(inputs[i], px, py)
        np.asarray(out[0])          # forced host readback: block_until_ready
        ts.append(time.time() - t0)  # returns early through the relay
    dt = sorted(ts)[len(ts) // 2]
    print(f"  pallas MSM: {dt*1e3:8.1f} ms med ({min(ts)*1e3:.1f} min) "
          f"= {m/dt/1e6:.2f} M points/s")

    # correctness vs XLA path on chip
    old = jax.jit(ck.commit_fn(m, max_bits=bits))
    scaled = ck.scaled(m, bits)
    t0 = time.time()
    ref = old(inputs[0], scaled); jax.block_until_ready(ref)
    print(f"  xla compile+run: {time.time()-t0:.1f}s")
    ts = []
    for i in range(min(3, REPS)):
        t0 = time.time()
        ref2 = old(inputs[i], scaled)
        np.asarray(ref2[0])
        ts.append(time.time() - t0)
    print(f"  xla MSM: {sorted(ts)[len(ts)//2]*1e3:8.1f} ms med")
    a1 = C.pt_to_affine_host(SPEC, tuple(x[None] for x in out))[0]
    fin = jax.jit(ck.commit_pallas_fn(m, bits))(inputs[-1], px, py)
    a1 = C.pt_to_affine_host(SPEC, tuple(x[None] for x in fin))[0]
    rf = old(inputs[-1], scaled)
    a2 = C.pt_to_affine_host(SPEC, tuple(x[None] for x in rf))[0]
    print(f"  match: {a1 == a2}")
