"""On-chip check + timing of the MXU-reduction MSM path (round 4).

Validates msm_pallas with the Toeplitz/MXU mont_mul against the XLA MSM
bit-for-bit at the comm_T shape, and times both the MSM and the raw
mont_mul_lm throughput.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from hotproofs_tpu.utils.config import setup_jax
setup_jax()
import jax, jax.numpy as jnp, numpy as np
from hotproofs_tpu.nova.pedersen import CommitmentKey, SMALL_BITS
from hotproofs_tpu.ops import curve as C
from hotproofs_tpu.ops import field as F
from hotproofs_tpu.ops import pallas_field as PF

SPEC = C.PALLAS
rng = np.random.RandomState(11)
REPS = 6

t0 = time.time()
ck = CommitmentKey.create(SPEC, b"blake3-nova", 16384)
print(f"key load: {time.time()-t0:.1f}s", flush=True)


def rand_canon(m, bits):
    raw = rng.randint(0, 256, size=(m, 32), dtype=np.int64).astype(np.int32)
    raw[:, bits // 8:] = 0
    return jnp.asarray(raw)


# raw mont_mul_lm rate (MXU path)
N = 1 << 17
a = jnp.asarray(rng.randint(0, 256, size=(32, N), dtype=np.int64)
                .astype(np.int32))
b_ = jnp.asarray(rng.randint(0, 256, size=(32, N), dtype=np.int64)
                 .astype(np.int32))
t0 = time.time()
out = PF.mont_mul_lm(F.pallas_base, a, b_)
jax.block_until_ready(out)
print(f"mont_mul_lm compile+run: {time.time()-t0:.1f}s", flush=True)
ts = []
for i in range(5):
    aa = jnp.asarray(rng.randint(0, 256, size=(32, N), dtype=np.int64)
                     .astype(np.int32))
    jax.block_until_ready(aa)
    t0 = time.time()
    out = PF.mont_mul_lm(F.pallas_base, aa, b_)
    np.asarray(out[0])
    ts.append(time.time() - t0)
dt = sorted(ts)[len(ts) // 2]
print(f"mont_mul_lm (MXU): {dt*1e3:.2f} ms = {N/dt/1e6:.0f} M mulmods/s",
      flush=True)

for (m, bits, label) in [(16162, 256, "comm_T"), (15922, SMALL_BITS, "comm_W")]:
    px, py = ck.scaled_tm(m, bits)
    jax.block_until_ready((px, py))
    inputs = [rand_canon(m, bits) for _ in range(REPS)]
    jax.block_until_ready(inputs)
    fn = jax.jit(ck.commit_pallas_fn(m, bits))
    t0 = time.time()
    out = fn(inputs[0], px, py); jax.block_until_ready(out)
    print(f"{label} compile+run: {time.time()-t0:.1f}s", flush=True)
    ts = []
    for i in range(REPS):
        t0 = time.time()
        out = fn(inputs[i], px, py)
        np.asarray(out[0])
        ts.append(time.time() - t0)
    dt = sorted(ts)[len(ts) // 2]
    print(f"{label} MXU MSM: {dt*1e3:.1f} ms med = {m/dt/1e6:.2f} M pts/s",
          flush=True)
    # parity vs XLA path
    old = jax.jit(ck.commit_fn(m, max_bits=bits))
    scaled = ck.scaled(m, bits)
    ref = old(inputs[-1], scaled); jax.block_until_ready(ref)
    got = fn(inputs[-1], px, py)
    a1 = C.pt_to_affine_host(SPEC, tuple(x[None] for x in got))[0]
    a2 = C.pt_to_affine_host(SPEC, tuple(x[None] for x in ref))[0]
    print(f"{label} parity vs XLA: {a1 == a2}", flush=True)
