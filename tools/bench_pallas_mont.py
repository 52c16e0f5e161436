"""Benchmark + verify the pallas mont_mul against the XLA path on chip."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from hotproofs_tpu.utils.config import setup_jax
setup_jax()
import jax, jax.numpy as jnp, numpy as np
from hotproofs_tpu.ops import field as F
from hotproofs_tpu.ops import pallas_field as PF

spec = F.pallas_base
rng = np.random.RandomState(0)

def rand_limbs(n):
    out = np.zeros((n, 32), np.int32)
    for i in range(n):
        out[i] = F.int_to_limbs(int.from_bytes(rng.bytes(32), "little") % spec.p)
    return out

for N in (16384, 131072):
    a = jnp.asarray(rand_limbs(N)); b = jnp.asarray(rand_limbs(N))
    at = jnp.asarray(np.asarray(a).T.copy()); bt = jnp.asarray(np.asarray(b).T.copy())

    # correctness vs XLA path
    ref = jax.jit(lambda x, y: F.mont_mul(spec, x, y))(a, b)
    got = PF.mont_mul_lm(spec, at, bt)
    ok = bool(jnp.all(got.T == ref))
    print(f"N={N} exact match:", ok)
    assert ok

    # pallas limb-major timing
    t0 = time.time(); reps = 20
    for _ in range(reps):
        out = PF.mont_mul_lm(spec, at, bt)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"  pallas mont_mul_lm: {dt*1e3:8.3f} ms = {N/dt/1e6:7.1f} M mulmods/s")

    # XLA baseline
    mm = jax.jit(lambda x, y: F.mont_mul(spec, x, y))
    mm(a, b).block_until_ready()
    t0 = time.time()
    for _ in range(reps):
        out = mm(a, b)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"  xla mont_mul:       {dt*1e3:8.3f} ms = {N/dt/1e6:7.1f} M mulmods/s")

    # with boundary transposes (element-major drop-in)
    em = jax.jit(lambda x, y: PF.mont_mul_em(spec, x, y))
    em(a, b).block_until_ready()
    t0 = time.time()
    for _ in range(reps):
        out = em(a, b)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"  pallas em (w/ T):   {dt*1e3:8.3f} ms = {N/dt/1e6:7.1f} M mulmods/s")
