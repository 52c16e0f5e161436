"""Rigorous mont_mul timing: per-call block, varying inputs, chained deps."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from hotproofs_tpu.utils.config import setup_jax
setup_jax()
import jax, jax.numpy as jnp, numpy as np
from hotproofs_tpu.ops import field as F

spec = F.pallas_base
N = 16384
rng = np.random.RandomState(0)
def rand_limbs(n):
    out = np.zeros((n, 32), np.int32)
    for i in range(n):
        out[i] = F.int_to_limbs(int.from_bytes(rng.bytes(32), "little") % spec.p)
    return out
a = jnp.asarray(rand_limbs(N)); b = jnp.asarray(rand_limbs(N))

mm_j = jax.jit(lambda x, y: F.mont_mul(spec, x, y))
mm_j(a, b).block_until_ready()

# 1. per-call block
t0 = time.time()
for _ in range(20):
    mm_j(a, b).block_until_ready()
print(f"per-call block:      {(time.time()-t0)/20*1e3:8.3f} ms")

# 2. chained (each call consumes previous output -> cannot be elided)
x = a
t0 = time.time()
for _ in range(20):
    x = mm_j(x, b)
x.block_until_ready()
print(f"chained async:       {(time.time()-t0)/20*1e3:8.3f} ms")

# 3. chained long (100 deep inside one jit via scan)
def chain100(x, y):
    def step(c, _):
        return F.mont_mul(spec, c, y), None
    out, _ = jax.lax.scan(step, x, None, length=100)
    return out
ch_j = jax.jit(chain100)
ch_j(a, b).block_until_ready()
t0 = time.time()
out = ch_j(a, b); out.block_until_ready()
print(f"scan-100 per mul:    {(time.time()-t0)/100*1e3:8.3f} ms")

# 4. wide batch: N=262144 single call
Nw = 262144
aw = jnp.asarray(np.tile(np.asarray(a), (16, 1))); bw = jnp.asarray(np.tile(np.asarray(b), (16, 1)))
mmw = jax.jit(lambda x, y: F.mont_mul(spec, x, y))
mmw(aw, bw).block_until_ready()
t0 = time.time()
for _ in range(5):
    mmw(aw, bw).block_until_ready()
dt = (time.time()-t0)/5
print(f"wide {Nw}: {dt*1e3:8.3f} ms = {Nw/dt/1e6:.1f} M mulmods/s")
