"""Verify scan-timing sanity and measure pt_add-in-scan at MSM widths."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from hotproofs_tpu.utils.config import setup_jax
setup_jax()
import jax, jax.numpy as jnp, numpy as np
from hotproofs_tpu.ops import field as F
from hotproofs_tpu.ops import curve as C

spec = F.pallas_base
curve = C.PALLAS

# 1. correctness of scan-chained mont_mul
rng = np.random.RandomState(0)
a_i = int.from_bytes(rng.bytes(32), "little") % spec.p
b_i = int.from_bytes(rng.bytes(32), "little") % spec.p
a = jnp.asarray(F.int_to_limbs(a_i))[None, :]
b = jnp.asarray(F.int_to_limbs(b_i))[None, :]
def chain(x, y, n):
    def step(c, _):
        return F.mont_mul(spec, c, y), None
    out, _ = jax.lax.scan(step, x, None, length=n)
    return out
ch_j = jax.jit(lambda x, y: chain(x, y, 100))
got = F.limbs_to_int(np.asarray(ch_j(a, b))[0])
rinv = pow(1 << 256, spec.p - 2, spec.p)
want = a_i
for _ in range(100):
    want = want * b_i % spec.p * rinv % spec.p
print("scan-100 correct:", got == want)

# 2. pt_add scan at MSM widths
def ptadd_chain(p, q, n):
    def step(c, _):
        return C.pt_add(curve, c, q), None
    out, _ = jax.lax.scan(step, p, None, length=n)
    return out

for width in (2048, 8192, 31232):
    gx, gy = curve.gen
    P = C.pt_from_affine(curve, gx, gy)
    Pw = tuple(jnp.broadcast_to(x, (width, F.N_LIMBS)) for x in P)
    Qw = tuple(jnp.array(x) for x in Pw)
    f = jax.jit(lambda p, q: ptadd_chain(p, q, 32))
    out = f(Pw, Qw); jax.block_until_ready(out)
    t0 = time.time()
    out = f(Pw, Qw); jax.block_until_ready(out)
    dt = time.time() - t0
    print(f"pt_add scan32 width {width:6d}: {dt*1e3:8.1f} ms "
          f"({dt/32*1e3:6.2f} ms/iter, "
          f"{width*32/dt/1e6:7.2f} M ptadd/s)")

# verify a pt_add scan numerically: P + 32*Q where P=Q=G -> 33*G
aff = C.pt_to_affine_host(curve, tuple(x[:1] for x in out))[0]
want33 = C.host_scalar_mul(curve, 33, (gx, gy))
print("pt_add scan correct:", aff == want33)
