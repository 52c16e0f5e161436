"""Microbenchmark mont_mul digit-convolution variants on the real chip.

Hypothesis (round-3): the int32 (N,1024)@(1024,63) one-hot dot inside
mont_mul is NOT lowered to the MXU on TPU, making every field mul ~100x
slower than speed-of-light. Candidate fix: split the outer-product columns
into hi/lo 8-bit halves — each exactly representable in bf16 — and run TWO
bf16 MXU matmuls with f32 accumulation (exact: column sums < 2^24).
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from hotproofs_tpu.utils.config import setup_jax
setup_jax()

import jax
import jax.numpy as jnp
import numpy as np
from hotproofs_tpu.ops import field as F

spec = F.pallas_base
N = 16384
rng = np.random.RandomState(0)
a_int = [rng.randint(0, 2**62) * rng.randint(0, 2**62) % spec.p for _ in range(8)]
a = jnp.asarray(np.stack([F.int_to_limbs(rng.randint(0, 256, 32).astype(object) @ (256**np.arange(32, dtype=object)) % spec.p) for _ in range(N)]))
b = jnp.asarray(np.stack([F.int_to_limbs(int(v)) for v in
                          rng.randint(0, 2**60, N).astype(object)]))
# random full-width canonical elements
av = np.array([rng.randint(0, 2**32, dtype=np.uint64) for _ in range(N)])
def rand_limbs(n):
    out = np.zeros((n, 32), np.int32)
    for i in range(n):
        v = int.from_bytes(rng.bytes(32), "little") % spec.p
        out[i] = F.int_to_limbs(v)
    return out
a = jnp.asarray(rand_limbs(N))
b = jnp.asarray(rand_limbs(N))

M_FULL = F._M_FULL  # (1024, 63)

def conv_int32(x, y):
    outer = (x[..., :, None] * y[..., None, :]).reshape(x.shape[:-1] + (1024,))
    return jax.lax.dot_general(outer, jnp.asarray(M_FULL),
                               (((outer.ndim - 1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)

M_BF = jnp.asarray(M_FULL.astype(np.float32), dtype=jnp.bfloat16)

def conv_bf16(x, y):
    outer = (x[..., :, None] * y[..., None, :]).reshape(x.shape[:-1] + (1024,))
    hi = (outer >> 8).astype(jnp.bfloat16)
    lo = (outer & 0xFF).astype(jnp.bfloat16)
    dot = lambda m: jax.lax.dot_general(
        m, M_BF, (((m.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return (dot(hi).astype(jnp.int32) << 8) + dot(lo).astype(jnp.int32)

def mont_mul_v2(x, y):
    """mont_mul with the bf16 conv."""
    p_limbs = jnp.asarray(spec.p_limbs)
    M_TRUNC_BF = M_BF[:, :32]
    def conv(u, v, mat):
        sh = jnp.broadcast_shapes(u.shape, v.shape)
        u = jnp.broadcast_to(u, sh); v = jnp.broadcast_to(v, sh)
        outer = (u[..., :, None] * v[..., None, :]).reshape(sh[:-1] + (1024,))
        hi = (outer >> 8).astype(jnp.bfloat16)
        lo = (outer & 0xFF).astype(jnp.bfloat16)
        dot = lambda m: jax.lax.dot_general(
            m, mat, (((m.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return (dot(hi).astype(jnp.int32) << 8) + dot(lo).astype(jnp.int32)
    t = F._carry_normalize(conv(x, y, M_BF), 64)
    m_lazy = conv(t[..., :32], jnp.asarray(spec.mu_limbs), M_TRUNC_BF)
    m = F._carry_normalize(m_lazy, 32)
    mp = conv(m, p_limbs, M_BF)
    u = t.at[..., :63].add(mp)
    res = F._carry_normalize(u, 65)[..., 32:]
    p_ext = jnp.concatenate([p_limbs, jnp.zeros((1,), jnp.int32)])
    return F._cond_sub_p(res, p_ext)[..., :32]

f_int = jax.jit(lambda x, y: F.mont_mul(spec, x, y))
f_bf = jax.jit(mont_mul_v2)
c_int = jax.jit(conv_int32)
c_bf = jax.jit(conv_bf16)

def timeit(name, fn, *args, reps=20):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{name:24s} {dt*1e3:8.2f} ms  ({N/dt/1e6:8.1f} M elem/s)")
    return out

print(f"N={N}")
o1 = timeit("conv int32", c_int, a, b)
o2 = timeit("conv bf16-split", c_bf, a, b)
print("conv exact match:", bool(jnp.all(o1 == o2)))
m1 = timeit("mont_mul int32", f_int, a, b)
m2 = timeit("mont_mul bf16", f_bf, a, b)
print("mont exact match:", bool(jnp.all(m1 == m2)))

# host parity spot-check
ia = F.limbs_to_int(np.asarray(a)[0]); ib = F.limbs_to_int(np.asarray(b)[0])
want = ia * ib * pow(1 << 256, spec.p - 2, spec.p) % spec.p
got = F.limbs_to_int(np.asarray(m2)[0])
print("host parity:", got == want)
