"""Per-phase breakdown of mont_mul on the chip."""
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

def timeit(name, fn, *args, reps=50):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:28s} {(time.time()-t0)/reps*1e3:8.3f} ms")
    return out

conv_j = jax.jit(lambda x, y: F._conv(x, y, F._M_FULL))
t_lazy = conv_j(a, b)
timeit("conv full (outer+dot)", conv_j, a, b)
cn_j = jax.jit(lambda t: F._carry_normalize(t, 64))
timeit("carry_normalize (63->64)", cn_j, t_lazy)
t64 = cn_j(t_lazy)
ks_j = jax.jit(lambda g, p: F._ks_prefix(g, p))
g = (t64 > 255).astype(jnp.int32); p_ = (t64 == 255).astype(jnp.int32)
timeit("ks_prefix (64)", ks_j, g, p_)
cs_j = jax.jit(lambda x: F._cond_sub_p(x, jnp.asarray(spec.p_limbs)))
timeit("cond_sub_p (32)", cs_j, a)
add_j = jax.jit(lambda x, y: F.add(spec, x, y))
timeit("field add", add_j, a, b)
mm_j = jax.jit(lambda x, y: F.mont_mul(spec, x, y))
timeit("mont_mul full", mm_j, a, b)

# mont_mul without cond_sub / with fused phases to see what fusion does
def mm_nocond(x, y):
    p_limbs = jnp.asarray(spec.p_limbs)
    t = F._carry_normalize(F._conv(x, y, F._M_FULL), 2 * F.N_LIMBS)
    m = F._carry_normalize(
        F._conv(t[..., :32], jnp.asarray(spec.mu_limbs), F._M_TRUNC), 32)
    mp = F._conv(m, p_limbs, F._M_FULL)
    u = t.at[..., :63].add(mp)
    return F._carry_normalize(u, 65)[..., 32:]
timeit("mont_mul minus condsub", jax.jit(mm_nocond), a, b)

# 3 convs alone chained (no normalize between; wrong math, just timing)
def convs3(x, y):
    t = F._conv(x, y, F._M_FULL)
    m = F._conv(t[..., :32] & 255, jnp.asarray(spec.mu_limbs), F._M_TRUNC)
    return F._conv(m & 255, jnp.asarray(spec.p_limbs), F._M_FULL)
timeit("3 convs chained", jax.jit(convs3), a, b)
