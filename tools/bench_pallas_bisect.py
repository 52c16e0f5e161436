"""Bisect the mont_mul kernel slowdown: add phases one at a time."""
import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from hotproofs_tpu.utils.config import setup_jax
setup_jax()
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from hotproofs_tpu.ops import field as F
from hotproofs_tpu.ops import pallas_field as PF

spec = F.pallas_base
L = 32
N = 131072
NL = PF.N_LANES
rng = np.random.RandomState(0)
def rand_limbs(n):
    out = np.zeros((n, 32), np.int32)
    for i in range(n):
        out[i] = F.int_to_limbs(int.from_bytes(rng.bytes(32), "little") % spec.p)
    return out
at = jnp.asarray(rand_limbs(N).T.copy()); bt = jnp.asarray(rand_limbs(N).T.copy())
consts = jnp.asarray(PF.field_consts(spec))

def call(kernel, out_rows=L, block=NL):
    return jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((out_rows, N), jnp.int32),
        grid=(N // block,),
        in_specs=[pl.BlockSpec((2, L + 1), lambda i: (0, 0), memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((L, block), lambda i: (0, i), memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((out_rows, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    ))

def timeit(name, fn, *args, reps=20):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time()-t0)/reps
    print(f"{name:36s} {dt*1e3:8.3f} ms")

def k1(c, a, b, o):   # conv + ks
    t = PF._ks_carry_rows(PF._conv_rows(a[:], b[:], 2 * L))
    o[:] = t[:L]
timeit("conv+ks", call(k1), consts, at, bt)

def k2(c, a, b, o):   # + conv_const(mu) + ks
    t = PF._ks_carry_rows(PF._conv_rows(a[:], b[:], 2 * L))
    m = PF._ks_carry_rows(PF._conv_const_rows(t[:L], c[1, :L], L))
    o[:] = m
timeit("conv+ks + convc(mu)+ks", call(k2), consts, at, bt)

def k3(c, a, b, o):   # + conv_const(p) + add
    t = PF._ks_carry_rows(PF._conv_rows(a[:], b[:], 2 * L))
    m = PF._ks_carry_rows(PF._conv_const_rows(t[:L], c[1, :L], L))
    mp = PF._conv_const_rows(m, c[0, :L], 2 * L)
    o[:] = (t + mp)[:L]
timeit("+ convc(p)", call(k3), consts, at, bt)

def k4(c, a, b, o):   # + final ks over 65 rows
    t = PF._ks_carry_rows(PF._conv_rows(a[:], b[:], 2 * L))
    m = PF._ks_carry_rows(PF._conv_const_rows(t[:L], c[1, :L], L))
    mp = PF._conv_const_rows(m, c[0, :L], 2 * L)
    u = jnp.pad(t + mp, ((0, 1), (0, 0)))
    res = PF._ks_carry_rows(u)[L:]
    o[:] = res[:L]
timeit("+ final ks(65)", call(k4), consts, at, bt)

def k5(c, a, b, o):   # full
    o[:] = PF.mont_mul_rows(c[:], a[:], b[:])
timeit("full (+condsub)", call(k5), consts, at, bt)
