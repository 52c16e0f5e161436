"""Split pallas mont_mul cost: conv vs normalize; try MXU conv variant."""
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

def call(kernel, n_in=2, out_rows=L, block=NL):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((out_rows, N), jnp.int32),
        grid=(N // block,),
        in_specs=[pl.BlockSpec((2, L + 1), lambda i: (0, 0), memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((L, block), lambda i: (0, i), memory_space=pltpu.VMEM)] * n_in,
        out_specs=pl.BlockSpec((out_rows, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )

def timeit(name, fn, *args, reps=20):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time()-t0)/reps
    print(f"{name:28s} {dt*1e3:8.3f} ms  {N/dt/1e6:8.1f} M/s")

# conv only (VPU row-shift)
def k_conv(c, a, b, o):
    o[:] = PF._conv_rows(a[:], b[:], 2 * L)[:L] & 0xFF
timeit("conv only (VPU)", jax.jit(call(k_conv, out_rows=L)), consts, at, bt)

# 3 convs (approximate mul shape, no normalize)
def k_conv3(c, a, b, o):
    t = PF._conv_rows(a[:], b[:], 2 * L)
    m = PF._conv_const_rows(t[:L] & 0xFF, c[1, :L], L)
    mp = PF._conv_const_rows(m & 0xFF, c[0, :L], 2 * L)
    o[:] = (t + mp)[:L]
timeit("3 convs (VPU)", jax.jit(call(k_conv3, out_rows=L)), consts, at, bt)

# normalize only
def k_norm(c, a, b, o):
    t = a[:] * 255 + b[:]
    t = PF._ks_carry_rows(jnp.pad(t, ((0, L), (0, 0))))
    o[:] = PF._cond_sub_rows(t[:L + 1], c[0])[:L]
timeit("1 ks+condsub", jax.jit(call(k_norm, out_rows=L)), consts, at, bt)

# full mont_mul
timeit("full mont_mul", lambda a, b: PF.mont_mul_lm(spec, a, b), at, bt)

# MXU conv variant: outer product -> reshape -> bf16 hi/lo matmul
DIAG = (np.arange(2 * L - 1)[None, :] ==
        (np.arange(L)[:, None, None] + np.arange(L)[None, :, None]
         ).reshape(L * L, 1)).astype(np.float32)     # (1024, 63)
DIAG_PAD = np.zeros((L * L, 2 * L), np.float32); DIAG_PAD[:, :2*L-1] = DIAG

def k_conv_mxu(c, a, b, m_ref, o):
    outer = (a[:][:, None, :] * b[:][None, :, :]).reshape(L * L, -1)  # (1024, NL)
    hi = (outer >> 8).astype(jnp.bfloat16)
    lo = (outer & 0xFF).astype(jnp.bfloat16)
    mm = m_ref[:]  # (64, 1024) bf16
    dot = lambda x: jax.lax.dot_general(
        mm, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    res = (dot(hi).astype(jnp.int32) << 8) + dot(lo).astype(jnp.int32)
    o[:] = res[:L]

m_in = jnp.asarray(DIAG_PAD.T, dtype=jnp.bfloat16)  # (64, 1024)
conv_mxu = pl.pallas_call(
    k_conv_mxu,
    out_shape=jax.ShapeDtypeStruct((L, N), jnp.int32),
    grid=(N // NL,),
    in_specs=[pl.BlockSpec((2, L + 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
              pl.BlockSpec((L, NL), lambda i: (0, i), memory_space=pltpu.VMEM),
              pl.BlockSpec((L, NL), lambda i: (0, i), memory_space=pltpu.VMEM),
              pl.BlockSpec((2 * L, L * L), lambda i: (0, 0), memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((L, NL), lambda i: (0, i), memory_space=pltpu.VMEM),
)
f_mxu = jax.jit(lambda a, b: conv_mxu(consts, a, b, m_in))
try:
    timeit("conv only (MXU bf16)", f_mxu, at, bt)
    ref = jax.jit(call(k_conv, out_rows=L))(consts, at, bt)
    got = f_mxu(at, bt)
    print("mxu conv match:", bool(jnp.all((ref & 0xFF) == (got & 0xFF))))
except Exception as e:
    print("MXU conv failed:", type(e).__name__, str(e)[:300])
