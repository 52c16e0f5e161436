"""TPU microbenchmarks for the fold pipeline: where does a fold's time go?

Run on the real chip: `python tools/profile_tpu.py`. Measures (1) bare jit
launch latency through the runtime, (2) in-device lax.scan step cost,
(3) each per-fold piece warm, (4) the fused pipelined fold program,
(5) end-to-end folds/s. These numbers drive the MSM/fold design choices
(docs/ROADMAP.md "Measured TPU facts").
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    from hotproofs_tpu.utils.config import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    print(f"devices: {jax.devices()}", file=sys.stderr)

    def timeit(name, fn, n=20):
        fn()  # warm/compile
        jax.block_until_ready(fn())
        t0 = time.time()
        for _ in range(n):
            out = fn()
        jax.block_until_ready(out)
        dt = (time.time() - t0) / n
        print(f"{name}: {dt * 1e3:.2f} ms")
        return dt

    # 1. Bare launch latency.
    x = jnp.ones((8, 8))
    f_triv = jax.jit(lambda a: a * 2.0)
    timeit("trivial jit launch (8x8 mul)", lambda: f_triv(x), n=100)

    # 2. Scan-step cost at two widths.
    for width, steps in ((8, 1000), (32768, 100)):
        y = jnp.ones((width,), jnp.int32)

        def mk(steps=steps):
            return jax.jit(lambda a: jax.lax.scan(
                lambda c, _: (c + 1, None), a, None, length=steps)[0])

        g = mk()
        dt = timeit(f"scan {steps} trivial steps @width {width}",
                    lambda: g(y), n=10)
        print(f"  -> {dt / steps * 1e6:.1f} us/step")

    # 3+4+5. Fold pieces on the real stack.
    from hotproofs_tpu.core import blake3_ref as b3
    from hotproofs_tpu.models.chunk_prover import ChunkProver
    from hotproofs_tpu.ops import field as F

    prover = ChunkProver()
    ivc = prover.ivc
    shape, spec = ivc.shape, ivc.shape.field
    data = bytes(1024)
    t0 = time.time()
    root, proof = prover.prove(data, 0, fast=True)
    print(f"warmup prove (incl compile): {time.time() - t0:.1f}s")
    t0 = time.time()
    root, proof = prover.prove(data, 0, fast=True)
    dt = time.time() - t0
    n = proof.ivc_proof.num_steps
    print(f"prove warm: {n} steps in {dt:.2f}s = {n / dt:.2f} folds/s")

    # Piece timings on real tensors.
    pd = b3.hash_with_path(data, 0)
    zs, sched, canon, X_host = prover._device_witness_chain(pd)
    to_mont = F.jitted("to_mont", spec)
    z_mont = to_mont(canon[0])
    import hotproofs_tpu.nova.fold as NF
    import hotproofs_tpu.ops.curve as C
    acc_dev, acc_inst = NF.empty_accumulator(shape)
    mv = ivc._jit("matvec", lambda z: __import__(
        "hotproofs_tpu.nova.r1cs", fromlist=["matvec_all"]).matvec_all(
            shape, z))
    az, bz, cz = mv(z_mont)
    u1 = ivc._scalar_mont(1)
    cross = ivc._jit("cross", lambda a, x, y, w, u: NF.cross_term(
        spec, a, x, y, w, u))
    T = cross(acc_dev, az, bz, cz, u1)
    from_mont = F.jitted("from_mont", spec)
    Tc = from_mont(T)
    timeit("matvec (1 step)", lambda: mv(z_mont))
    timeit("cross_term", lambda: cross(acc_dev, az, bz, cz, u1))
    timeit("comm_T MSM full width",
           lambda: ivc.ck.commit(Tc, max_bits=256), n=10)
    comm = ivc.ck.commit(Tc, max_bits=256)
    timeit("pt_to_affine_host (sync)",
           lambda: C.pt_to_affine_host(
               ivc.curve, tuple(x[None] for x in comm)), n=10)
    scaled_T = ivc.ck.scaled(shape.n_cons, 256)
    fused = ivc._jit_cache.get("fused_fold_step")
    if fused is not None:
        zw = jnp.zeros((shape.n_wit, F.N_LIMBS), jnp.int32)
        zc = jnp.zeros((shape.n_cons, F.N_LIMBS), jnp.int32)
        zr = jnp.zeros((F.N_LIMBS,), jnp.int32)
        timeit("fused fold step (fold+cross+commit)",
               lambda: fused(acc_dev, zw, zc, zc, zc, zc, zr,
                             az, bz, cz, u1, scaled_T), n=10)

    # Host-side pieces.
    t0 = time.time()
    for _ in range(20):
        NF.fold_instance(spec, ivc.curve, acc_inst, [1] * shape.n_io,
                         (3, 4), (5, 6), 12345)
    print(f"fold_instance host: {(time.time() - t0) / 20 * 1e3:.2f} ms")
    tr = ivc._new_transcript([1] * 15)
    t0 = time.time()
    for _ in range(20):
        ivc._fold_challenge(tr, acc_inst, [1] * shape.n_io, (3, 4), (5, 6))
    print(f"fold_challenge host: {(time.time() - t0) / 20 * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
