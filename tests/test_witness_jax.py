"""Batched device witness generators vs the host DSL evaluator (bit-exact)."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from hotproofs_tpu.core import blake3_ref as b3
from hotproofs_tpu.circuits import blake3_nova as nova_circ
from hotproofs_tpu.circuits import witness_jax as WJ
from hotproofs_tpu.circuits.blake3_compression import (
    VESTA_PRIME, compression_witness, get_compression_circuit)


@pytest.mark.slow  # jitted batch generator: multi-minute XLA:CPU compile
def test_batched_matches_host():
    rng = random.Random(424)
    B = 4
    hs, ms, ts, bs, ds = [], [], [], [], []
    host_wits = []
    for i in range(B):
        h = [rng.getrandbits(32) for _ in range(8)]
        m = [rng.getrandbits(32) for _ in range(16)]
        t = [rng.getrandbits(32), rng.getrandbits(32)]
        b = (rng.getrandbits(32) % 16) * 4
        d = rng.choice([0, 1, 2, 3, 11])
        hs.append(h); ms.append(m); ts.append(t); bs.append(b); ds.append(d)
        host_wits.append(compression_witness(h, m, t, b, d))
    gen = WJ.jitted_generator()
    got = np.asarray(gen(
        jnp.asarray(np.array(hs, np.uint32)),
        jnp.asarray(np.array(ms, np.uint32)),
        jnp.asarray(np.array(ts, np.uint32)),
        jnp.asarray(np.array(bs, np.uint32)),
        jnp.asarray(np.array(ds, np.uint32))))
    assert got.shape == (B, WJ.expected_n_signals())
    for i in range(B):
        expected = np.array([int(v) for v in host_wits[i]], dtype=np.uint64)
        assert np.array_equal(got[i].astype(np.uint64), expected), \
            f"witness mismatch at batch {i}"


@pytest.mark.slow  # jitted batch generator: multi-minute XLA:CPU compile
def test_batched_satisfies_r1cs_sample():
    r1cs, layout = get_compression_circuit(VESTA_PRIME)
    rng = random.Random(7)
    h = [rng.getrandbits(32) for _ in range(8)]
    m = [rng.getrandbits(32) for _ in range(16)]
    gen = WJ.jitted_generator()
    got = np.asarray(gen(
        jnp.asarray(np.array([h], np.uint32)),
        jnp.asarray(np.array([m], np.uint32)),
        jnp.asarray(np.array([[0, 0]], np.uint32)),
        jnp.asarray(np.array([64], np.uint32)),
        jnp.asarray(np.array([3], np.uint32))))
    w = np.array([int(v) for v in got[0]], dtype=object)
    assert r1cs.is_satisfied(w)


@pytest.mark.slow  # jitted batch generator: multi-minute XLA:CPU compile
def test_nova_batched_matches_host_full_chain():
    """Walk a real multi-step chain (leaf blocks + parents) and compare every
    step's batched witness against the host evaluator, patching the three
    inverse-hint positions."""
    data = bytes(range(200)) * 12  # 2400 bytes -> 3 chunks
    proof = b3.hash_with_path(data, 2)
    sched = nova_circ.build_schedule(proof)
    modulus = VESTA_PRIME

    big_pos = WJ.nova_big_positions(modulus)
    gen = WJ.jitted_nova_generator(0)

    z = [v % modulus for v in sched.z0]
    for step in sched.steps:
        w_host, z_out = nova_circ.eval_step_witness(z, step, modulus)
        got = np.asarray(gen(
            jnp.asarray(np.array([z], np.uint32)),
            jnp.asarray(np.array([step.m], np.uint32)),
            jnp.asarray(np.array([step.b], np.uint32)),
            jnp.asarray(np.array([step.down_left], np.uint32))))[0]
        expected = np.array([int(v) for v in w_host], dtype=object)
        patched = got.astype(np.uint64).astype(object)
        invs = WJ.nova_inverse_values(z[11], z[1], z[0], modulus)
        for pos, val in zip(big_pos, invs):
            patched[pos] = val
        mism = [i for i in range(len(expected))
                if patched[i] != expected[i]]
        assert not mism, f"mismatch at signals {mism[:10]}"
        z = z_out


@pytest.mark.slow  # jitted batch generator: multi-minute XLA:CPU compile
def test_nova_batched_batching_axis():
    """Batch two different steps in one call; each row must match its own
    single-row result."""
    data = bytes(1028)
    proof = b3.hash_with_path(data, 0)
    sched = nova_circ.build_schedule(proof)
    modulus = VESTA_PRIME
    z0 = [v % modulus for v in sched.z0]
    _, z1 = nova_circ.eval_step_witness(z0, sched.steps[0], modulus)

    gen = WJ.jitted_nova_generator(0)
    zs = np.array([z0, z1], np.uint32)
    ms = np.array([sched.steps[0].m, sched.steps[1].m], np.uint32)
    bs = np.array([sched.steps[0].b, sched.steps[1].b], np.uint32)
    dls = np.array([1, 1], np.uint32)
    both = np.asarray(gen(jnp.asarray(zs), jnp.asarray(ms),
                          jnp.asarray(bs), jnp.asarray(dls)))
    for row in range(2):
        single = np.asarray(gen(
            jnp.asarray(zs[row: row + 1]), jnp.asarray(ms[row: row + 1]),
            jnp.asarray(bs[row: row + 1]), jnp.asarray(dls[row: row + 1])))
        assert np.array_equal(both[row], single[0])


def test_compiled_evaluator_matches_evalctx():
    """The tape evaluator (dsl.CompiledEvaluator) must be bit-identical to
    the EvalCtx walk on the real nova step circuit — it replaces EvalCtx on
    the recursive-prove hot path (nova/recursive.py Side.synthesize)."""
    from hotproofs_tpu.circuits.dsl import CompiledEvaluator
    from hotproofs_tpu.circuits.blake3_nova import (get_nova_step_circuit,
                                                    nova_step)

    data = bytes(200)
    proof = b3.hash_with_path(data, 0)
    sched = nova_circ.build_schedule(proof)
    modulus = VESTA_PRIME
    _, layout = get_nova_step_circuit(modulus, 0, 8)
    gadget = lambda ctx: nova_step(ctx, 0, 8)
    ce = CompiledEvaluator(gadget, layout)

    z = [v % modulus for v in sched.z0]
    for step in sched.steps:
        inputs = {"z_in": list(z), "m": step.m, "b": [step.b],
                  "down_left": [step.down_left]}
        w_ref, z_out = nova_circ.eval_step_witness(z, step, modulus)
        w_tape = ce.eval(inputs, check=True)
        assert np.array_equal(w_ref, w_tape)
        z = z_out
