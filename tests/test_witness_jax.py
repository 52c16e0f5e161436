"""Batched device witness generator vs the host DSL evaluator (bit-exact)."""

import random

import jax.numpy as jnp
import numpy as np

from hotproofs_tpu.circuits import witness_jax as WJ
from hotproofs_tpu.circuits.blake3_compression import (
    VESTA_PRIME, compression_witness, get_compression_circuit)


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
