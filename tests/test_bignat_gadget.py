"""Non-native field arithmetic gadget vs exact integer arithmetic."""

import numpy as np
import pytest

from hotproofs_tpu.circuits import bignat_gadget as BN
from hotproofs_tpu.circuits.dsl import compile_circuit, eval_witness
from hotproofs_tpu.ops.field import FIELDS

Q = FIELDS["pallas_scalar"].p   # native circuit field
M = FIELDS["vesta_scalar"].p    # foreign modulus (the other side's field)


def _run(circ, inputs):
    r1cs, layout = compile_circuit(circ, Q)
    w = eval_witness(circ, layout, inputs)
    seg = layout.segment("out")
    return [int(w[seg.start + i]) for i in range(seg.length)], r1cs


def _bn_in(ctx, name):
    sigs = ctx.declare_input(name, BN.N_LIMBS, public=False)
    return BN.BigNat(list(sigs))


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_mul_mod_random(seed):
    rng = np.random.RandomState(seed)
    a = int.from_bytes(rng.bytes(32), "little") % M
    b = int.from_bytes(rng.bytes(32), "little") % M

    def circ(ctx):
        out = ctx.declare_output("out", BN.N_LIMBS)
        an = _bn_in(ctx, "a")
        bn = _bn_in(ctx, "b")
        r = BN.mul_mod(ctx, M, an, bn)
        for o, l in zip(out, r.limbs):
            ctx.bind(o, l)

    vals, r1cs = _run(circ, {"a": BN.limbs_of_int(a),
                             "b": BN.limbs_of_int(b)})
    assert BN.int_of_limbs(vals) == a * b % M
    assert r1cs.n_constraints < 1600, r1cs.n_constraints


def test_mul_mod_edges():
    for a, b in [(0, 0), (M - 1, M - 1), (1, M - 1), (0, 12345)]:
        def circ(ctx):
            out = ctx.declare_output("out", BN.N_LIMBS)
            an = _bn_in(ctx, "a")
            bn = _bn_in(ctx, "b")
            r = BN.mul_mod(ctx, M, an, bn)
            for o, l in zip(out, r.limbs):
                ctx.bind(o, l)

        vals, _ = _run(circ, {"a": BN.limbs_of_int(a),
                              "b": BN.limbs_of_int(b)})
        assert BN.int_of_limbs(vals) == a * b % M, (a, b)


def test_add_mod():
    rng = np.random.RandomState(9)
    for _ in range(3):
        a = int.from_bytes(rng.bytes(32), "little") % M
        b = int.from_bytes(rng.bytes(32), "little") % M

        def circ(ctx):
            out = ctx.declare_output("out", BN.N_LIMBS)
            an = _bn_in(ctx, "a")
            bn = _bn_in(ctx, "b")
            r = BN.add_mod(ctx, M, an, bn)
            for o, l in zip(out, r.limbs):
                ctx.bind(o, l)

        vals, _ = _run(circ, {"a": BN.limbs_of_int(a),
                              "b": BN.limbs_of_int(b)})
        assert BN.int_of_limbs(vals) == (a + b) % M


def test_from_bits_packs():
    v = (1 << 200) | (1 << 63) | 7

    def circ(ctx):
        out = ctx.declare_output("out", BN.N_LIMBS)
        bits = ctx.declare_input("bits", 256, public=False)
        for b in bits:
            ctx.enforce(b, b, b)
        bn = BN.from_bits(ctx, bits)
        for o, l in zip(out, bn.limbs):
            ctx.bind(o, l)

    bits = [(v >> i) & 1 for i in range(256)]
    vals, _ = _run(circ, {"bits": bits})
    assert BN.int_of_limbs(vals) == v


def test_less_than_m_rejects_noncanonical():
    def circ(ctx):
        a = _bn_in(ctx, "a")
        BN.assert_less_than_m(ctx, a, M)

    r1cs, layout = compile_circuit(circ, Q)
    eval_witness(circ, layout, {"a": BN.limbs_of_int(M - 1)})  # ok
    with pytest.raises(AssertionError):
        eval_witness(circ, layout, {"a": BN.limbs_of_int(M)})
