"""In-circuit EC gadgets vs the host curve oracle (Pallas points, so the
circuit field is Pallas' BASE field — the curve-cycle arrangement the
augmented circuit uses)."""

import pytest

import hotproofs_tpu.ops.curve as C
from hotproofs_tpu.circuits import ec_gadget as E
from hotproofs_tpu.circuits.dsl import compile_circuit, eval_witness

SPEC = C.PALLAS
P = SPEC.base.p
B3 = (3 * SPEC.b) % P


@pytest.fixture(scope="module")
def pts():
    return C.derive_generators(SPEC, b"ec-gadget-test", 4)


def _run(circ, inputs):
    r1cs, layout = compile_circuit(circ, P)
    w = eval_witness(circ, layout, inputs)
    seg = layout.segment("out")
    return [int(w[seg.start + i]) for i in range(seg.length)], r1cs


def _to_affine_ints(x, y, z):
    if z % P == 0:
        return None
    zi = pow(z, P - 2, P)
    return (x * zi % P, y * zi % P)


def test_add_double_match_host(pts):
    (x1, y1), (x2, y2) = pts[0], pts[1]

    def circ(ctx):
        out = ctx.declare_output("out", 9)
        a = ctx.declare_input("a", 2, public=False)
        b = ctx.declare_input("b", 2, public=False)
        pa = (a[0], a[1], 1)
        pb = (b[0], b[1], 1)
        s = E.add(ctx, B3, pa, pb)
        d = E.double(ctx, B3, pa)
        i = E.add(ctx, B3, pa, E.identity())
        for o, v in zip(out, list(s) + list(d) + list(i)):
            ctx.bind(o, v)

    vals, r1cs = _run(circ, {"a": [x1, y1], "b": [x2, y2]})
    assert _to_affine_ints(*vals[0:3]) == C.host_add(SPEC, (x1, y1), (x2, y2))
    assert _to_affine_ints(*vals[3:6]) == C.host_add(SPEC, (x1, y1), (x1, y1))
    assert _to_affine_ints(*vals[6:9]) == (x1, y1)


def test_scalar_mul_matches_host(pts):
    (x1, y1) = pts[2]
    k = 0xDEADBEEF1234577FFEE ^ (1 << 77)
    nbits = 80

    def circ(ctx):
        out = ctx.declare_output("out", 3)
        a = ctx.declare_input("a", 2, public=False)
        kbits = ctx.declare_input("kbits", nbits, public=False)
        for b in kbits:
            ctx.enforce(b, b, b)
        res = E.scalar_mul(ctx, B3, kbits, (a[0], a[1], 1))
        for o, v in zip(out, res):
            ctx.bind(o, v)

    bits = [(k >> i) & 1 for i in range(nbits)]
    vals, r1cs = _run(circ, {"a": [x1, y1], "kbits": bits})
    assert _to_affine_ints(*vals) == C.host_scalar_mul(SPEC, k, (x1, y1))
    # 23 constraints/bit + booleanity + output binds + normalization-free
    assert r1cs.n_constraints <= nbits * 24 + 10


def test_scalar_mul_zero_gives_identity(pts):
    (x1, y1) = pts[3]

    def circ(ctx):
        out = ctx.declare_output("out", 3)
        a = ctx.declare_input("a", 2, public=False)
        kbits = ctx.declare_input("kbits", 4, public=False)
        x, y, inf = E.normalize_affine(
            ctx, E.scalar_mul(ctx, B3, kbits, (a[0], a[1], 1)))
        ctx.bind(out[0], x)
        ctx.bind(out[1], y)
        ctx.bind(out[2], inf)

    vals, _ = _run(circ, {"a": [x1, y1], "kbits": [0, 0, 0, 0]})
    assert vals == [0, 0, 1]


def test_normalize_affine_roundtrip(pts):
    (x1, y1) = pts[0]

    def circ(ctx):
        out = ctx.declare_output("out", 3)
        a = ctx.declare_input("a", 2, public=False)
        pa = (a[0], a[1], 1)
        d = E.double(ctx, B3, pa)           # non-trivial Z
        E.assert_on_curve(ctx, SPEC.b, d)
        x, y, inf = E.normalize_affine(ctx, d)
        ctx.bind(out[0], x)
        ctx.bind(out[1], y)
        ctx.bind(out[2], inf)

    vals, _ = _run(circ, {"a": [x1, y1]})
    assert (vals[0], vals[1]) == C.host_add(SPEC, (x1, y1), (x1, y1))
    assert vals[2] == 0
