"""In-circuit Poseidon gadget vs the host oracle (ops/poseidon.py)."""

import numpy as np
import pytest

from hotproofs_tpu.circuits.dsl import compile_circuit, eval_witness
from hotproofs_tpu.circuits import poseidon_gadget as PG
from hotproofs_tpu.circuits.blake3_compression import VESTA_PRIME
from hotproofs_tpu.ops import poseidon as P


def _field_name():
    from hotproofs_tpu.ops.field import FIELDS
    for name, f in FIELDS.items():
        if f.p == VESTA_PRIME:
            return name
    raise RuntimeError("no field with VESTA_PRIME modulus")


def test_permute_matches_host():
    spec = P.make_spec(_field_name())
    p = spec.field.p

    def circ(ctx):
        out = ctx.declare_output("out", 3)
        st = ctx.declare_input("st", 3, public=False)
        res = PG.permute(ctx, spec, st)
        for o, r in zip(out, res):
            ctx.bind(o, r)

    r1cs, layout = compile_circuit(circ, p)
    rng = np.random.RandomState(7)
    st = [int.from_bytes(rng.bytes(32), "little") % p for _ in range(3)]
    w = eval_witness(circ, layout, {"st": st})
    seg = layout.segment("out")
    got = [int(w[seg.start + i]) for i in range(3)]
    assert got == P.host_permute(spec, st)


def test_sponge_matches_host():
    spec = P.make_spec(_field_name())
    p = spec.field.p
    vals = [3, 1 << 200, 0, 12345, p - 1, 7, 8]  # odd count: pad path

    def circ(ctx):
        out = ctx.declare_output("out", 1)
        xs = ctx.declare_input("xs", len(vals), public=False)
        sp = PG.SpongeGadget(ctx, spec, domain_tag=99)
        sp.absorb(xs)
        ctx.bind(out[0], sp.squeeze())

    r1cs, layout = compile_circuit(circ, p)
    w = eval_witness(circ, layout, {"xs": vals})
    got = int(w[layout.segment("out").start])

    host = P.HostSponge(spec, domain_tag=99)
    host.absorb(vals)
    assert got == host.squeeze()


def test_permutation_constraint_count():
    spec = P.make_spec(_field_name())

    def circ(ctx):
        out = ctx.declare_output("out", 3)
        st = ctx.declare_input("st", 3, public=False)
        res = PG.permute(ctx, spec, st)
        for o, r in zip(out, res):
            ctx.bind(o, r)

    r1cs, _ = compile_circuit(circ, spec.field.p)
    # 8 full rounds * 3 lanes * 3 muls + 57 partial * 3 muls + 3 binds
    assert r1cs.n_constraints == 8 * 3 * 3 + 57 * 3 + 3
