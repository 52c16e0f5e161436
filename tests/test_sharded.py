"""Sharding tests on the virtual 8-device CPU mesh (SURVEY.md §4 item 4)."""

import random

import jax
import jax.numpy as jnp
import pytest

from hotproofs_tpu.ops import curve as C
from hotproofs_tpu.parallel.mesh import make_mesh
from hotproofs_tpu.parallel.msm_sharded import (batch_commit_sharded,
                                                msm_sharded)

pytestmark = pytest.mark.slow  # multi-minute XLA:CPU compiles (round-5 curation)


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    spec = C.PALLAS
    n = 16
    gens = C.derive_generators(spec, b"shard-test", n)
    rng = random.Random(1)
    scalars = [rng.randrange(1 << 40) for _ in range(n)]
    pts = C.pt_stack([C.pt_from_affine(spec, x, y) for x, y in gens])
    limbs = jnp.asarray(spec.scalar.batch_to_limbs(scalars))
    expected = C.host_msm(spec, scalars, gens)
    return spec, scalars, gens, limbs, pts, expected


def test_msm_sharded_matches_host(setup):
    spec, scalars, gens, limbs, pts, expected = setup
    mesh = make_mesh(step=1, msm=8)
    out = msm_sharded(spec, mesh, limbs, pts, max_bits=40)
    got = C.pt_to_affine_host(spec, tuple(x[None] for x in out))[0]
    assert got == expected


def test_batch_commit_sharded(setup):
    spec, scalars, gens, limbs, pts, expected = setup
    mesh = make_mesh(step=8, msm=1)
    batch = jnp.stack([limbs] * 8)  # 8 identical commitments, one per device
    out = batch_commit_sharded(spec, mesh, batch, pts, max_bits=40)
    affs = C.pt_to_affine_host(spec, out)
    assert all(a == expected for a in affs)


def test_prove_batch_on_mesh_same_proof():
    """Flagship wiring: prove_batch with a step x msm mesh produces the
    exact same proof as single-device (commitments are deterministic)."""
    from hotproofs_tpu.circuits import gadgets as g
    from hotproofs_tpu.circuits.dsl import compile_circuit, eval_witness
    from hotproofs_tpu.circuits.blake3_compression import VESTA_PRIME
    from hotproofs_tpu.nova.ivc import IVC
    from hotproofs_tpu.nova.pedersen import CommitmentKey
    from hotproofs_tpu.nova.r1cs import ShapeDevice
    import numpy as np

    def toy_step(ctx):
        z_out = ctx.declare_output("z_out", 1)
        z_in = ctx.declare_input("z_in", 1, public=True)
        sq = g.mul(ctx, z_in[0], z_in[0], name="sq")
        cube = g.mul(ctx, sq, z_in[0], name="cube")
        ctx.bind(z_out[0], cube + 7)

    p = VESTA_PRIME
    r1cs, layout = compile_circuit(toy_step, p)
    shape = ShapeDevice.from_dsl(r1cs)
    ck = CommitmentKey.create(C.PALLAS, b"toy-mesh",
                              max(shape.n_wit, shape.n_cons))
    ivc = IVC(shape, C.PALLAS, ck, None)

    z = 3
    wits = []
    for _ in range(4):
        w = eval_witness(toy_step, layout, {"z_in": [z]})
        wits.append([int(v) for v in w])
        z = (pow(z, 3, p) + 7) % p
    spec = shape.field
    canon = jnp.asarray(np.stack([spec.batch_to_limbs(w) for w in wits]))
    X_host = [[int(v) % p for v in w[1:1 + shape.n_io]] for w in wits]

    base = ivc.prove_batch([3], canon, X_host, chunk_steps=4)
    mesh = make_mesh(step=2, msm=4)
    sharded = ivc.prove_batch([3], canon, X_host, chunk_steps=4, mesh=mesh)
    assert base.to_dict() == sharded.to_dict()
    assert ivc.verify(sharded, io_arity=1) == base.z_final(1)


def test_lockstep_mesh_pallas_chain_per_chip(monkeypatch):
    """Fast path x mesh (VERDICT r03 next #10): prove_lockstep with a
    4-device `chain` mesh and HOTPROOFS_PALLAS_MSM=1 — the K-job batched
    pallas MSMs and the fused fold shard chain-per-chip — must produce
    bit-identical proofs to the single-device lockstep run."""
    from hotproofs_tpu.circuits import gadgets as g
    from hotproofs_tpu.circuits.dsl import compile_circuit, eval_witness
    from hotproofs_tpu.circuits.blake3_compression import VESTA_PRIME
    from hotproofs_tpu.nova.ivc import IVC
    from hotproofs_tpu.nova.pedersen import CommitmentKey
    from hotproofs_tpu.nova.r1cs import ShapeDevice
    from hotproofs_tpu.utils import config as cfg
    from jax.sharding import Mesh
    import numpy as np

    def toy_step(ctx):
        z_out = ctx.declare_output("z_out", 1)
        z_in = ctx.declare_input("z_in", 1, public=True)
        sq = g.mul(ctx, z_in[0], z_in[0], name="sq")
        cube = g.mul(ctx, sq, z_in[0], name="cube")
        ctx.bind(z_out[0], cube + 7)

    p = VESTA_PRIME
    r1cs, layout = compile_circuit(toy_step, p)
    shape = ShapeDevice.from_dsl(r1cs)
    ck = CommitmentKey.create(C.PALLAS, b"toy-mesh-pl",
                              max(shape.n_wit, shape.n_cons))
    ivc = IVC(shape, C.PALLAS, ck, None)

    spec = shape.field
    chains = []
    for z0 in (3, 5, 7, 11):
        z, wits = z0, []
        for _ in range(3):
            w = eval_witness(toy_step, layout, {"z_in": [z]})
            wits.append([int(v) for v in w])
            z = (pow(z, 3, p) + 7) % p
        canon = jnp.asarray(np.stack([spec.batch_to_limbs(w) for w in wits]))
        X_host = [[int(v) % p for v in w[1:1 + shape.n_io]] for w in wits]
        chains.append(([z0], canon, X_host))

    monkeypatch.setattr(cfg.CONFIG, "pallas_msm", "1")
    base = ivc.prove_lockstep(chains, chunk_steps=3)
    mesh = Mesh(np.array(jax.devices()[:4]), ("chain",))
    sharded = ivc.prove_lockstep(chains, chunk_steps=3, mesh=mesh)
    for a, b in zip(base, sharded):
        assert a.to_dict() == b.to_dict()
    for pr, (z0, _, _) in zip(sharded, chains):
        assert ivc.verify(pr, io_arity=1) == pr.z_final(1)
