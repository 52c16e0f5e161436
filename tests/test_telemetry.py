"""Telemetry (SURVEY.md §5 tracing/metrics) + elastic segment recovery.

The reference has neither: rust_fold prints timestamps and a crashed prove
restarts from step 0. Here, counters/spans are structured and segment
proving detects failures (raise OR bad proof), retries on another device,
and resumes from persisted per-segment checkpoints."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

import hotproofs_tpu.ops.curve as C
from hotproofs_tpu.circuits import gadgets as g
from hotproofs_tpu.circuits.blake3_compression import VESTA_PRIME
from hotproofs_tpu.circuits.dsl import compile_circuit, eval_witness
from hotproofs_tpu.nova.ivc import IVC
from hotproofs_tpu.nova.pedersen import CommitmentKey
from hotproofs_tpu.nova.r1cs import ShapeDevice
from hotproofs_tpu.parallel.segments import prove_segments, verify_segments
from hotproofs_tpu.utils import telemetry as T

pytestmark = pytest.mark.slow  # multi-minute XLA:CPU compiles (round-5 suite curation:
# the default suite must finish <10 min on a 4-core host; run with -m slow)



def _toy_step(ctx):
    z_out = ctx.declare_output("z_out", 1)
    z_in = ctx.declare_input("z_in", 1, public=True)
    sq = g.mul(ctx, z_in[0], z_in[0], name="sq")
    cube = g.mul(ctx, sq, z_in[0], name="cube")
    ctx.bind(z_out[0], cube + 7)


@pytest.fixture(scope="module")
def stack():
    p = VESTA_PRIME
    r1cs, layout = compile_circuit(_toy_step, p)
    shape = ShapeDevice.from_dsl(r1cs)
    ck = CommitmentKey.create(C.PALLAS, b"toy-tel",
                              max(shape.n_wit, shape.n_cons))
    ivc = IVC(shape, C.PALLAS, ck, None)
    n_steps = 6
    z = 3
    zs, wits = [[z]], []
    for _ in range(n_steps):
        w = eval_witness(_toy_step, layout, {"z_in": [z]})
        wits.append([int(v) for v in w])
        z = (pow(z, 3, p) + 7) % p
        zs.append([z])
    spec = shape.field
    canon = jnp.asarray(np.stack([spec.batch_to_limbs(w) for w in wits]))
    X_host = [[int(v) % p for v in w[1:1 + shape.n_io]] for w in wits]
    return ivc, zs, canon, X_host


def test_metrics_counters_and_spans():
    m = T.Metrics()
    m.count("x", 3)
    m.count("x")
    m.observe("phase", 0.5)
    m.observe("phase", 1.5)
    snap = m.snapshot()
    assert snap["counters"]["x"] == 4
    t = snap["timers"]["phase"]
    assert t["calls"] == 2 and abs(t["total_s"] - 2.0) < 1e-9
    assert t["max_s"] == 1.5
    m.reset()
    assert m.snapshot() == {"counters": {}, "timers": {}}


def test_span_records_and_is_exception_safe():
    T.metrics.reset()
    with pytest.raises(ValueError):
        with T.span("unit/raises"):
            raise ValueError("boom")
    assert T.metrics.snapshot()["timers"]["unit/raises"]["calls"] == 1


def test_ivc_fold_counter(stack):
    ivc, zs, canon, X_host = stack
    T.metrics.reset()
    proof = ivc.prove_batch(zs[0], canon, X_host)
    assert ivc.verify(proof, io_arity=1) is not None
    assert T.metrics.snapshot()["counters"]["ivc/folds"] == canon.shape[0]


def test_segment_retry_on_transient_failure(stack, monkeypatch):
    """A prove_batch that dies once (simulated preemption) is retried and
    the composed proof still verifies."""
    ivc, zs, canon, X_host = stack
    T.metrics.reset()
    real = ivc.prove_batch
    fails = {"left": 1}

    def flaky(*a, **kw):
        if fails["left"]:
            fails["left"] -= 1
            raise RuntimeError("simulated device preemption")
        return real(*a, **kw)

    monkeypatch.setattr(ivc, "prove_batch", flaky)
    seg = prove_segments(ivc, zs, canon, X_host, n_segments=2, retries=1)
    assert verify_segments(ivc, seg, io_arity=1) == \
        [v % ivc.shape.field.p for v in zs[-1]]
    assert T.metrics.snapshot()["counters"]["segments/retried"] == 1


def test_segment_retries_exhausted_raises(stack, monkeypatch):
    ivc, zs, canon, X_host = stack

    def always_fails(*a, **kw):
        raise RuntimeError("dead chip")

    monkeypatch.setattr(ivc, "prove_batch", always_fails)
    with pytest.raises(RuntimeError, match="failed after 2 attempts"):
        prove_segments(ivc, zs, canon, X_host, n_segments=1, retries=1)


def test_verify_each_catches_silent_corruption(stack, monkeypatch):
    """A proof corrupted in flight (silent device fault) fails verify_each
    and is reproved — the final composed proof is clean."""
    ivc, zs, canon, X_host = stack
    real = ivc.prove_batch
    bad = {"left": 1}

    def corrupting(*a, **kw):
        p = real(*a, **kw)
        if bad["left"]:
            bad["left"] -= 1
            p.steps[-1].X = [(p.steps[-1].X[0] + 1) % ivc.shape.field.p]
        return p

    monkeypatch.setattr(ivc, "prove_batch", corrupting)
    seg = prove_segments(ivc, zs, canon, X_host, n_segments=2,
                         retries=1, verify_each=True)
    assert verify_segments(ivc, seg, io_arity=1) == \
        [v % ivc.shape.field.p for v in zs[-1]]


def test_checkpoint_resume(stack, tmp_path, monkeypatch):
    """Kill the job after segment 0; the rerun resumes segment 0 from its
    checkpoint file (prove_batch runs only for the remaining segments)."""
    ivc, zs, canon, X_host = stack
    ckdir = str(tmp_path / "ck")
    real = ivc.prove_batch
    calls = {"n": 0}

    def counting(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            raise KeyboardInterrupt("job killed")  # after segment 0 saved
        return real(*a, **kw)

    monkeypatch.setattr(ivc, "prove_batch", counting)
    with pytest.raises(BaseException):
        prove_segments(ivc, zs, canon, X_host, n_segments=3,
                       retries=0, checkpoint_dir=ckdir, max_workers=1)
    assert os.path.exists(os.path.join(ckdir, "segment_00000.json"))

    T.metrics.reset()
    monkeypatch.setattr(ivc, "prove_batch", real)
    seg = prove_segments(ivc, zs, canon, X_host, n_segments=3,
                         checkpoint_dir=ckdir)
    assert verify_segments(ivc, seg, io_arity=1) == \
        [v % ivc.shape.field.p for v in zs[-1]]
    snap = T.metrics.snapshot()["counters"]
    assert snap["segments/resumed"] >= 1
    # Re-running the whole job now resumes EVERY segment, zero proving.
    T.metrics.reset()

    def never(*a, **kw):
        raise AssertionError("should have resumed from checkpoints")

    monkeypatch.setattr(ivc, "prove_batch", never)
    seg2 = prove_segments(ivc, zs, canon, X_host, n_segments=3,
                          checkpoint_dir=ckdir)
    assert seg2.to_dict() == seg.to_dict()
    assert T.metrics.snapshot()["counters"]["segments/resumed"] == 3


def test_stale_checkpoint_is_reproved(stack, tmp_path):
    """A checkpoint from a DIFFERENT job (wrong boundary) must be ignored,
    not composed into the proof."""
    ivc, zs, canon, X_host = stack
    ckdir = str(tmp_path / "ck2")
    os.makedirs(ckdir)
    # Write segment 1's proof where segment 0's should be: wrong z0.
    seg = prove_segments(ivc, zs, canon, X_host, n_segments=2)
    seg.segments[1].save(os.path.join(ckdir, "segment_00000.json"))
    T.metrics.reset()
    out = prove_segments(ivc, zs, canon, X_host, n_segments=2,
                         checkpoint_dir=ckdir)
    assert verify_segments(ivc, out, io_arity=1) == \
        [v % ivc.shape.field.p for v in zs[-1]]
    assert "segments/resumed" not in T.metrics.snapshot()["counters"]
