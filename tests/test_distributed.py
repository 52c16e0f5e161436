"""Two-process jax.distributed bring-up + cross-process segment sharding.

BASELINE config 5 is "a 2^16-step chain sharded across >= 2 hosts"; CI has
one host, so the honest stand-in (VERDICT r04 next #8) is two OS processes
coordinated through jax.distributed.initialize — the exact code path
(`parallel.mesh.init_distributed`) a real multi-host launch uses. Each
process proves segments [rank::2] of ONE toy chain (parallel/segments.py
my_segments), persists them via the checkpoint_dir mechanism, and the test
composes and verifies the full chain from the union of both processes'
segment files — the multi-host composition story end to end.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
sys.path.insert(0, REPO_PATH)
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

from hotproofs_tpu.parallel.mesh import init_distributed
rank = init_distributed()   # from HOTPROOFS_COORDINATOR / _NUM / _ID env
n_proc = jax.process_count()
assert n_proc == 2, f"expected 2 processes, got {n_proc}"
assert rank == int(os.environ["HOTPROOFS_PROCESS_ID"])

import jax.numpy as jnp
import numpy as np
import hotproofs_tpu.ops.curve as C
from hotproofs_tpu.circuits import gadgets as g
from hotproofs_tpu.circuits.blake3_compression import VESTA_PRIME
from hotproofs_tpu.circuits.dsl import compile_circuit, eval_witness
from hotproofs_tpu.nova.ivc import IVC
from hotproofs_tpu.nova.pedersen import CommitmentKey
from hotproofs_tpu.nova.r1cs import ShapeDevice
from hotproofs_tpu.parallel.segments import prove_segments


def _toy_step(ctx):
    z_out = ctx.declare_output("z_out", 1)
    z_in = ctx.declare_input("z_in", 1, public=True)
    sq = g.mul(ctx, z_in[0], z_in[0], name="sq")
    cube = g.mul(ctx, sq, z_in[0], name="cube")
    ctx.bind(z_out[0], cube + 7)


p = VESTA_PRIME
r1cs, layout = compile_circuit(_toy_step, p)
shape = ShapeDevice.from_dsl(r1cs)
ck = CommitmentKey.create(C.PALLAS, b"toy-2proc",
                          max(shape.n_wit, shape.n_cons))
ivc = IVC(shape, C.PALLAS, ck, None)

n_steps, z = 8, 3
zs, wits = [[z]], []
for _ in range(n_steps):
    w = eval_witness(_toy_step, layout, {"z_in": [z]})
    wits.append([int(v) for v in w])
    z = (pow(z, 3, p) + 7) % p
    zs.append([z])
spec = shape.field
canon = jnp.asarray(np.stack([spec.batch_to_limbs(w) for w in wits]))
X_host = [[int(v) % p for v in w[1:1 + shape.n_io]] for w in wits]

# Segments [rank::2] of one chain; proofs persist as segment_k JSON files.
prove_segments(ivc, zs, canon, X_host, n_segments=4,
               my_segments=list(range(rank, 4, 2)),
               checkpoint_dir=os.environ["SEG_DIR"])
print(f"RANK_{rank}_OK", flush=True)
"""


@pytest.mark.slow
def test_two_process_segment_sharding(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    seg_dir = str(tmp_path / "segments")
    worker = str(tmp_path / "worker.py")
    with open(worker, "w") as f:
        f.write(f"REPO_PATH = {REPO!r}\n" + WORKER)

    procs = []
    for rank in range(2):
        env = dict(os.environ,
                   JAX_PLATFORMS="cpu",
                   HOTPROOFS_COORDINATOR=f"127.0.0.1:{port}",
                   HOTPROOFS_NUM_PROCESSES="2",
                   HOTPROOFS_PROCESS_ID=str(rank),
                   SEG_DIR=seg_dir)
        env.pop("XLA_FLAGS", None)  # 1 CPU device per process
        procs.append(subprocess.Popen(
            [sys.executable, worker], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for rank, pr in enumerate(procs):
        try:
            out, err = pr.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for p2 in procs:
                p2.kill()
            pytest.fail(f"rank {rank} timed out")
        outs.append((pr.returncode, out, err))
    for rank, (rc, out, err) in enumerate(outs):
        assert rc == 0 and f"RANK_{rank}_OK" in out, \
            f"rank {rank} failed rc={rc}\n{err[-2000:]}"

    # Compose the union of both processes' segment proofs and verify the
    # whole chain in THIS process (the "aggregator host").
    import jax.numpy as jnp
    import numpy as np
    import hotproofs_tpu.ops.curve as C
    from hotproofs_tpu.circuits import gadgets as g  # noqa: F401
    from hotproofs_tpu.circuits.blake3_compression import VESTA_PRIME
    from hotproofs_tpu.circuits.dsl import compile_circuit, eval_witness
    from hotproofs_tpu.nova.ivc import IVC, IVCProof
    from hotproofs_tpu.nova.pedersen import CommitmentKey
    from hotproofs_tpu.nova.r1cs import ShapeDevice
    from hotproofs_tpu.parallel.segments import (SegmentedProof,
                                                 verify_segments)
    from hotproofs_tpu.circuits import gadgets
    p = VESTA_PRIME

    def _toy_step(ctx):
        z_out = ctx.declare_output("z_out", 1)
        z_in = ctx.declare_input("z_in", 1, public=True)
        sq = gadgets.mul(ctx, z_in[0], z_in[0], name="sq")
        cube = gadgets.mul(ctx, sq, z_in[0], name="cube")
        ctx.bind(z_out[0], cube + 7)

    r1cs, _ = compile_circuit(_toy_step, p)
    shape = ShapeDevice.from_dsl(r1cs)
    ck = CommitmentKey.create(C.PALLAS, b"toy-2proc",
                              max(shape.n_wit, shape.n_cons))
    ivc = IVC(shape, C.PALLAS, ck, None)

    files = sorted(os.listdir(seg_dir))
    assert len(files) == 4, files
    segs = [IVCProof.load(os.path.join(seg_dir, f)) for f in files]
    proof = SegmentedProof(segments=segs)
    z_final = verify_segments(ivc, proof, io_arity=1)
    z = 3
    for _ in range(8):
        z = (pow(z, 3, p) + 7) % p
    assert z_final == [z]
