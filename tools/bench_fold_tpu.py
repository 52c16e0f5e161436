"""Quick TPU e2e: one chunk proof via the pallas-MSM fold path + timings."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from hotproofs_tpu.utils.config import setup_jax
setup_jax()
import jax
print("backend:", jax.default_backend(), file=sys.stderr)

from hotproofs_tpu.core import blake3_ref as b3
from hotproofs_tpu.models.chunk_prover import ChunkProver

prover = ChunkProver()
data = bytes(1024)  # 16 blocks -> 16 folds

t0 = time.time()
root, proof = prover.prove(data, 0, fast=True)
print(f"warmup prove: {time.time()-t0:.1f}s")

t0 = time.time()
root, proof = prover.prove(data, 0, fast=True)
dt = time.time() - t0
n = proof.ivc_proof.num_steps
print(f"prove: {n} steps in {dt:.2f}s = {n/dt:.2f} folds/s")

t0 = time.time()
got = prover.verify(proof, expected_hash=b3.hash_bytes(data))
print(f"verify: {time.time()-t0:.1f}s; root ok: {got == b3.hash_bytes(data)}")
