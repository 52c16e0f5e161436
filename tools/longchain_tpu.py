"""Long-chain demonstration on the real chip (BASELINE config 5 at reduced
scale; VERDICT r2 item #3).

Proves possession of MANY chunks of a 4 MiB file — >=4096 verified folds of
the real blake3_nova step circuit — through the segment/lockstep machinery
(parallel/segments.py + IVC.prove_lockstep), in lockstep groups of K=8
chains, and separately exercises the thread-pool segment path's
checkpoint/resume (a partial run persists segment proofs; the rerun resumes
them instead of reproving). The reference can only run these folds strictly
sequentially on one CPU (rust_fold/src/main.rs:166-179).

Writes LONGCHAIN_r03.json at the repo root:
  {"total_folds": N, "wall_s": S, "agg_folds_per_sec": F,
   "chains": K, "resumed_segments": R, "all_verified": true}

Run: python tools/longchain_tpu.py [--target-folds 4224] [--group 8]
"""

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target-folds", type=int, default=4224)
    ap.add_argument("--group", type=int, default=8)
    ap.add_argument("--out", default=os.path.join(REPO, "LONGCHAIN_r03.json"))
    args = ap.parse_args()

    from hotproofs_tpu.utils.config import setup_jax
    setup_jax()
    import jax
    print(f"devices: {jax.devices()}", file=sys.stderr)

    import numpy as np
    from hotproofs_tpu.core import blake3_ref as b3
    from hotproofs_tpu.models.chunk_prover import ChunkProver
    from hotproofs_tpu.utils import telemetry as T

    prover = ChunkProver()

    # A 4 MiB file = 4096 chunks, tree depth 13; one chunk proof =
    # 16 blocks + 12 parent levels = 28 folds.
    rng = np.random.RandomState(2026)
    data = rng.bytes(4 << 20)
    root = b3.hash_bytes(data)
    n_chunks = len(data) // 1024
    steps_per_chain = 28

    # Warmup group (compiles the K-wide programs for this chain length).
    K = args.group
    t0 = time.time()
    root_w, proofs_w = prover.prove_many(data, list(range(K)))
    warm_s = time.time() - t0
    assert root_w == root
    print(f"warmup group of {K} (incl compile): {warm_s:.1f}s",
          file=sys.stderr)

    groups = max(1, -(-args.target_folds // (K * steps_per_chain)))
    rng_idx = np.random.RandomState(7)
    total_folds, proofs_all = 0, []
    t0 = time.time()
    for gi in range(groups):
        idxs = sorted(int(v) for v in rng_idx.choice(
            n_chunks, size=K, replace=False))
        root_g, proofs_g = prover.prove_many(data, idxs)
        assert root_g == root
        proofs_all.extend(proofs_g)
        total_folds += sum(p.ivc_proof.num_steps for p in proofs_g)
        el = time.time() - t0
        print(f"group {gi + 1}/{groups}: {total_folds} folds, "
              f"{total_folds / el:.2f} folds/s aggregate", file=sys.stderr)
    wall = time.time() - t0
    agg = total_folds / wall

    # Verify EVERY proof (host instance-fold replay + final opening).
    t0 = time.time()
    for p in proofs_all:
        assert prover.verify(p, expected_hash=root) == root
    print(f"verified {len(proofs_all)} proofs ({total_folds} folds) "
          f"in {time.time() - t0:.1f}s", file=sys.stderr)

    # Checkpoint/resume through the thread-pool segment path: prove HALF
    # the segments of one chain, then rerun — the rerun must RESUME the
    # persisted segments instead of reproving them.
    from hotproofs_tpu.parallel.segments import prove_segments
    ckpt = os.path.join(REPO, ".cache", "longchain_ckpt")
    shutil.rmtree(ckpt, ignore_errors=True)
    pd = prover._hash_with_path(data, 5)
    zs, sched, canon, X_host = prover._device_witness_chain(pd)
    prove_segments(prover.ivc, zs, canon, X_host, n_segments=4,
                   my_segments=[0, 1], checkpoint_dir=ckpt)  # "crash" here
    resumed_before = T.metrics.counters.get("segments/resumed", 0)
    seg = prove_segments(prover.ivc, zs, canon, X_host, n_segments=4,
                         checkpoint_dir=ckpt)
    resumed = T.metrics.counters.get("segments/resumed", 0) - resumed_before
    assert resumed >= 2, f"expected >=2 resumed segments, got {resumed}"
    from hotproofs_tpu.parallel.segments import verify_segments
    z_fin = verify_segments(prover.ivc, seg, io_arity=15)
    assert z_fin is not None
    print(f"checkpoint/resume: {resumed} segments resumed, "
          f"composed proof verified", file=sys.stderr)

    out = {
        "total_folds": total_folds,
        "wall_s": round(wall, 1),
        "agg_folds_per_sec": round(agg, 3),
        "chains": len(proofs_all),
        "steps_per_chain": steps_per_chain,
        "file_bytes": len(data),
        "warmup_s": round(warm_s, 1),
        "resumed_segments": int(resumed),
        "all_verified": True,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
