"""ONE long chain on the real chip: a single >=4096-step BLAKE3 Nova IVC
chain proved through segments + lockstep, with a REAL mid-run kill/resume
(VERDICT r03 next #3; BASELINE config 5's 2^16-step-chain story at 2^12).

The statement is a deep-tree membership claim (one chunk, 16 block steps +
`steps-16` parent steps — core/blake3_ref.synthetic_deep_path_proof) on the
production step circuit widened to depth_bits=13 (the reference's Num2Bits(8)
caps its own chains at 270 steps; blake3_nova.nova_step_body depth_bits).
The chain is split into `--segments` segments proved in lockstep waves of
`--group` (parallel/segments.prove_segments lockstep path), composed by
public-IO chaining, and verified end-to-end.

Kill/resume: the orchestrator (default mode) runs the prover as a child
process, SIGKILLs it as soon as the first wave's segment checkpoints are on
disk (a genuine mid-run kill), then reruns it — the rerun RESUMES the
persisted segments and proves only the rest.

Run: python tools/longchain_deep.py [--steps 4096] [--segments 32]
         [--group 8] [--out LONGCHAIN_r05.json]
     python tools/longchain_deep.py --worker ...   (internal)
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(args):
    from hotproofs_tpu.utils.config import setup_jax
    setup_jax()
    import jax
    print(f"devices: {jax.devices()}", file=sys.stderr)

    from hotproofs_tpu.core import blake3_ref as b3
    from hotproofs_tpu.models.chunk_prover import ChunkProver
    from hotproofs_tpu.parallel.segments import (prove_segments,
                                                 verify_segments)
    from hotproofs_tpu.utils import telemetry as T

    n_steps = args.steps
    prover = ChunkProver(depth_bits=13)
    pd = b3.synthetic_deep_path_proof(bytes(range(256)) * 4, n_steps - 16,
                                      seed=2026)
    t0 = time.time()
    zs, sched, canon, X_host = prover._host_witness_chain(pd)
    t_wit = time.time() - t0
    assert len(sched.steps) == n_steps
    print(f"witness chain: {n_steps} steps in {t_wit:.1f}s "
          f"(host canon {canon.nbytes / 1e9:.2f} GB)", file=sys.stderr)

    t0 = time.time()
    seg = prove_segments(prover.ivc, zs, canon, X_host,
                         n_segments=args.segments, lockstep=True,
                         lockstep_group=args.group,
                         checkpoint_dir=args.ckpt, progress=True)
    wall = time.time() - t0
    resumed = int(T.metrics.counters.get("segments/resumed", 0))
    proved = int(T.metrics.counters.get("segments/proved", 0))
    assert proved + resumed == args.segments
    seg_sizes = [s.num_steps for s in seg.segments]
    # Resumed segments form a prefix (waves run in segment order and the
    # orchestrator kills after wave 1), so this run proved the suffix.
    folds_this_run = sum(seg_sizes[resumed:])

    # Verify the COMPOSED single-chain proof + the statement binding.
    t0 = time.time()
    z_fin = verify_segments(prover.ivc, seg, io_arity=15)
    p = prover.modulus
    assert [v % p for v in seg.z0] == [v % p for v in sched.z0], "z0 binding"
    root_words = [int.from_bytes(pd.root_hash[4 * i: 4 * i + 4], "little")
                  for i in range(8)]
    assert z_fin[2:10] == root_words, "final state != published root"
    assert z_fin[11] == 0, "chain did not reach the root (depth != 0)"
    t_verify = time.time() - t0

    waves = T.metrics.timers.get("segments/lockstep_wave")
    steady_fps = None
    if waves is not None and waves.calls >= 2:
        # First wave carries the compiles; steady state = the rest.
        steady_folds = folds_this_run - args.group * seg_sizes[0]
        steady_s = waves.total_s - waves.max_s
        if steady_folds > 0 and steady_s > 0:
            steady_fps = steady_folds / steady_s

    out = {
        "single_chain_steps": n_steps,
        "segments": args.segments,
        "lockstep_group": args.group,
        "depth_bits": 13,
        "folds_this_run": int(folds_this_run),
        "wall_s": round(wall, 1),
        "agg_folds_per_sec": round(folds_this_run / wall, 3),
        "steady_folds_per_sec": round(steady_fps, 3) if steady_fps else None,
        "witness_gen_s": round(t_wit, 1),
        "verify_s": round(t_verify, 1),
        "resumed_segments": resumed,
        "killed_mid_run": resumed > 0,
        "all_verified": True,
        "root": pd.root_hash.hex(),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


def orchestrate(args):
    import shutil
    shutil.rmtree(args.ckpt, ignore_errors=True)
    os.makedirs(args.ckpt, exist_ok=True)
    cmd = [sys.executable, os.path.abspath(__file__), "--worker",
           "--steps", str(args.steps), "--segments", str(args.segments),
           "--group", str(args.group), "--ckpt", args.ckpt,
           "--out", args.out]
    print(f"orchestrator: launching worker 1 (will kill after "
          f"{args.group} segment checkpoints)", file=sys.stderr)
    child = subprocess.Popen(cmd, start_new_session=True)
    try:
        deadline = time.time() + args.kill_timeout
        while time.time() < deadline:
            if child.poll() is not None:
                raise RuntimeError(
                    f"worker 1 exited ({child.returncode}) before the kill "
                    "— checkpoints appeared too fast or it failed; check "
                    "logs")
            done = len([f for f in os.listdir(args.ckpt)
                        if f.startswith("segment_")])
            if done >= args.group:
                print(f"orchestrator: {done} checkpoints on disk — "
                      f"SIGKILLing worker 1 (pid {child.pid})",
                      file=sys.stderr)
                os.killpg(os.getpgid(child.pid), signal.SIGKILL)
                child.wait()
                break
            time.sleep(5)
        else:
            os.killpg(os.getpgid(child.pid), signal.SIGKILL)
            child.wait()
            raise RuntimeError("no checkpoints before kill_timeout")
    finally:
        if child.poll() is None:
            os.killpg(os.getpgid(child.pid), signal.SIGKILL)
            child.wait()
    time.sleep(3)  # let the device tunnel settle
    print("orchestrator: launching worker 2 (resume + finish)",
          file=sys.stderr)
    rc = subprocess.call(cmd)
    if rc != 0:
        raise RuntimeError(f"worker 2 failed rc={rc}")
    with open(args.out) as f:
        out = json.load(f)
    assert out["resumed_segments"] >= args.group, out
    print("orchestrator: kill/resume demonstrated; result:", file=sys.stderr)
    print(json.dumps(out))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4096)
    ap.add_argument("--segments", type=int, default=32)
    ap.add_argument("--group", type=int, default=8)
    ap.add_argument("--ckpt",
                    default=os.path.join(REPO, ".cache", "longdeep_ckpt"))
    ap.add_argument("--out",
                    default=os.path.join(REPO, "LONGCHAIN_r05.json"))
    ap.add_argument("--kill-timeout", type=int, default=5400)
    ap.add_argument("--worker", action="store_true")
    args = ap.parse_args()
    if args.worker:
        worker(args)
    else:
        orchestrate(args)


if __name__ == "__main__":
    main()
