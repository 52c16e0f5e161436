"""Segment-parallel proving of long IVC chains (SURVEY.md §2c #3).

The reference proves a chain strictly sequentially — fold step i+1 consumes
fold step i's output (rust_fold/src/main.rs:166-179), so a 2^16-step chain
is 2^16 sequential RecursiveSNARK::prove_step calls on one host.  The TPU
stack exploits the structural fact SURVEY.md §2c #3 identifies: the PUBLIC
state chain z_0 → z_1 → … → z_n depends only on the hash chain (host
precomputable in microseconds, blake3_nova.z_chain), NOT on the folds.  So
an n-step chain splits into K segments that are proved as K fully
independent IVC chains — different hosts, different chips, or different
devices of one mesh — and composed by public-IO chaining:

    segment k proves:  z_{a_k} →^{b_k - a_k steps} z_{b_k}   (a_{k+1} = b_k)

The composed claim is exactly the original one ("there exists a valid
witness chain from z_0 to z_n"): each segment's folding argument proves
knowledge of satisfying witnesses for its steps, and the verifier checks
the segment boundaries line up (z_out of k == z0 of k+1).  Each segment
carries its own transcript (domain-separated by its z0, which differs per
segment) and its own folded accumulator; verification cost is the same
O(n) instance folds as the single-chain proof, plus K−1 boundary checks —
and each segment can be Spartan-compressed independently (nova/spartan.py)
to drop its witness vectors.

Wall-clock: n/K sequential folds per worker instead of n.  For BASELINE
config 5 (2^16 steps) with 16 hosts × 4 chips that is 1024 folds per chip.

Multi-host execution: call parallel.mesh.init_distributed() first (wraps
jax.distributed.initialize), give every process the same (zs, canon,
X_host) — all host-precomputable — and have process i prove segments
[i::n_processes] (`my_segments`); the K proof objects are tiny JSON
(serial.py) and travel over whatever control plane launched the job.  The
single-process path runs segments in a thread pool: device work for
different segments overlaps (each segment can be pinned to its own device
of a CPU/TPU mesh via `devices=`), host transcript work interleaves.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..nova import serial
from ..nova.ivc import IVC, IVCProof
from ..utils import telemetry as T


def split_plan(n_steps: int, n_segments: int) -> List[Tuple[int, int]]:
    """[start, end) step ranges, sizes as equal as possible, every segment
    non-empty (n_segments is clamped to n_steps)."""
    k = max(1, min(n_segments, n_steps))
    base, extra = divmod(n_steps, k)
    bounds, a = [], 0
    for i in range(k):
        b = a + base + (1 if i < extra else 0)
        bounds.append((a, b))
        a = b
    return bounds


@dataclass
class SegmentedProof:
    """K independent IVC proofs composed by public-IO chaining."""

    segments: List[IVCProof]

    @property
    def num_steps(self) -> int:
        return sum(s.num_steps for s in self.segments)

    @property
    def z0(self) -> List[int]:
        return self.segments[0].z0

    def z_final(self, io_arity: int) -> List[int]:
        return self.segments[-1].z_final(io_arity)

    def to_dict(self) -> dict:
        return {"segments": [s.to_dict() for s in self.segments]}

    @staticmethod
    def from_dict(d: dict) -> "SegmentedProof":
        return SegmentedProof(
            segments=[IVCProof.from_dict(s) for s in d["segments"]])

    def save(self, path: str) -> None:
        serial.dump("segmented_proof", self.to_dict(), path)

    @staticmethod
    def load(path: str) -> "SegmentedProof":
        return SegmentedProof.from_dict(serial.load("segmented_proof", path))


def prove_segments(ivc: IVC, zs: Sequence[Sequence[int]], canon,
                   X_host: List[List[int]], n_segments: int,
                   devices: Optional[Sequence] = None,
                   my_segments: Optional[Sequence[int]] = None,
                   max_workers: Optional[int] = None,
                   lockstep: bool = False,
                   lockstep_group: Optional[int] = None,
                   retries: int = 1,
                   verify_each: bool = False,
                   checkpoint_dir: Optional[str] = None,
                   progress: bool = False) -> SegmentedProof:
    """Prove the chain (canon, X_host) as n_segments independent segments.

    zs: the precomputed public-state chain [z_0 .. z_n] (z_chain); segment
    k's proof starts from zs[a_k].  devices: optional list to pin segment
    k's witness tensors to devices[k % len(devices)] so segments run on
    different chips of a mesh.  my_segments: prove only these segment
    indices (multi-host sharding — every other entry is None in
    .segments and the caller composes across hosts); default all.

    lockstep=True folds segments in lockstep on ONE device
    (IVC.prove_lockstep): every launch carries a group of segments' fused
    fold+comm_T vmapped over the segment axis — K× aggregate folds/s on a
    launch-bound chip, vs the thread-pool path which overlaps but still
    serializes device launches. Proof bytes are identical either way.
    lockstep_group bounds how many segments advance together (default all);
    with checkpoint_dir set, every finished group's segment proofs persist,
    so a killed run resumes at group granularity — this is how a SINGLE
    4096-step chain runs as e.g. 32 segments in 4 lockstep waves of 8.

    Failure detection & elastic recovery (SURVEY.md §5 — the reference has
    none; a crashed prove loses everything):
      * retries: a segment whose prove RAISES (device OOM, preempted chip,
        transient runtime fault) is retried up to `retries` extra times;
        if `devices` were given, each retry moves to the next device in
        the list, abandoning the suspect chip.
      * verify_each=True re-verifies every segment proof immediately after
        proving — an O(segment) host check that catches SILENT device
        faults (bit flips, bad collectives) at the segment boundary
        instead of at final verification, so only n/K steps are redone.
        A verify failure counts as a failure and triggers the same retry.
      * checkpoint_dir: each finished segment proof is persisted as
        `segment_{k:05d}.json` (safe data-only serialization); a rerun of
        the same job skips segments whose proof file already exists and
        chains correctly — a killed multi-hour prove resumes at the cost
        of one partial segment.  Counters land in
        utils.telemetry.metrics ("segments/proved", "segments/retried",
        "segments/resumed").
    """
    import jax

    n_steps = canon.shape[0]
    assert len(X_host) == n_steps and len(zs) == n_steps + 1
    bounds = split_plan(n_steps, n_segments)

    io_arity = len(zs[0])  # state arity (X rows are [z_out || z_in])
    fp = ivc.shape.field.p

    def _ckpt_path(k: int) -> Optional[str]:
        if checkpoint_dir is None:
            return None
        os.makedirs(checkpoint_dir, exist_ok=True)
        return os.path.join(checkpoint_dir, f"segment_{k:05d}.json")

    def _try_resume(k: int) -> Optional[IVCProof]:
        path = _ckpt_path(k)
        if path is None or not os.path.exists(path):
            return None
        a, b = bounds[k]
        try:
            p = IVCProof.load(path)
            # The file must be THIS job's segment k: right circuit/key,
            # right length, right boundary states. Full verify only when
            # verify_each (resume must stay cheap for the common
            # clean-restart case).
            assert p.pp_digest == ivc.pp_digest, "foreign checkpoint"
            assert p.num_steps == b - a, "wrong segment length"
            assert [v % fp for v in p.z0[:io_arity]] == \
                [v % fp for v in zs[a][:io_arity]], "wrong z0"
            assert [v % fp for v in p.z_final(io_arity)] == \
                [v % fp for v in zs[b][:io_arity]], "wrong z_out"
            if verify_each:
                ivc.verify(p, io_arity=io_arity)
            T.count("segments/resumed")
            if progress:
                print(f"segment {k}: resumed from {path}")
            return p
        except Exception:
            # Stale/foreign/corrupt checkpoint: reprove it.
            return None

    if lockstep:
        assert my_segments is None and devices is None, \
            "lockstep proves all segments on the local device"
        # Per-segment retries are a thread-pool feature; a failed lockstep
        # wave fails the call (checkpointed waves still resume).
        assert retries == 1, "retries require lockstep=False"
        chunk = min(16, max(b - a for a, b in bounds))
        segs: List[Optional[IVCProof]] = [None] * len(bounds)
        todo = []
        for k in range(len(bounds)):
            segs[k] = _try_resume(k)
            if segs[k] is None:
                todo.append(k)
        group = lockstep_group or max(1, len(todo))
        for gi in range(0, len(todo), group):
            ks = todo[gi: gi + group]
            chains = [([v for v in zs[bounds[k][0]]],
                       canon[bounds[k][0]: bounds[k][1]],
                       X_host[bounds[k][0]: bounds[k][1]]) for k in ks]
            with T.span("segments/lockstep_wave",
                        wave=str(gi // group), k=str(len(ks))):
                proofs = ivc.prove_lockstep(chains, chunk_steps=chunk,
                                            progress=progress)
            for k, pk in zip(ks, proofs):
                if verify_each:
                    ivc.verify(pk, io_arity=io_arity)
                path = _ckpt_path(k)
                if path is not None:
                    pk.save(path)
                T.count("segments/proved")
                segs[k] = pk
            if progress:
                print(f"lockstep wave done: segments {ks}")
        assert all(s is not None for s in segs)
        return SegmentedProof(segments=segs)

    todo = list(range(len(bounds))) if my_segments is None \
        else sorted(set(my_segments))
    # Uniform chunk size across segments (sizes differ by <=1): every
    # segment reuses the same compiled batched-phase programs instead of
    # compiling one variant per segment length.
    chunk = min(16, bounds[0][1] - bounds[0][0])

    def prove_one(k: int) -> IVCProof:
        resumed = _try_resume(k)
        if resumed is not None:
            return resumed
        a, b = bounds[k]
        last_err: Optional[BaseException] = None
        for attempt in range(retries + 1):
            seg_canon = canon[a:b]
            if devices:
                # Retry on the NEXT device: abandon the suspect chip.
                dev = devices[(k + attempt) % len(devices)]
                seg_canon = jax.device_put(seg_canon, dev)
            try:
                with T.span("segments/prove_one", segment=str(k)):
                    p = ivc.prove_batch([v for v in zs[a]], seg_canon,
                                        X_host[a:b], chunk_steps=chunk)
                if verify_each:
                    ivc.verify(p, io_arity=io_arity)
                break
            except Exception as e:  # noqa: BLE001 — device faults vary
                last_err = e
                T.count("segments/retried")
                if progress:
                    print(f"segment {k}: attempt {attempt} failed "
                          f"({type(e).__name__}: {e}); "
                          f"{retries - attempt} retries left")
        else:
            raise RuntimeError(
                f"segment {k} failed after {retries + 1} attempts"
            ) from last_err
        path = _ckpt_path(k)
        if path is not None:
            p.save(path)
        T.count("segments/proved")
        if progress:
            print(f"segment {k}: steps [{a},{b}) done")
        return p

    if len(todo) == 1:
        results = {todo[0]: prove_one(todo[0])}
    else:
        # Serial warm-up first: compiling inside the thread pool is unsafe
        # in this jax build — the persistent compile cache's executable
        # (de)serialization SIGSEGVs under concurrency (observed in both
        # the read and write paths). The first segment compiles the shared
        # programs with cache writes enabled; the threaded rest then runs
        # with persistent-cache WRITES suppressed (in-memory jit caching
        # is thread-safe), so any residual per-device compiles never
        # serialize concurrently.
        results = {todo[0]: prove_one(todo[0])}
        key = "jax_persistent_cache_min_compile_time_secs"
        old_min = jax.config.jax_persistent_cache_min_compile_time_secs
        jax.config.update(key, 1e9)
        try:
            with ThreadPoolExecutor(
                    max_workers=max_workers or len(todo)) as ex:
                futs = {k: ex.submit(prove_one, k) for k in todo[1:]}
                results.update({k: f.result() for k, f in futs.items()})
        finally:
            jax.config.update(key, old_min)

    segments: List[Optional[IVCProof]] = [None] * len(bounds)
    for k, p in results.items():
        segments[k] = p
    if my_segments is None:
        assert all(s is not None for s in segments)
    return SegmentedProof(segments=segments)


def verify_segments(ivc: IVC, proof: SegmentedProof,
                    io_arity: int) -> List[int]:
    """Verify every segment and the boundary chaining; returns z_final.

    The caller still checks the statement: proof.z0 against the expected
    initial state and the returned z_final against the expected claim
    (e.g. ChunkProver._check_statement/_check_final)."""
    assert proof.segments, "empty segmented proof"
    p = ivc.shape.field.p
    prev_out: Optional[List[int]] = None
    for k, seg in enumerate(proof.segments):
        assert seg is not None, f"segment {k} missing"
        if prev_out is not None:
            assert [v % p for v in seg.z0[:io_arity]] == prev_out, \
                f"segment {k} does not chain from segment {k - 1}"
        prev_out = [v % p for v in ivc.verify(seg, io_arity=io_arity)]
    return prev_out
