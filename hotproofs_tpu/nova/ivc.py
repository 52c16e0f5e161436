"""IVC driver: fold a chain of step-circuit instances, verify the chain.

Capability equivalent of arecibo's RecursiveSNARK::{new, prove_step, verify}
as used by the reference (rust_fold/src/main.rs:151-193), redesigned for TPU:

  * witness generation is independent of the fold chain (it depends only on
    the hash-chain schedule), so step witnesses, their Az/Bz/Cz and their W
    commitments can all be computed ahead of the sequential fold loop and
    batched/sharded across devices;
  * the sequential part per step is elementwise vector math + ONE full-width
    MSM (comm_T) + a Poseidon challenge;
  * the verifier re-folds instances (host group ops), checks public-IO
    chaining, then checks ONE relaxed-R1CS opening on device.

Proof shape/verifier cost tradeoff vs the reference: this is transparent
folding WITHOUT the in-circuit folding verifier (arecibo's augmented circuit
on a curve cycle), so the proof carries per-step instances — O(n_steps)
verifier group ops instead of O(1). Same knowledge claim, same fold
arithmetic; the succinct wrapper over the folded instance lives in
nova/spartan.py (reference parity: CompressedSNARK, main.rs:260-315).

Checkpoint/resume: ProverCheckpoint captures the tiny running state between
folds (SURVEY.md §5 flags this as the natural elastic-recovery point; the
reference keeps it memory-only). prove_batch takes checkpoint_every/
checkpoint_path and a resume= checkpoint.

Serialization is data-only JSON (nova/serial.py) — never pickle: the verify
path deserializes attacker-supplied files.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import curve as C
from ..ops import field as F
from . import fold as NF
from . import serial
from ..utils import telemetry as T_
from ..utils.config import pallas_msm_enabled
from .pedersen import SMALL_BITS, CommitmentKey
from .r1cs import ShapeDevice, matvec_all, to_mont_vec, witness_to_device
from .transcript import Transcript, digest_of

Affine = NF.Affine


@dataclass
class StepClaim:
    """Strict instance of one step: public IO + witness commitment."""

    X: List[int]          # n_io ints: [z_out || z_in]
    comm_W: Affine


@dataclass
class IVCProof:
    z0: List[int]
    steps: List[StepClaim]
    comm_Ts: List[Affine]
    final_W: List[int]    # opened accumulator witness (canonical ints)
    final_E: List[int]
    pp_digest: int

    @property
    def num_steps(self) -> int:
        return len(self.steps)

    def z_final(self, io_arity: int) -> List[int]:
        return self.steps[-1].X[:io_arity]

    def to_dict(self) -> dict:
        return {
            "z0": serial.enc_ints(self.z0),
            "steps_X": [serial.enc_ints(s.X) for s in self.steps],
            "steps_comm_W": serial.enc_points(
                [s.comm_W for s in self.steps]),
            "comm_Ts": serial.enc_points(self.comm_Ts),
            "final_W": serial.enc_ints(self.final_W),
            "final_E": serial.enc_ints(self.final_E),
            "pp_digest": int(self.pp_digest),
        }

    @staticmethod
    def from_dict(d: dict) -> "IVCProof":
        steps = [StepClaim(X=serial.enc_ints(x), comm_W=serial.dec_point(w))
                 for x, w in zip(d["steps_X"], d["steps_comm_W"])]
        return IVCProof(
            z0=serial.enc_ints(d["z0"]), steps=steps,
            comm_Ts=serial.dec_points(d["comm_Ts"]),
            final_W=serial.enc_ints(d["final_W"]),
            final_E=serial.enc_ints(d["final_E"]),
            pp_digest=int(d["pp_digest"]))

    def save(self, path: str) -> None:
        serial.dump("ivc_proof", self.to_dict(), path)

    @staticmethod
    def load(path: str) -> "IVCProof":
        return IVCProof.from_dict(serial.load("ivc_proof", path))


@dataclass
class ProverCheckpoint:
    """Mid-prove state between folds: resume a chain after interruption.

    Everything is exact ints (the device accumulator converts to canonical
    form on save and back to Montgomery on resume), so checkpoints are
    host-portable and safely JSON-serializable."""

    next_step: int
    z0: List[int]
    steps: List[StepClaim]
    comm_Ts: List[Affine]
    acc_u: int
    acc_X: List[int]
    acc_comm_W: Affine
    acc_comm_E: Affine
    acc_W: List[int]
    acc_E: List[int]
    acc_az: List[int]
    acc_bz: List[int]
    acc_cz: List[int]
    sponge_state: List[int]
    sponge_absorbed: int
    pp_digest: int

    def save(self, path: str) -> None:
        serial.dump("prover_checkpoint", {
            "next_step": self.next_step,
            "z0": serial.enc_ints(self.z0),
            "steps_X": [serial.enc_ints(s.X) for s in self.steps],
            "steps_comm_W": serial.enc_points(
                [s.comm_W for s in self.steps]),
            "comm_Ts": serial.enc_points(self.comm_Ts),
            "acc_u": int(self.acc_u),
            "acc_X": serial.enc_ints(self.acc_X),
            "acc_comm_W": serial.enc_point(self.acc_comm_W),
            "acc_comm_E": serial.enc_point(self.acc_comm_E),
            "acc_W": serial.enc_ints(self.acc_W),
            "acc_E": serial.enc_ints(self.acc_E),
            "acc_az": serial.enc_ints(self.acc_az),
            "acc_bz": serial.enc_ints(self.acc_bz),
            "acc_cz": serial.enc_ints(self.acc_cz),
            "sponge_state": serial.enc_ints(self.sponge_state),
            "sponge_absorbed": int(self.sponge_absorbed),
            "pp_digest": int(self.pp_digest),
        }, path)

    @staticmethod
    def load(path: str) -> "ProverCheckpoint":
        d = serial.load("prover_checkpoint", path)
        steps = [StepClaim(X=serial.enc_ints(x), comm_W=serial.dec_point(w))
                 for x, w in zip(d["steps_X"], d["steps_comm_W"])]
        return ProverCheckpoint(
            next_step=int(d["next_step"]),
            z0=serial.enc_ints(d["z0"]), steps=steps,
            comm_Ts=serial.dec_points(d["comm_Ts"]),
            acc_u=int(d["acc_u"]), acc_X=serial.enc_ints(d["acc_X"]),
            acc_comm_W=serial.dec_point(d["acc_comm_W"]),
            acc_comm_E=serial.dec_point(d["acc_comm_E"]),
            acc_W=serial.enc_ints(d["acc_W"]),
            acc_E=serial.enc_ints(d["acc_E"]),
            acc_az=serial.enc_ints(d["acc_az"]),
            acc_bz=serial.enc_ints(d["acc_bz"]),
            acc_cz=serial.enc_ints(d["acc_cz"]),
            sponge_state=serial.enc_ints(d["sponge_state"]),
            sponge_absorbed=int(d["sponge_absorbed"]),
            pp_digest=int(d["pp_digest"]))


class IVC:
    """Prover/verifier pair bound to one step-circuit shape + key."""

    def __init__(self, shape: ShapeDevice, curve: C.CurveSpec,
                 ck: CommitmentKey, big_wit_idx: Optional[np.ndarray] = None,
                 label: bytes = b"ivc", pspec=None):
        """big_wit_idx: witness positions that may exceed 2^SMALL_BITS.
        None disables the small-scalar fast path (all commits full-width);
        an array enables it — every commit then runs a device-side range
        check that the remaining witness values fit SMALL_BITS (a silent
        high-window truncation would produce a wrong commitment).

        pspec: explicit Poseidon transcript spec (ops/poseidon.PoseidonSpec).
        None selects the process-wide spec (HOTPROOFS_POSEIDON); a vk-loaded
        verifier passes the vk's recorded parameterisation (nova/vk.py)."""
        assert curve.scalar.p == shape.field.p, \
            "commitment curve group order must equal circuit field"
        self.shape = shape
        self.curve = curve
        self.ck = ck
        self.big_wit_idx = big_wit_idx
        self.label = label
        self.pspec = pspec
        # Bind the FULL shape: values AND sparsity patterns of all three
        # matrices, plus dimensions (two circuits differing only in B/C
        # structure must not share a digest) — AND the Fiat-Shamir sponge
        # parameterisation (t, R_F, R_P): a vk that degraded the round
        # numbers (near-linear permutation -> grindable challenges) must
        # not reproduce an honest pp digest (round-4 advisor finding).
        if pspec is not None:
            ps_params = (pspec.t, pspec.r_full, pspec.r_partial)
        else:
            from .transcript import transcript_poseidon_params
            ps_params = transcript_poseidon_params(shape.field.name)
        self.pp_digest = digest_of(
            label,
            np.asarray([shape.n_cons, shape.n_vars, shape.n_io],
                       np.int64).tobytes(),
            np.asarray(ps_params, np.int64).tobytes(),
            *[np.asarray(part).tobytes()
              for m in (shape.A, shape.B, shape.C)
              for part in (m.rows, m.cols, m.vals_mont)],
            ck.gens_affine.tobytes(),
        ) % shape.field.p
        self._jit_cache = {}

    # -- device helpers -----------------------------------------------------
    def _scalar_mont(self, v: int) -> jnp.ndarray:
        spec = self.shape.field
        return jnp.asarray(F.int_to_limbs(v % spec.p * spec.r_mod_p % spec.p))

    def _jit(self, name, fn):
        if name not in self._jit_cache:
            self._jit_cache[name] = jax.jit(fn)
        return self._jit_cache[name]

    def _new_transcript(self, z0: Sequence[int]) -> Transcript:
        spec = self.shape.field
        tr = Transcript(spec.name + "", self.label, self.pp_digest,
                        pspec=self.pspec)
        tr.absorb_scalars([v % spec.p for v in z0])
        return tr

    @staticmethod
    def _fold_challenge_prefix(tr: Transcript, acc_inst, X_i,
                               comm_W) -> None:
        """Everything the fold challenge absorbs EXCEPT comm_T. The prefix
        is known before the comm_T MSM finishes, so the pipelined prover
        hashes it while the device is still computing (the only absorb that
        has to wait for the device sync is comm_T itself)."""
        tr.absorb_scalar(acc_inst.u)
        tr.absorb_scalars(acc_inst.X)
        tr.absorb_point(acc_inst.comm_W)
        tr.absorb_point(acc_inst.comm_E)
        tr.absorb_scalars(X_i)
        tr.absorb_point(comm_W)

    @staticmethod
    def _fold_challenge(tr: Transcript, acc_inst, X_i, comm_W,
                        comm_T) -> int:
        """One fold's Fiat–Shamir absorb sequence (prover == verifier)."""
        IVC._fold_challenge_prefix(tr, acc_inst, X_i, comm_W)
        tr.absorb_point(comm_T)
        return tr.challenge()

    # -- commit-path selection (pallas fused MSM on TPU, XLA elsewhere) ------
    def _commT_setup(self):
        """(fn, args) with fn(t_canon, *args) -> projective comm_T point.
        args are DEVICE OPERANDS (pre-scaled bases), threaded as runtime
        arguments so they are never baked into jitted programs."""
        n = self.shape.n_cons
        if pallas_msm_enabled():
            return self.ck.commit_pallas_fn(n, 256), self.ck.scaled_tm(n, 256)
        return self.ck.commit_fn(n, max_bits=256), (self.ck.scaled(n, 256),)

    def _commW_setup_xla(self):
        """(fn, args) for per-step witness commits on the XLA path
        (small-scalar split when big_wit_idx is set)."""
        n = self.shape.n_wit
        if self.big_wit_idx is None:
            return (self.ck.commit_fn(n, max_bits=256),
                    (self.ck.scaled(n, 256),))
        return (self.ck.commit_split_fn(n, self.big_wit_idx),
                (self.ck.scaled(n, SMALL_BITS),))

    def _commit_T_pl(self, t_canon) -> C.Point:
        """Cross-term commit via the standalone pallas MSM program (shared
        across the whole process — embedding it into fused programs would
        cost another multi-minute TPU compile per embedding). Output limbs
        are CANONICAL (from-Mont runs inside the program): the per-fold
        sync then uses pt_to_affine_host_canon, zero extra dispatches
        (each pt_to_affine_host dispatch measured ~185 ms through this
        environment's compile relay — tools/profile_lockstep_phases.py)."""
        return self.ck.commit_pallas(t_canon, 256, canonical=True)

    def _commit_W_steps_pl(self, w_batch) -> C.Point:
        """W commits of a (J, n_wit, 32) canonical batch as ONE batched
        pallas MSM dispatch (msm_pallas_many); returns stacked CANONICAL
        projective (J, 32) x3 (see _commit_T_pl on why canonical). Round 3
        dispatched J standalone programs here; profiling found ~27 ms fixed
        overhead per dispatch (profile_msm_phases.py), so one J-job program
        saves (J-1) x 27 ms per chunk."""
        if self.big_wit_idx is None:
            return self.ck.commit_many_pallas(w_batch, 256, canonical=True)
        return self.ck.commit_many_split_pallas(w_batch, self.big_wit_idx,
                                                canonical=True)

    def _finish_proof(self, z0, steps, comm_Ts, acc_dev) -> IVCProof:
        spec = self.shape.field
        from_mont_j = F.jitted("from_mont", spec)
        final_W = [int(v) for v in spec.limbs_to_ints(
            np.asarray(from_mont_j(acc_dev.W)))]
        final_E = [int(v) for v in spec.limbs_to_ints(
            np.asarray(from_mont_j(acc_dev.E)))]
        return IVCProof(z0=list(z0), steps=steps, comm_Ts=comm_Ts,
                        final_W=final_W, final_E=final_E,
                        pp_digest=self.pp_digest)

    # -- proving ------------------------------------------------------------
    def prove(self, z0: Sequence[int],
              witnesses: Iterable[np.ndarray],
              progress: bool = False) -> IVCProof:
        """Fold the chain. `witnesses` yields full DSL witness vectors
        ([1, z_out, z_in, priv..., aux...] object ints) in step order."""
        shape, spec, curve = self.shape, self.shape.field, self.curve
        n_io = shape.n_io
        acc_dev, acc_inst = NF.empty_accumulator(shape)
        tr = self._new_transcript(z0)

        matvec_j = self._jit("matvec", lambda z: matvec_all(shape, z))
        to_mont_j = F.jitted("to_mont", spec)
        from_mont_j = F.jitted("from_mont", spec)
        cross_j = self._jit(
            "cross", lambda acc, az, bz, cz, u: NF.cross_term(
                spec, acc, az, bz, cz, u))
        foldw_j = self._jit(
            "foldw", lambda acc, W2, az, bz, cz, T, r: NF.fold_witness(
                spec, acc, W2, az, bz, cz, T, r))

        steps: List[StepClaim] = []
        comm_Ts: List[Affine] = []
        for i, w_ints in enumerate(witnesses):
            canon = witness_to_device(spec, w_ints)
            X_i = [int(v) % spec.p for v in w_ints[1: 1 + n_io]]
            W_canon = canon[1 + n_io:]
            z_mont = to_mont_j(canon)
            az, bz, cz = matvec_j(z_mont)
            if self.big_wit_idx is None:
                comm_W_dev = self.ck.commit(W_canon, max_bits=256)
            else:
                comm_W_dev = self.ck.commit_split(W_canon, self.big_wit_idx)
            comm_W = C.pt_to_affine_host(
                curve, tuple(x[None] for x in comm_W_dev))[0]

            u_mont = self._scalar_mont(acc_inst.u)
            T = cross_j(acc_dev, az, bz, cz, u_mont)
            comm_T_dev = self.ck.commit(from_mont_j(T), max_bits=256)
            comm_T = C.pt_to_affine_host(
                curve, tuple(x[None] for x in comm_T_dev))[0]

            r = self._fold_challenge(tr, acc_inst, X_i, comm_W, comm_T)

            r_mont = self._scalar_mont(r)
            W_mont = to_mont_j(W_canon)
            acc_dev = foldw_j(acc_dev, W_mont, az, bz, cz, T, r_mont)
            acc_inst = NF.fold_instance(spec, curve, acc_inst, X_i,
                                        comm_W, comm_T, r)
            steps.append(StepClaim(X=X_i, comm_W=comm_W))
            comm_Ts.append(comm_T)
            if progress:
                print(f"fold step {i}: done")

        return self._finish_proof(z0, steps, comm_Ts, acc_dev)

    # -- batched fast path --------------------------------------------------
    def prove_batch(self, z0: Sequence[int], canon_batch,
                    X_host: List[List[int]], chunk_steps: int = 16,
                    progress: bool = False,
                    checkpoint_path: Optional[str] = None,
                    checkpoint_every: int = 0,
                    resume: Optional[ProverCheckpoint] = None,
                    mesh=None) -> IVCProof:
        """Fold a chain whose witnesses are already device-resident.

        canon_batch: (N, n_vars, 32) canonical limb array (e.g. from the
        batched witness generator); X_host: per-step public IO as ints.
        Phases per chunk of steps: batched to-Montgomery + batched SpMVs +
        batched W-commits (all independent of the fold), then the sequential
        fold loop touches only precomputed tensors + one comm_T MSM per step.

        checkpoint_every > 0 writes a ProverCheckpoint to checkpoint_path
        every that-many folds; resume= continues from a loaded checkpoint
        (canon_batch/X_host must be the same full chain).

        mesh: optional jax.sharding.Mesh with axes ("step", "msm") — W
        commits shard the step batch over `step`, the per-fold comm_T MSM
        shards its points over `msm` (SURVEY.md §2c; the same proof bytes
        come out regardless of the mesh).
        """
        import jax

        shape, spec, curve = self.shape, self.shape.field, self.curve
        n_io = shape.n_io
        n_steps = canon_batch.shape[0]
        to_mont_j = F.jitted("to_mont", spec)
        from_mont_j = F.jitted("from_mont", spec)

        if resume is None:
            acc_dev, acc_inst = NF.empty_accumulator(shape)
            tr = self._new_transcript(z0)
            steps: List[StepClaim] = []
            comm_Ts: List[Affine] = []
            start = 0
        else:
            assert resume.pp_digest == self.pp_digest, \
                "checkpoint is for a different circuit/key"
            acc_dev = NF.AccumulatorDevice(
                W=to_mont_j(jnp.asarray(spec.batch_to_limbs(resume.acc_W))),
                E=to_mont_j(jnp.asarray(spec.batch_to_limbs(resume.acc_E))),
                az=to_mont_j(jnp.asarray(spec.batch_to_limbs(resume.acc_az))),
                bz=to_mont_j(jnp.asarray(spec.batch_to_limbs(resume.acc_bz))),
                cz=to_mont_j(jnp.asarray(spec.batch_to_limbs(resume.acc_cz))),
            )
            acc_inst = NF.AccumulatorInstance(
                u=resume.acc_u, X=list(resume.acc_X),
                comm_W=resume.acc_comm_W, comm_E=resume.acc_comm_E)
            tr = self._new_transcript(z0)
            tr.sponge.state = [v % spec.p for v in resume.sponge_state]
            tr.sponge._absorbed = resume.sponge_absorbed
            steps = list(resume.steps)
            comm_Ts = list(resume.comm_Ts)
            start = resume.next_step
            assert start == len(steps) == len(comm_Ts), "corrupt checkpoint"

        cross_j = self._jit(
            "cross", lambda acc, az, bz, cz, u: NF.cross_term(
                spec, acc, az, bz, cz, u))
        foldw_j = self._jit(
            "foldw", lambda acc, W2, az, bz, cz, T, r: NF.fold_witness(
                spec, acc, W2, az, bz, cz, T, r))
        # ONE device launch per fold: apply the PREVIOUS step's fold (its
        # challenge r only became known after that step's comm_T synced),
        # then compute and commit this step's cross-term. While the device
        # runs, the host folds the previous instance (EC scalar mults) and
        # hashes this step's transcript prefix — per-launch latency and
        # host work hide behind the MSM instead of serializing with it.
        use_pl = pallas_msm_enabled()
        if mesh is not None:
            # prove_batch's mesh strategy is ONE chain with point-sharded
            # XLA MSMs; the pallas fast path scales across chips via
            # chain-per-chip lockstep instead (prove_lockstep(mesh=...)).
            assert not use_pl, \
                "prove_batch(mesh=...) is the point-sharded XLA path " \
                "(set HOTPROOFS_PALLAS_MSM=0); for the pallas fast path " \
                "use prove_lockstep(mesh=...) — chain-per-chip sharding"
        if use_pl:
            # Pallas path: the fused program folds + computes the cross
            # term; the commit dispatches the SHARED standalone MSM program
            # (embedding it here would cost another multi-minute compile).
            def _fused(acc, pW2, paz, pbz, pcz, pT, r_prev, az, bz, cz, u):
                acc = NF.fold_witness(spec, acc, pW2, paz, pbz, pcz, pT,
                                      r_prev)
                T = NF.cross_term(spec, acc, az, bz, cz, u)
                return acc, T, F.from_mont(spec, T)

            fused_j = self._jit("fused_fold_step_pl", _fused)
            commT_args = ()
        else:
            commitT_fn, commT_args = self._commT_setup()

            def _fused(acc, pW2, paz, pbz, pcz, pT, r_prev, az, bz, cz, u,
                       *cargs):
                acc = NF.fold_witness(spec, acc, pW2, paz, pbz, pcz, pT,
                                      r_prev)
                T = NF.cross_term(spec, acc, az, bz, cz, u)
                comm_T = commitT_fn(F.from_mont(spec, T), *cargs)
                return acc, T, comm_T

            fused_j = self._jit("fused_fold_step", _fused)
        matvec_b = self._jit(
            "matvec_batch", jax.vmap(lambda z: matvec_all(shape, z)))
        if self.big_wit_idx is not None:
            big = jnp.asarray(self.big_wit_idx.astype(np.int32))
            check_small_b = self._jit(
                "check_small_batch",
                lambda w: jnp.all(w.at[:, big, :].set(0)
                                  [..., SMALL_BITS // F.LIMB_BITS:] == 0))
        commT_j = None
        if use_pl:
            commit_b = None
        elif mesh is None:
            commW_fn, commW_args = self._commW_setup_xla()
            commit_b = self._jit(
                "commitW_batch", jax.vmap(commW_fn, in_axes=(0, None)))
        else:
            commW_fn, commW_args = self._commW_setup_xla()
            one_commit, (scaled_W,) = commW_fn, commW_args
            from jax.sharding import PartitionSpec as P
            from jax.experimental.shard_map import shard_map
            from ..parallel.msm_sharded import msm_sharded

            step_size = mesh.shape["step"]
            msm_size = mesh.shape["msm"]
            assert chunk_steps % step_size == 0, \
                f"chunk_steps {chunk_steps} must divide by step axis " \
                f"{step_size}"
            commit_b = self._jit(
                ("commitW_mesh", step_size),
                shard_map(jax.vmap(one_commit, in_axes=(0, None)),
                          mesh=mesh,
                          in_specs=(P("step"), (P(), P(), P())),
                          out_specs=(P("step"), P("step"), P("step")),
                          check_rep=False))
            # comm_T: ONE MSM with points sharded along the msm axis.
            n_pad = -(-shape.n_cons // msm_size) * msm_size
            pts = tuple(p[:shape.n_cons] for p in self.ck.points)
            scaled = self.ck.scaled(shape.n_cons, 256)
            if n_pad > shape.n_cons:
                extra = n_pad - shape.n_cons
                ident = C.identity_for(curve, (extra,))
                pts = tuple(jnp.concatenate([x, i], axis=0)
                            for x, i in zip(pts, ident))
                identw = C.identity_for(
                    curve, (scaled[0].shape[0], extra))
                scaled = tuple(jnp.concatenate([x, i], axis=1)
                               for x, i in zip(scaled, identw))

            # Points/scaled gens are runtime args, never closures (closure
            # capture would bake ~400MB of constants into the program).
            def _comm_T_mesh(t_canon, pts_, scaled_):
                t_pad = jnp.concatenate(
                    [t_canon, jnp.zeros((n_pad - shape.n_cons, F.N_LIMBS),
                                        jnp.int32)], axis=0)
                return msm_sharded(curve, mesh, t_pad, pts_,
                                   max_bits=256, scaled=scaled_)

            _commT_fn = self._jit(("commT_mesh", msm_size), _comm_T_mesh)
            commT_j = lambda t, _p=pts, _s=scaled: _commT_fn(t, _p, _s)

        def _checkpoint(next_step: int) -> ProverCheckpoint:
            ints = lambda a: [int(v) for v in spec.limbs_to_ints(
                np.asarray(from_mont_j(a)))]
            return ProverCheckpoint(
                next_step=next_step, z0=list(z0), steps=list(steps),
                comm_Ts=list(comm_Ts), acc_u=acc_inst.u,
                acc_X=list(acc_inst.X), acc_comm_W=acc_inst.comm_W,
                acc_comm_E=acc_inst.comm_E,
                acc_W=ints(acc_dev.W), acc_E=ints(acc_dev.E),
                acc_az=ints(acc_dev.az), acc_bz=ints(acc_dev.bz),
                acc_cz=ints(acc_dev.cz),
                sponge_state=list(tr.sponge.state),
                sponge_absorbed=tr.sponge._absorbed,
                pp_digest=self.pp_digest)

        # Pipeline state: the fold of step i-1 is PENDING until launch i
        # applies it on device (its r was only known after comm_T_{i-1}
        # synced). pend holds everything that fold needs.
        pend = None
        zeros_wit = jnp.zeros((shape.n_wit, F.N_LIMBS), jnp.int32)
        zeros_cons = jnp.zeros((shape.n_cons, F.N_LIMBS), jnp.int32)
        zeros_r = jnp.zeros((F.N_LIMBS,), jnp.int32)

        def _flush_pending():
            """Apply the pending fold (device + host instance)."""
            nonlocal acc_dev, acc_inst, pend
            if pend is None:
                return
            acc_dev = foldw_j(acc_dev, pend["W2"], pend["az"], pend["bz"],
                              pend["cz"], pend["T"], pend["r_mont"])
            acc_inst = NF.fold_instance(spec, curve, acc_inst, pend["X"],
                                        pend["comm_W"], pend["comm_T"],
                                        pend["r"])
            pend = None

        done = start
        while done < n_steps:
            take = min(chunk_steps, n_steps - done)
            sl = canon_batch[done: done + take]
            if take < chunk_steps:  # pad to the jitted chunk shape
                pad = jnp.zeros((chunk_steps - take,) + sl.shape[1:],
                                sl.dtype)
                sl = jnp.concatenate([sl, pad], axis=0)
            if self.big_wit_idx is not None:
                assert bool(check_small_b(sl[:, 1 + n_io:, :])), \
                    f"witness value >= 2^{SMALL_BITS} outside big_wit_idx " \
                    "(would truncate in the small-MSM fast path)"
            z_mont = to_mont_j(sl)
            az_b, bz_b, cz_b = matvec_b(z_mont)
            if use_pl:
                comm_W_b = self._commit_W_steps_pl(sl[:, 1 + n_io:, :])
                comm_W_aff = C.pt_to_affine_host_canon(curve, comm_W_b)
            else:
                comm_W_b = commit_b(sl[:, 1 + n_io:, :], *commW_args)
                comm_W_aff = C.pt_to_affine_host(curve, comm_W_b)

            for k in range(take):
                i = done + k
                X_i = [v % spec.p for v in X_host[i]]
                az, bz, cz = az_b[k], bz_b[k], cz_b[k]
                comm_W = comm_W_aff[k]

                if commT_j is not None:
                    # Mesh path: unfused (shard_map MSM is its own program).
                    _flush_pending()
                    u_mont = self._scalar_mont(acc_inst.u)
                    T = cross_j(acc_dev, az, bz, cz, u_mont)
                    comm_T_dev = commT_j(from_mont_j(T))
                else:
                    # u after the pending fold is u + r (host scalar math);
                    # the full EC instance fold happens while the device
                    # runs the fused program.
                    u_next = acc_inst.u if pend is None else \
                        (acc_inst.u + pend["r"]) % spec.p
                    if pend is None:
                        pW2, paz, pbz, pcz = (zeros_wit, zeros_cons,
                                              zeros_cons, zeros_cons)
                        pT, pr = zeros_cons, zeros_r
                    else:
                        pW2, paz, pbz, pcz = (pend["W2"], pend["az"],
                                              pend["bz"], pend["cz"])
                        pT, pr = pend["T"], pend["r_mont"]
                    acc_dev, T, last = fused_j(
                        acc_dev, pW2, paz, pbz, pcz, pT, pr,
                        az, bz, cz, self._scalar_mont(u_next), *commT_args)
                    comm_T_dev = self._commit_T_pl(last) if use_pl else last
                    if pend is not None:  # host EC fold overlaps the MSM
                        acc_inst = NF.fold_instance(
                            spec, curve, acc_inst, pend["X"],
                            pend["comm_W"], pend["comm_T"], pend["r"])
                        pend = None

                self._fold_challenge_prefix(tr, acc_inst, X_i, comm_W)
                aff1 = (C.pt_to_affine_host_canon if use_pl
                        else C.pt_to_affine_host)
                comm_T = aff1(
                    curve, tuple(x[None] for x in comm_T_dev))[0]   # sync
                tr.absorb_point(comm_T)
                r = tr.challenge()

                if commT_j is not None:
                    r_mont = self._scalar_mont(r)
                    acc_dev = foldw_j(acc_dev, z_mont[k, 1 + n_io:],
                                      az, bz, cz, T, r_mont)
                    acc_inst = NF.fold_instance(spec, curve, acc_inst, X_i,
                                                comm_W, comm_T, r)
                else:
                    pend = {"W2": z_mont[k, 1 + n_io:], "az": az, "bz": bz,
                            "cz": cz, "T": T,
                            "r_mont": self._scalar_mont(r), "r": r,
                            "X": X_i, "comm_W": comm_W, "comm_T": comm_T}
                steps.append(StepClaim(X=X_i, comm_W=comm_W))
                comm_Ts.append(comm_T)
                if (checkpoint_every and checkpoint_path
                        and (i + 1) % checkpoint_every == 0
                        and i + 1 < n_steps):
                    _flush_pending()
                    _checkpoint(i + 1).save(checkpoint_path)
            T_.count("ivc/folds", take)
            done += take
            if progress:
                print(f"folded {done}/{n_steps} steps")

        _flush_pending()
        return self._finish_proof(z0, steps, comm_Ts, acc_dev)

    # -- lockstep multi-chain fast path --------------------------------------
    def prove_lockstep(self, chains, chunk_steps: int = 16,
                       progress: bool = False,
                       mesh=None, mesh_axis: str = "chain"
                       ) -> List[IVCProof]:
        """Fold K independent chains in LOCKSTEP on one device.

        chains: list of (z0, canon (N_k, n_vars, 32), X_host) triples —
        exactly prove_batch's inputs, K times. Chains may have different
        lengths (shorter chains fold with r=0 no-ops once finished).

        Why this exists: round-1/2 TPU measurements (docs/ROADMAP.md) show
        the per-fold cost is bound by SEQUENTIAL LAUNCH DEPTH of the comm_T
        MSM (~1-2 ms per XLA while-loop step regardless of width), not by
        arithmetic. vmapping the fused fold+cross-term+comm_T program over a
        chain axis makes every sequential step K× wider at ~the same wall
        time, so aggregate folds/s scales ~K× on one chip. This is the TPU
        answer to the reference's strictly sequential prove loop
        (rust_fold/src/main.rs:166-179): chains are independent (different
        chunks, or segments of one long chain — parallel/segments.py), and
        each keeps its own Fiat–Shamir transcript, so the K proofs are
        BIT-IDENTICAL to K separate prove_batch runs.

        mesh: optional Mesh with a `mesh_axis` axis — CHAIN-PER-CHIP
        sharding (SURVEY.md §2c): the K-job batched pallas MSMs and the
        K-wide fused fold shard the chain axis across devices, each device
        owning K/D whole chains against replicated bases. This is the
        official multi-chip strategy for the pallas fast path (the
        point-sharded XLA MSM of prove_batch(mesh=...) is the alternative
        for K=1); proof bytes are mesh-independent.
        """
        shape, spec, curve = self.shape, self.shape.field, self.curve
        n_io = shape.n_io
        K = len(chains)
        assert K >= 1
        lens = [c[1].shape[0] for c in chains]
        n_max = max(lens)
        to_mont_j = F.jitted("to_mont", spec)

        acc_dev = NF.AccumulatorDevice(
            W=jnp.zeros((K, shape.n_wit, F.N_LIMBS), jnp.int32),
            E=jnp.zeros((K, shape.n_cons, F.N_LIMBS), jnp.int32),
            az=jnp.zeros((K, shape.n_cons, F.N_LIMBS), jnp.int32),
            bz=jnp.zeros((K, shape.n_cons, F.N_LIMBS), jnp.int32),
            cz=jnp.zeros((K, shape.n_cons, F.N_LIMBS), jnp.int32))
        acc_insts = [NF.AccumulatorInstance(u=0, X=[0] * n_io)
                     for _ in range(K)]
        trs = [self._new_transcript(c[0]) for c in chains]
        steps_k: List[List[StepClaim]] = [[] for _ in range(K)]
        comm_Ts_k: List[List[Affine]] = [[] for _ in range(K)]

        use_pl = pallas_msm_enabled()
        if mesh is not None:
            assert use_pl, \
                "mesh lockstep is the pallas chain-per-chip path " \
                "(HOTPROOFS_PALLAS_MSM); use prove_batch(mesh=...) for " \
                "the point-sharded XLA MSM"
            D = mesh.shape[mesh_axis]
            assert K % D == 0, f"K={K} must divide by mesh axis {D}"
        if use_pl:
            # Pallas path: the fused fold+cross-term is K-wide vmapped;
            # the K comm_T MSMs run as ONE K-job batched pallas dispatch
            # (commit_many_pallas), sharded chain-per-chip when a mesh is
            # given.
            def _fused(acc, pW2, paz, pbz, pcz, pT, r_prev, az, bz, cz, u):
                acc = NF.fold_witness(spec, acc, pW2, paz, pbz, pcz, pT,
                                      r_prev)
                T = NF.cross_term(spec, acc, az, bz, cz, u)
                return acc, T, F.from_mont(spec, T)

            if mesh is None:
                fused_v = self._jit(("fused_lockstep_pl", K),
                                    jax.vmap(_fused, in_axes=(0,) * 11))
            else:
                from jax.sharding import NamedSharding
                from jax.sharding import PartitionSpec as PS
                ksh = NamedSharding(mesh, PS(mesh_axis))
                mkey = ("fused_lockstep_pl_mesh", K, id(mesh))
                if mkey not in self._jit_cache:
                    self._jit_cache[mkey] = jax.jit(
                        jax.vmap(_fused, in_axes=(0,) * 11),
                        in_shardings=(ksh,) * 11, out_shardings=ksh)
                fused_v = self._jit_cache[mkey]
            commT_args = ()
        else:
            commitT_fn, commT_args = self._commT_setup()

            def _fused(acc, pW2, paz, pbz, pcz, pT, r_prev, az, bz, cz, u,
                       *cargs):
                acc = NF.fold_witness(spec, acc, pW2, paz, pbz, pcz, pT,
                                      r_prev)
                T = NF.cross_term(spec, acc, az, bz, cz, u)
                comm_T = commitT_fn(F.from_mont(spec, T), *cargs)
                return acc, T, comm_T

            fused_v = self._jit(
                ("fused_lockstep", K),
                jax.vmap(_fused,
                         in_axes=(0,) * 11 + (None,) * len(commT_args)))
        foldw_v = self._jit(
            ("foldw_lockstep", K),
            jax.vmap(lambda acc, W2, az, bz, cz, T, r: NF.fold_witness(
                spec, acc, W2, az, bz, cz, T, r), in_axes=(0,) * 7))
        matvec_b = self._jit(
            "matvec_batch", jax.vmap(lambda z: matvec_all(shape, z)))
        if self.big_wit_idx is not None:
            big = jnp.asarray(self.big_wit_idx.astype(np.int32))
            check_small_b = self._jit(
                "check_small_batch",
                lambda w: jnp.all(w.at[:, big, :].set(0)
                                  [..., SMALL_BITS // F.LIMB_BITS:] == 0))
        if not use_pl:
            commW_fn, commW_args = self._commW_setup_xla()
            commit_b = self._jit(
                "commitW_batch", jax.vmap(commW_fn, in_axes=(0, None)))

        zeros_chunk = jnp.zeros((1, shape.n_vars, F.N_LIMBS), jnp.int32)
        zeros_r = jnp.zeros((K, F.N_LIMBS), jnp.int32)
        zeros_W2 = jnp.zeros((K, shape.n_wit, F.N_LIMBS), jnp.int32)
        zeros_cons = jnp.zeros((K, shape.n_cons, F.N_LIMBS), jnp.int32)

        # pend: the previous launch's stacked tensors — its folds (where
        # live) are applied on DEVICE by the next launch and on HOST while
        # that launch runs. pend_meta[c] is None for chains that were not
        # live at that step.
        pend = None
        pend_meta: List[Optional[dict]] = [None] * K

        def _stack_r():
            rows = np.zeros((K, F.N_LIMBS), np.int32)
            for c in range(K):
                if pend_meta[c] is not None:
                    r = pend_meta[c]["r"]
                    rows[c] = F.int_to_limbs(r % spec.p * spec.r_mod_p
                                             % spec.p)
            return jnp.asarray(rows)

        def _host_fold_pending():
            for c in range(K):
                m = pend_meta[c]
                if m is not None:
                    acc_insts[c] = NF.fold_instance(
                        spec, curve, acc_insts[c], m["X"], m["comm_W"],
                        m["comm_T"], m["r"])
                    pend_meta[c] = None

        done = 0
        while done < n_max:
            take = min(chunk_steps, n_max - done)
            # Stack chain slices -> (K, chunk, n_vars, 32), zero-padded for
            # finished chains and for the tail of the chunk (a zero witness
            # is harmless: its fold is masked by r=0 and its claims are
            # never recorded).
            rows = []
            for c in range(K):
                a = min(done, lens[c])
                b = min(done + take, lens[c])
                # Slice BEFORE device transfer: chains[c][1] may be a large
                # host array (512-step segments of a 4096-step chain are
                # ~1 GB each) — uploading only the chunk slice keeps H2D
                # traffic at one copy of the witness data total.
                part = jnp.asarray(chains[c][1][a:b])
                n_pad = chunk_steps - (b - a)
                if n_pad:
                    part = jnp.concatenate(
                        [part, jnp.broadcast_to(
                            zeros_chunk, (n_pad,) + part.shape[1:])], axis=0)
                rows.append(part)
            # Batched phases run PER CHAIN at prove_batch's chunk width:
            # the mont-mul digit convolution inside matvec materializes an
            # (batch, nnz, 32, 32) intermediate, so a K*chunk-row flat
            # batch scales peak HBM by K (K=8 -> 24 GB, past a v5e's 16 GB
            # — observed AOT-compile OOM). These phases are throughput-
            # bound, not launch-bound; only the per-step fused fold below
            # needs the K-wide vmap.
            zm_rows, az_rows, bz_rows, cz_rows = [], [], [], []
            for c in range(K):
                part = rows[c]
                if self.big_wit_idx is not None:
                    assert bool(check_small_b(part[:, 1 + n_io:, :])), \
                        f"witness value >= 2^{SMALL_BITS} outside " \
                        "big_wit_idx"
                zm = to_mont_j(part)
                a_c, b_c, c_c = matvec_b(zm)
                zm_rows.append(zm)
                az_rows.append(a_c)
                bz_rows.append(b_c)
                cz_rows.append(c_c)
            z_mont = jnp.stack(zm_rows)             # (K, chunk, n_vars, 32)
            az_b = jnp.stack(az_rows)
            bz_b = jnp.stack(bz_rows)
            cz_b = jnp.stack(cz_rows)
            # ALL K chains' W commits for the chunk in ONE batched MSM
            # dispatch (K*chunk jobs over the shared base array), then one
            # blocking affine conversion.
            w_all = jnp.stack([rows[c][:, 1 + n_io:, :] for c in range(K)])
            w_jobs = w_all.reshape(K * chunk_steps, shape.n_wit, F.N_LIMBS)
            if use_pl and mesh is not None:
                cw_flat = self.ck.commit_many_pallas_mesh(
                    w_jobs, mesh, axis=mesh_axis, canonical=True,
                    big_idx=self.big_wit_idx)
                aff_flat = C.pt_to_affine_host_canon(curve, cw_flat)
            elif use_pl:
                cw_flat = self._commit_W_steps_pl(w_jobs)
                aff_flat = C.pt_to_affine_host_canon(curve, cw_flat)
            else:
                cw_flat = commit_b(w_jobs, *commW_args)
                aff_flat = C.pt_to_affine_host(curve, cw_flat)
            commW_aff = [aff_flat[c * chunk_steps: (c + 1) * chunk_steps]
                         for c in range(K)]

            for k in range(take):
                i = done + k
                live = [c for c in range(K) if i < lens[c]]
                if not live:
                    break
                # u after the pending fold is u + r (host scalar math).
                u_rows = np.zeros((K, F.N_LIMBS), np.int32)
                for c in range(K):
                    u = acc_insts[c].u
                    if pend_meta[c] is not None:
                        u = (u + pend_meta[c]["r"]) % spec.p
                    u_rows[c] = F.int_to_limbs(u * spec.r_mod_p % spec.p)
                if pend is None:
                    pW2, paz, pbz, pcz = (zeros_W2, zeros_cons,
                                          zeros_cons, zeros_cons)
                    pT, pr = zeros_cons, zeros_r
                else:
                    pW2, paz, pbz, pcz, pT = pend
                    pr = _stack_r()
                acc_dev, T, last = fused_v(
                    acc_dev, pW2, paz, pbz, pcz, pT, pr,
                    az_b[:, k], bz_b[:, k], cz_b[:, k],
                    jnp.asarray(u_rows), *commT_args)
                if use_pl and mesh is not None:
                    comm_T_dev = self.ck.commit_many_pallas_mesh(
                        last, mesh, 256, axis=mesh_axis, canonical=True)
                elif use_pl:
                    # ONE K-job MSM dispatch (VERDICT r03 #1): round 3
                    # dispatched K standalone comm_T programs per step.
                    comm_T_dev = self.ck.commit_many_pallas(last, 256,
                                                            canonical=True)
                else:
                    comm_T_dev = last
                # Host work overlapping the device launch: fold the pending
                # instances, hash this step's transcript prefixes.
                _host_fold_pending()
                X_i = {}
                for c in live:
                    X_i[c] = [v % spec.p for v in chains[c][2][i]]
                    self._fold_challenge_prefix(
                        trs[c], acc_insts[c], X_i[c],
                        commW_aff[c][k])
                comm_T_aff = (C.pt_to_affine_host_canon(curve, comm_T_dev)
                              if use_pl else
                              C.pt_to_affine_host(curve, comm_T_dev))  # sync
                for c in live:
                    comm_W = commW_aff[c][k]
                    trs[c].absorb_point(comm_T_aff[c])
                    r = trs[c].challenge()
                    pend_meta[c] = {"r": r, "X": X_i[c], "comm_W": comm_W,
                                    "comm_T": comm_T_aff[c]}
                    steps_k[c].append(StepClaim(X=X_i[c], comm_W=comm_W))
                    comm_Ts_k[c].append(comm_T_aff[c])
                pend = (z_mont[:, k, 1 + n_io:],
                        az_b[:, k], bz_b[:, k], cz_b[:, k], T)
            T_.count("ivc/folds", sum(
                1 for c in range(K)
                for i in range(done, done + take) if i < lens[c]))
            done += take
            if progress:
                print(f"lockstep folded {min(done, n_max)}/{n_max} steps "
                      f"x {K} chains")

        if pend is not None:
            pW2, paz, pbz, pcz, pT = pend
            acc_dev = foldw_v(acc_dev, pW2, paz, pbz, pcz, pT, _stack_r())
            _host_fold_pending()

        proofs = []
        for c in range(K):
            acc_c = jax.tree_util.tree_map(lambda x: x[c], acc_dev)
            proofs.append(self._finish_proof(
                chains[c][0], steps_k[c], comm_Ts_k[c], acc_c))
        return proofs

    # -- verification -------------------------------------------------------
    def verify(self, proof: IVCProof, io_arity: int) -> List[int]:
        """Full verification; returns z_final on success, raises on failure.

        Checks: transcript-replayed instance folding, public-IO chaining,
        commitment openings of the final accumulator, and relaxed-R1CS
        satisfaction of the folded instance."""
        shape, spec, curve = self.shape, self.shape.field, self.curve
        n_io = shape.n_io
        assert proof.pp_digest == self.pp_digest, "pp digest mismatch"
        assert proof.num_steps >= 1, "empty proof"
        # Every step MUST contribute a cross-term: a trailing step without a
        # matching comm_T would never be folded into the accumulator, letting
        # a prover append a fabricated final state.
        assert len(proof.comm_Ts) == proof.num_steps, "comm_T count mismatch"

        tr = self._new_transcript(proof.z0)
        acc_inst = NF.AccumulatorInstance(u=0, X=[0] * n_io)

        prev_out = [v % spec.p for v in proof.z0]
        for step, comm_T in zip(proof.steps, proof.comm_Ts):
            assert len(step.X) == n_io
            # IO chaining: z_in of this step == previous z_out.
            assert [v % spec.p for v in step.X[io_arity: 2 * io_arity]] == \
                prev_out, "IO chaining broken"
            prev_out = [v % spec.p for v in step.X[:io_arity]]

            r = self._fold_challenge(tr, acc_inst, step.X, step.comm_W,
                                     comm_T)
            acc_inst = NF.fold_instance(spec, curve, acc_inst, step.X,
                                        step.comm_W, comm_T, r)
        # The returned z_final is the last folded step's output.
        assert prev_out == [v % spec.p
                            for v in proof.steps[-1].X[:io_arity]]

        # Openings.
        W_canon = jnp.asarray(spec.batch_to_limbs(proof.final_W))
        E_canon = jnp.asarray(spec.batch_to_limbs(proof.final_E))
        comm_W_dev = self.ck.commit(W_canon, max_bits=256)
        comm_E_dev = self.ck.commit(E_canon, max_bits=256)
        got_W = C.pt_to_affine_host(curve, tuple(x[None] for x in comm_W_dev))[0]
        got_E = C.pt_to_affine_host(curve, tuple(x[None] for x in comm_E_dev))[0]
        assert got_W == acc_inst.comm_W, "final W commitment mismatch"
        assert got_E == acc_inst.comm_E, "final E commitment mismatch"

        # Relaxed R1CS satisfaction of the folded instance.
        to_mont_j = F.jitted("to_mont", spec)
        u_mont = self._scalar_mont(acc_inst.u)
        x_mont = to_mont_j(jnp.asarray(spec.batch_to_limbs(acc_inst.X)))
        w_mont = to_mont_j(W_canon)
        e_mont = to_mont_j(E_canon)

        def _relaxed_ok(u, x, w, e):
            from .r1cs import matvec_all as mva
            z = jnp.concatenate([u[None], x, w], axis=0)
            az, bz, cz = mva(shape, z)
            lhs = F.mont_mul(spec, az, bz)
            rhs = F.add(spec, F.mont_mul(spec, u[None], cz), e)
            return jnp.all(lhs == rhs)

        ok = self._jit("relaxed_ok", _relaxed_ok)(u_mont, x_mont,
                                                  w_mont, e_mont)
        assert bool(ok), "relaxed R1CS not satisfied"

        return proof.steps[-1].X[:io_arity]

    def fold_instances_only(self, proof: IVCProof,
                            io_arity: int) -> NF.AccumulatorInstance:
        """Replay the transcript/instance folding WITHOUT the final witness
        openings — the verifier half used when a compressed SNARK
        (nova/spartan.py) proves the folded instance instead of shipping
        final_W/final_E."""
        shape, spec, curve = self.shape, self.shape.field, self.curve
        n_io = shape.n_io
        assert proof.pp_digest == self.pp_digest, "pp digest mismatch"
        assert proof.num_steps >= 1, "empty proof"
        assert len(proof.comm_Ts) == proof.num_steps, "comm_T count mismatch"

        tr = self._new_transcript(proof.z0)
        acc_inst = NF.AccumulatorInstance(u=0, X=[0] * n_io)
        prev_out = [v % spec.p for v in proof.z0]
        for step, comm_T in zip(proof.steps, proof.comm_Ts):
            assert len(step.X) == n_io
            assert [v % spec.p for v in step.X[io_arity: 2 * io_arity]] == \
                prev_out, "IO chaining broken"
            prev_out = [v % spec.p for v in step.X[:io_arity]]
            r = self._fold_challenge(tr, acc_inst, step.X, step.comm_W,
                                     comm_T)
            acc_inst = NF.fold_instance(spec, curve, acc_inst, step.X,
                                        step.comm_W, comm_T, r)
        return acc_inst
