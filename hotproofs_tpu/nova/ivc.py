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
arithmetic; the succinct wrapper (Spartan compression, main.rs:260-315) is
roadmapped separately (docs/ROADMAP.md).

Checkpoint/resume: ProverCheckpoint captures the tiny running state between
folds (SURVEY.md §5 flags this as the natural elastic-recovery point; the
reference keeps it memory-only).
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass, field as dc_field
from typing import Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import curve as C
from ..ops import field as F
from . import fold as NF
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

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            pickle.dump(self, f)

    @staticmethod
    def load(path: str) -> "IVCProof":
        with open(path, "rb") as f:
            return pickle.load(f)


class IVC:
    """Prover/verifier pair bound to one step-circuit shape + key."""

    def __init__(self, shape: ShapeDevice, curve: C.CurveSpec,
                 ck: CommitmentKey, big_wit_idx: Optional[np.ndarray] = None,
                 label: bytes = b"ivc"):
        """big_wit_idx: witness positions that may exceed 2^SMALL_BITS.
        None disables the small-scalar fast path (all commits full-width);
        an array enables it — the caller asserts every other witness value
        fits SMALL_BITS (see ChunkProver's runtime guard)."""
        assert curve.scalar.p == shape.field.p, \
            "commitment curve group order must equal circuit field"
        self.shape = shape
        self.curve = curve
        self.ck = ck
        self.big_wit_idx = big_wit_idx
        self.label = label
        self.pp_digest = digest_of(
            label,
            np.asarray(shape.A.rows).tobytes(),
            np.asarray(shape.A.cols).tobytes(),
            np.asarray(shape.A.vals_mont).tobytes(),
            np.asarray(shape.B.vals_mont).tobytes(),
            np.asarray(shape.C.vals_mont).tobytes(),
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

    # -- proving ------------------------------------------------------------
    def prove(self, z0: Sequence[int],
              witnesses: Iterable[np.ndarray],
              progress: bool = False) -> IVCProof:
        """Fold the chain. `witnesses` yields full DSL witness vectors
        ([1, z_out, z_in, priv..., aux...] object ints) in step order."""
        shape, spec, curve = self.shape, self.shape.field, self.curve
        n_io = shape.n_io
        acc_dev, acc_inst = NF.empty_accumulator(shape)
        tr = Transcript(spec.name + "", self.label, self.pp_digest)
        tr.absorb_scalars([v % spec.p for v in z0])

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

            # Challenge binds running instance, step instance and comm_T.
            tr.absorb_scalar(acc_inst.u)
            tr.absorb_scalars(acc_inst.X)
            tr.absorb_point(acc_inst.comm_W)
            tr.absorb_point(acc_inst.comm_E)
            tr.absorb_scalars(X_i)
            tr.absorb_point(comm_W)
            tr.absorb_point(comm_T)
            r = tr.challenge()

            r_mont = self._scalar_mont(r)
            W_mont = to_mont_j(W_canon)
            acc_dev = foldw_j(acc_dev, W_mont, az, bz, cz, T, r_mont)
            acc_inst = NF.fold_instance(spec, curve, acc_inst, X_i,
                                        comm_W, comm_T, r)
            steps.append(StepClaim(X=X_i, comm_W=comm_W))
            comm_Ts.append(comm_T)
            if progress:
                print(f"fold step {i}: done")

        final_W = [int(v) for v in spec.limbs_to_ints(
            np.asarray(from_mont_j(acc_dev.W)))]
        final_E = [int(v) for v in spec.limbs_to_ints(
            np.asarray(from_mont_j(acc_dev.E)))]
        return IVCProof(z0=list(z0), steps=steps, comm_Ts=comm_Ts,
                        final_W=final_W, final_E=final_E,
                        pp_digest=self.pp_digest)

    # -- batched fast path --------------------------------------------------
    def prove_batch(self, z0: Sequence[int], canon_batch,
                    X_host: List[List[int]], chunk_steps: int = 16,
                    progress: bool = False) -> IVCProof:
        """Fold a chain whose witnesses are already device-resident.

        canon_batch: (N, n_vars, 32) canonical limb array (e.g. from the
        batched witness generator); X_host: per-step public IO as ints.
        Phases per chunk of steps: batched to-Montgomery + batched SpMVs +
        batched W-commits (all independent of the fold), then the sequential
        fold loop touches only precomputed tensors + one comm_T MSM per step.
        """
        import jax

        shape, spec, curve = self.shape, self.shape.field, self.curve
        n_io = shape.n_io
        n_steps = canon_batch.shape[0]
        acc_dev, acc_inst = NF.empty_accumulator(shape)
        tr = Transcript(spec.name + "", self.label, self.pp_digest)
        tr.absorb_scalars([v % spec.p for v in z0])

        to_mont_j = F.jitted("to_mont", spec)
        from_mont_j = F.jitted("from_mont", spec)
        cross_j = self._jit(
            "cross", lambda acc, az, bz, cz, u: NF.cross_term(
                spec, acc, az, bz, cz, u))
        foldw_j = self._jit(
            "foldw", lambda acc, W2, az, bz, cz, T, r: NF.fold_witness(
                spec, acc, W2, az, bz, cz, T, r))
        matvec_b = self._jit(
            "matvec_batch", jax.vmap(lambda z: matvec_all(shape, z)))
        if self.big_wit_idx is None:
            commit_b = self._jit(
                "commitW_batch",
                jax.vmap(lambda w: self.ck.commit(w, max_bits=256)))
        else:
            from ..ops import msm as M
            from .pedersen import SMALL_BITS
            big = jnp.asarray(self.big_wit_idx.astype(np.int32))
            pts = tuple(p[:shape.n_wit] for p in self.ck.points)

            def one_commit(w):
                small = w.at[big].set(0)
                acc = M.msm(self.curve, small, pts, max_bits=SMALL_BITS)
                big_pts = tuple(p[big] for p in pts)
                return C.pt_add(self.curve, acc,
                                M.msm(self.curve, w[big], big_pts,
                                      max_bits=256))

            commit_b = self._jit("commitW_batch_split", jax.vmap(one_commit))

        steps: List[StepClaim] = []
        comm_Ts: List[Affine] = []
        done = 0
        while done < n_steps:
            take = min(chunk_steps, n_steps - done)
            sl = canon_batch[done: done + take]
            if take < chunk_steps:  # pad to the jitted chunk shape
                pad = jnp.zeros((chunk_steps - take,) + sl.shape[1:],
                                sl.dtype)
                sl = jnp.concatenate([sl, pad], axis=0)
            z_mont = to_mont_j(sl)
            az_b, bz_b, cz_b = matvec_b(z_mont)
            comm_W_b = commit_b(sl[:, 1 + n_io:, :])
            comm_W_aff = C.pt_to_affine_host(curve, comm_W_b)

            for k in range(take):
                i = done + k
                X_i = [v % spec.p for v in X_host[i]]
                az, bz, cz = az_b[k], bz_b[k], cz_b[k]
                comm_W = comm_W_aff[k]

                u_mont = self._scalar_mont(acc_inst.u)
                T = cross_j(acc_dev, az, bz, cz, u_mont)
                comm_T_dev = self.ck.commit(from_mont_j(T), max_bits=256)
                comm_T = C.pt_to_affine_host(
                    curve, tuple(x[None] for x in comm_T_dev))[0]

                tr.absorb_scalar(acc_inst.u)
                tr.absorb_scalars(acc_inst.X)
                tr.absorb_point(acc_inst.comm_W)
                tr.absorb_point(acc_inst.comm_E)
                tr.absorb_scalars(X_i)
                tr.absorb_point(comm_W)
                tr.absorb_point(comm_T)
                r = tr.challenge()

                r_mont = self._scalar_mont(r)
                acc_dev = foldw_j(acc_dev, z_mont[k, 1 + n_io:],
                                  az, bz, cz, T, r_mont)
                acc_inst = NF.fold_instance(spec, curve, acc_inst, X_i,
                                            comm_W, comm_T, r)
                steps.append(StepClaim(X=X_i, comm_W=comm_W))
                comm_Ts.append(comm_T)
            done += take
            if progress:
                print(f"folded {done}/{n_steps} steps")

        final_W = [int(v) for v in spec.limbs_to_ints(
            np.asarray(from_mont_j(acc_dev.W)))]
        final_E = [int(v) for v in spec.limbs_to_ints(
            np.asarray(from_mont_j(acc_dev.E)))]
        return IVCProof(z0=list(z0), steps=steps, comm_Ts=comm_Ts,
                        final_W=final_W, final_E=final_E,
                        pp_digest=self.pp_digest)

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

        tr = Transcript(spec.name + "", self.label, self.pp_digest)
        tr.absorb_scalars([v % spec.p for v in proof.z0])
        acc_inst = NF.AccumulatorInstance(u=0, X=[0] * n_io)

        prev_out = [v % spec.p for v in proof.z0]
        for step, comm_T in zip(proof.steps, proof.comm_Ts):
            assert len(step.X) == n_io
            # IO chaining: z_in of this step == previous z_out.
            assert [v % spec.p for v in step.X[io_arity: 2 * io_arity]] == \
                prev_out, "IO chaining broken"
            prev_out = [v % spec.p for v in step.X[:io_arity]]

            tr.absorb_scalar(acc_inst.u)
            tr.absorb_scalars(acc_inst.X)
            tr.absorb_point(acc_inst.comm_W)
            tr.absorb_point(acc_inst.comm_E)
            tr.absorb_scalars(step.X)
            tr.absorb_point(step.comm_W)
            tr.absorb_point(comm_T)
            r = tr.challenge()
            acc_inst = NF.fold_instance(spec, curve, acc_inst, step.X,
                                        step.comm_W, comm_T, r)

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
