"""The flagship model: prove/verify BLAKE3 chunk possession via Nova IVC.

End-to-end equivalent of the reference's `prove_chunk_hash`
(rust_fold/src/main.rs:41-203): given file bytes and a chunk index, fold one
step per 64-byte block plus one per Merkle level, and produce a proof that
the prover knows the chunk's bytes and a path to the published BLAKE3 root.
The verifier recomputes the root hash from the final IVC state z[2:10]
(main.rs:195-201) and checks the chain invariants.

Usage (CLI):
    python -m hotproofs_tpu.models.chunk_prover prove --file F --chunk 0 \
        --out proof.json [--compress]
    python -m hotproofs_tpu.models.chunk_prover verify --proof proof.json \
        --expect-hash HEX
"""

from __future__ import annotations

import argparse
import sys
import time
from dataclasses import dataclass
from functools import lru_cache
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..core import blake3_ref as b3
from ..circuits import blake3_nova as nova_circ
from ..circuits.blake3_compression import VESTA_PRIME
from ..circuits.dsl import eval_witness
from ..nova import serial
from ..nova.ivc import IVC, IVCProof
from ..nova.pedersen import SMALL_BITS, CommitmentKey
from ..nova.r1cs import ShapeDevice
from ..ops import curve as C

IO_ARITY = nova_circ.IO_ARITY


def _big_witness_indices(layout, n_io: int) -> np.ndarray:
    """Witness positions holding full-width field elements: the IsZero
    inverse hints. Everything else in the BLAKE3 step witness is < 2^40
    (bits, u32 words, u34 carry sums), enabling the small-MSM fast path."""
    idx = []
    w_base = 1 + n_io
    for seg in layout.segments:
        if seg.role == "aux" and seg.name.endswith("/inv"):
            for k in range(seg.length):
                idx.append(seg.start + k - w_base)
    return np.asarray(sorted(idx), dtype=np.int64)


@lru_cache(maxsize=None)
def _build_stack(curve_name: str = "pallas", depth_bits: int = 8):
    curve = C.CURVES[curve_name]
    modulus = curve.scalar.p
    r1cs, layout = nova_circ.get_nova_step_circuit(modulus, 0, depth_bits)
    shape = ShapeDevice.from_dsl(r1cs)
    # Power-of-two key size: the Spartan IPA openings fold the generator
    # vector in halves (nova/spartan.py); commitments only use a prefix, so
    # the extra generators are free for the plain fold path.
    n = max(shape.n_wit, shape.n_cons)
    n = 1 << (n - 1).bit_length()
    ck = CommitmentKey.create(curve, b"blake3-nova", n)
    big_idx = _big_witness_indices(layout, shape.n_io)
    label = b"blake3-chunk" if depth_bits == 8 \
        else b"blake3-chunk-d%d" % depth_bits
    ivc = IVC(shape, curve, ck, big_idx, label=label)
    return ivc, layout, modulus


@dataclass
class ChunkProof:
    """Proof + public statement."""

    ivc_proof: IVCProof
    chunk_idx: int
    n_blocks: int
    leaf_depth: int
    total_depth: int

    def save(self, path: str) -> None:
        serial.dump("chunk_proof", {
            "ivc_proof": self.ivc_proof.to_dict(),
            "chunk_idx": int(self.chunk_idx),
            "n_blocks": int(self.n_blocks),
            "leaf_depth": int(self.leaf_depth),
            "total_depth": int(self.total_depth),
        }, path)

    @staticmethod
    def load(path: str) -> "ChunkProof":
        d = serial.load("chunk_proof", path)
        return ChunkProof(
            ivc_proof=IVCProof.from_dict(d["ivc_proof"]),
            chunk_idx=int(d["chunk_idx"]), n_blocks=int(d["n_blocks"]),
            leaf_depth=int(d["leaf_depth"]),
            total_depth=int(d["total_depth"]))


@dataclass
class CompressedChunkProof:
    """Succinct proof + public statement: the chain's per-step instances
    plus a Spartan argument — no accumulator witness vectors (the reference
    parity point: CompressedSNARK output, main.rs:341-346)."""

    compressed: "object"   # nova.spartan.CompressedProof
    chunk_idx: int
    n_blocks: int
    leaf_depth: int
    total_depth: int

    def save(self, path: str) -> None:
        serial.dump("compressed_chunk_proof", {
            "compressed": {
                "chain": self.compressed.chain.to_dict(),
                "spartan": self.compressed.spartan.to_dict(),
            },
            "chunk_idx": int(self.chunk_idx),
            "n_blocks": int(self.n_blocks),
            "leaf_depth": int(self.leaf_depth),
            "total_depth": int(self.total_depth),
        }, path)

    @staticmethod
    def load(path: str) -> "CompressedChunkProof":
        from ..nova.spartan import CompressedProof, SpartanProof
        d = serial.load("compressed_chunk_proof", path)
        cd = d["compressed"]
        cp = CompressedProof(
            chain=IVCProof.from_dict(cd["chain"]),
            spartan=SpartanProof.from_dict(cd["spartan"]))
        return CompressedChunkProof(
            compressed=cp,
            chunk_idx=int(d["chunk_idx"]), n_blocks=int(d["n_blocks"]),
            leaf_depth=int(d["leaf_depth"]),
            total_depth=int(d["total_depth"]))


@dataclass
class SegmentedChunkProof:
    """Chunk statement + a segment-parallel fold proof
    (parallel/segments.SegmentedProof)."""

    segmented: "object"
    chunk_idx: int
    n_blocks: int
    leaf_depth: int
    total_depth: int

    def save(self, path: str) -> None:
        serial.dump("segmented_chunk_proof", {
            "segmented": self.segmented.to_dict(),
            "chunk_idx": int(self.chunk_idx),
            "n_blocks": int(self.n_blocks),
            "leaf_depth": int(self.leaf_depth),
            "total_depth": int(self.total_depth),
        }, path)

    @staticmethod
    def load(path: str) -> "SegmentedChunkProof":
        from ..parallel.segments import SegmentedProof
        d = serial.load("segmented_chunk_proof", path)
        return SegmentedChunkProof(
            segmented=SegmentedProof.from_dict(d["segmented"]),
            chunk_idx=int(d["chunk_idx"]), n_blocks=int(d["n_blocks"]),
            leaf_depth=int(d["leaf_depth"]),
            total_depth=int(d["total_depth"]))


@dataclass
class RecursiveChunkProof:
    """Chunk statement + an augmented-IVC proof (nova/recursive.py):
    verification work independent of the chain length."""

    rec: "object"     # nova.recursive.RecursiveProof
    chunk_idx: int
    n_blocks: int
    leaf_depth: int
    total_depth: int

    def save(self, path: str) -> None:
        serial.dump("recursive_chunk_proof", {
            "rec": self.rec.to_dict(),
            "chunk_idx": int(self.chunk_idx),
            "n_blocks": int(self.n_blocks),
            "leaf_depth": int(self.leaf_depth),
            "total_depth": int(self.total_depth),
        }, path)

    @staticmethod
    def load(path: str) -> "RecursiveChunkProof":
        from ..nova.recursive import RecursiveProof
        d = serial.load("recursive_chunk_proof", path)
        return RecursiveChunkProof(
            rec=RecursiveProof.from_dict(d["rec"]),
            chunk_idx=int(d["chunk_idx"]), n_blocks=int(d["n_blocks"]),
            leaf_depth=int(d["leaf_depth"]),
            total_depth=int(d["total_depth"]))


def check_statement(modulus: int, z0, num_steps, chunk_idx, n_blocks,
                    leaf_depth, total_depth) -> None:
    """Statement checks mirroring z0 construction (main.rs:130-145): z0
    must encode (IV, depth = leaf_depth-1, block_count=0, the claimed
    chunk_idx); the step count must match the schedule. Module-level so a
    vk-only verifier (nova/vk.py) can run them without a prover stack."""
    expected_z0 = ([n_blocks, 0] + list(b3.IV)
                   + [total_depth, leaf_depth - 1,
                      chunk_idx & 0xFFFFFFFF,
                      chunk_idx >> 32, leaf_depth])
    assert [v % modulus for v in z0] == \
        [v % modulus for v in expected_z0], "z0 mismatch"
    assert num_steps == n_blocks + leaf_depth - 1, "step count"


def check_final(z_final, n_blocks, expected_hash: Optional[bytes],
                chunk_idx: Optional[int] = None,
                leaf_depth: Optional[int] = None,
                total_depth: Optional[int] = None) -> bytes:
    """Final-state extraction (main.rs:195-201): all blocks consumed, root
    reached (depth 0); hash = z[2:10] as LE words. When the statement
    fields are supplied, the FULL final-state contract is pinned: the
    circuit carries total_depth / chunk_idx limbs / leaf_depth through
    unchanged, so they must still equal the claimed statement
    (defense-in-depth on top of check_statement's z0 binding —
    VERDICT r04 weak #7)."""
    assert z_final[0] == n_blocks
    assert z_final[1] == n_blocks, "not all blocks absorbed"
    assert z_final[11] == 0, "did not reach the root"
    if total_depth is not None:
        assert z_final[10] == total_depth, "total_depth drifted"
    if chunk_idx is not None:
        assert z_final[12] == chunk_idx & 0xFFFFFFFF, "chunk_idx low drifted"
        assert z_final[13] == chunk_idx >> 32, "chunk_idx high drifted"
    if leaf_depth is not None:
        assert z_final[14] == leaf_depth, "leaf_depth drifted"
    root = b"".join(int(w).to_bytes(4, "little") for w in z_final[2:10])
    if expected_hash is not None:
        assert root == expected_hash, "root hash mismatch"
    return root


def verify_with_vk(vk_path: str, proof: "ChunkProof",
                   expected_hash: Optional[bytes] = None) -> bytes:
    """Verify a chunk proof from an exported vk document alone — the
    prover stack (circuit DSL, witness machinery) is never constructed.
    Reference parity: an external verifier consuming vk_zm.json +
    proof.json (main.rs:334-346)."""
    from ..nova.vk import ivc_from_vk

    ivc = ivc_from_vk(vk_path)
    check_statement(
        ivc.shape.field.p, proof.ivc_proof.z0, proof.ivc_proof.num_steps,
        proof.chunk_idx, proof.n_blocks, proof.leaf_depth,
        proof.total_depth)
    z_final = ivc.verify(proof.ivc_proof, io_arity=IO_ARITY)
    return check_final(z_final, proof.n_blocks, expected_hash,
                       chunk_idx=proof.chunk_idx,
                       leaf_depth=proof.leaf_depth,
                       total_depth=proof.total_depth)


class ChunkProver:
    """prove/verify pair for BLAKE3 chunk possession (Pasta by default)."""

    def __init__(self, curve: str = "pallas", depth_bits: int = 8):
        """depth_bits widens the circuit's depth decompositions past the
        reference's 8 bits (tree depth 255) — depth_bits=13 admits
        4096-step single chains (tools/longchain_deep.py), 16 covers
        BASELINE config 5's 2^16-step chain. Proofs are per-(curve,
        depth_bits) circuit instances (distinct pp digests)."""
        self.depth_bits = depth_bits
        self.ivc, self.layout, self.modulus = _build_stack(curve, depth_bits)
        self._spartan = None
        self._recursive = None

    # ------------------------------------------------------------------
    @staticmethod
    def _hash_with_path(data: bytes, chunk_idx: int):
        """Data ingestion: native C++ tree hasher when available (~3 orders
        of magnitude over the Python oracle), oracle fallback otherwise."""
        from ..core import native
        pd = native.hash_with_path(data, chunk_idx) \
            if native.get_lib() is not None else None
        return pd if pd is not None else b3.hash_with_path(data, chunk_idx)

    def prove(self, data: bytes, chunk_idx: int, progress: bool = False,
              fast: bool = True, mesh=None) -> Tuple[bytes, ChunkProof]:
        proof_data = self._hash_with_path(data, chunk_idx)
        if fast:
            sched, ivc_proof = self._prove_fast(proof_data, progress, mesh)
        else:
            sched, ivc_proof = self._prove_host(proof_data, progress)
        chunk_proof = ChunkProof(
            ivc_proof=ivc_proof,
            chunk_idx=chunk_idx,
            n_blocks=sched.n_blocks,
            leaf_depth=sched.leaf_depth,
            total_depth=proof_data.total_depth,
        )
        return proof_data.root_hash, chunk_proof

    def _witness_slice_canon(self, zs, sched, a: int, b: int):
        """Device-generate step witnesses [a, b) of a precomputed chain and
        expand to canonical limb vectors (b-a, n_vars, 32) with the
        full-width inverse hints patched. Returns a DEVICE array."""
        import jax.numpy as jnp
        from ..circuits import witness_jax as WJ

        z_b = np.array(zs[a:b], np.uint32)
        m_b = np.array([s.m for s in sched.steps[a:b]], np.uint32)
        b_b = np.array([s.b for s in sched.steps[a:b]], np.uint32)
        dl_b = np.array([s.down_left for s in sched.steps[a:b]], np.uint32)
        w_u32 = WJ.jitted_nova_generator(0, self.depth_bits)(
            jnp.asarray(z_b), jnp.asarray(m_b), jnp.asarray(b_b),
            jnp.asarray(dl_b))                       # (b-a, n_signals) u32

        # Expand uint32 signals to canonical limb vectors on device.
        from ..ops import field as F
        limbs = jnp.stack(
            [(w_u32 >> jnp.uint32(8 * l)) & jnp.uint32(0xFF)
             for l in range(4)], axis=-1).astype(jnp.int32)
        canon = jnp.concatenate(
            [limbs, jnp.zeros(w_u32.shape + (F.N_LIMBS - 4,), jnp.int32)],
            axis=-1)
        # Patch the three full-width inverse hints per step.
        big_pos = WJ.nova_big_positions(self.modulus, self.depth_bits)
        inv_limbs = np.zeros((b - a, 3, F.N_LIMBS), np.int32)
        for i, z in enumerate(zs[a:b]):
            for j, v in enumerate(WJ.nova_inverse_values(
                    z[11], z[1], z[0], self.modulus)):
                inv_limbs[i, j] = F.int_to_limbs(v)
        return canon.at[:, jnp.asarray(big_pos), :].set(
            jnp.asarray(inv_limbs))

    def _device_witness_chain(self, proof_data):
        """Precompute (zs, sched, canon, X_host) for the whole chain: all
        step witnesses in ONE device kernel call (the z chain is
        host-precomputable from the hash chain alone — SURVEY.md §2c #3),
        expanded to canonical limb vectors with inverse hints patched."""
        zs, sched = nova_circ.z_chain(proof_data, self.modulus)
        n = len(sched.steps)
        canon = self._witness_slice_canon(zs, sched, 0, n)
        X_host = [list(zs[i + 1]) + list(zs[i]) for i in range(n)]
        return zs, sched, canon, X_host

    def _host_witness_chain(self, proof_data, slice_steps: int = 512):
        """Like _device_witness_chain but returns canon as HOST numpy,
        generated in device slices of `slice_steps` — for chains too long
        for the whole (N, n_vars, 32) tensor to live in HBM (a 4096-step
        chain's canon is ~8.5 GB; tools/longchain_deep.py). Peak HBM is one
        slice; prove paths upload per-chunk slices on demand."""
        zs, sched = nova_circ.z_chain(proof_data, self.modulus)
        n = len(sched.steps)
        parts = []
        for a in range(0, n, slice_steps):
            b = min(n, a + slice_steps)
            parts.append(np.asarray(self._witness_slice_canon(
                zs, sched, a, b)))
        canon = np.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
        X_host = [list(zs[i + 1]) + list(zs[i]) for i in range(n)]
        return zs, sched, canon, X_host

    def _prove_fast(self, proof_data, progress: bool, mesh=None):
        """Batched device pipeline: one witness kernel call, batched SpMVs
        and W-commits, then the sequential fold loop."""
        zs, sched, canon, X_host = self._device_witness_chain(proof_data)
        proof = self.ivc.prove_batch(sched.z0, canon, X_host,
                                     progress=progress, mesh=mesh)
        return sched, proof

    def prove_many(self, data: bytes, chunk_idxs: Sequence[int],
                   progress: bool = False
                   ) -> Tuple[bytes, List[ChunkProof]]:
        """Prove possession of SEVERAL chunks of one file in lockstep.

        The production serving scenario (a storage provider answers many
        chunk challenges at once): K independent fold chains — one per
        chunk — advance together, with every per-fold device launch
        vmapped over the chain axis (IVC.prove_lockstep). On a
        launch-bound TPU this multiplies aggregate folds/s by ~K compared
        with proving the chunks one after another, which is all the
        reference's sequential driver can do (rust_fold/src/main.rs:166).
        Each proof is bit-identical to a standalone `prove(data, idx)`.
        """
        chains, metas = [], []
        for ci in chunk_idxs:
            proof_data = self._hash_with_path(data, ci)
            zs, sched, canon, X_host = self._device_witness_chain(proof_data)
            chains.append((sched.z0, canon, X_host))
            metas.append((proof_data, sched, ci))
        ivc_proofs = self.ivc.prove_lockstep(chains, progress=progress)
        proofs = []
        for (proof_data, sched, ci), ivcp in zip(metas, ivc_proofs):
            proofs.append(ChunkProof(
                ivc_proof=ivcp, chunk_idx=ci, n_blocks=sched.n_blocks,
                leaf_depth=sched.leaf_depth,
                total_depth=proof_data.total_depth))
        return metas[0][0].root_hash, proofs

    def _prove_host(self, proof_data, progress: bool):
        """Reference-style per-step host witness path (kept for
        cross-checking the batched pipeline)."""
        sched = nova_circ.build_schedule(proof_data)
        z = [v % self.modulus for v in sched.z0]

        def witness_iter():
            nonlocal z
            for step in sched.steps:
                w, z_out = nova_circ.eval_step_witness(
                    z, step, self.modulus, depth_bits=self.depth_bits)
                z = z_out
                yield w

        return sched, self.ivc.prove(sched.z0, witness_iter(),
                                     progress=progress)

    # ------------------------------------------------------------------
    def _check_statement(self, z0, num_steps, chunk_idx, n_blocks,
                         leaf_depth, total_depth) -> None:
        check_statement(self.modulus, z0, num_steps, chunk_idx, n_blocks,
                        leaf_depth, total_depth)

    def _check_final(self, z_final, proof,
                     expected_hash: Optional[bytes]) -> bytes:
        return check_final(z_final, proof.n_blocks, expected_hash,
                           chunk_idx=proof.chunk_idx,
                           leaf_depth=proof.leaf_depth,
                           total_depth=proof.total_depth)

    def export_vk(self, path: str) -> None:
        """Write the standalone verification key (nova/vk.py); any party
        can then verify chunk proofs via `verify_with_vk` / the CLI
        `verify --vk` without this prover stack."""
        from ..nova.vk import export_vk as _export

        _export(self.ivc, path, statement="blake3-chunk",
                io_arity=IO_ARITY)

    def verify(self, proof: ChunkProof,
               expected_hash: Optional[bytes] = None) -> bytes:
        """Verify the fold chain and statement; returns the proven root."""
        self._check_statement(
            proof.ivc_proof.z0, proof.ivc_proof.num_steps, proof.chunk_idx,
            proof.n_blocks, proof.leaf_depth, proof.total_depth)
        z_final = self.ivc.verify(proof.ivc_proof, io_arity=IO_ARITY)
        return self._check_final(z_final, proof, expected_hash)

    # ------------------------------------------------------------------
    @property
    def spartan(self):
        """Lazily-built Spartan compression system for this circuit/key."""
        if self._spartan is None:
            from ..nova.spartan import SpartanSystem
            self._spartan = SpartanSystem(self.ivc)
        return self._spartan

    def compress(self, proof: ChunkProof) -> CompressedChunkProof:
        """Compress a chunk proof: drop the accumulator witness, attach the
        Spartan argument (reference parity: compress_snark, main.rs:260)."""
        cp = self.spartan.compress(proof.ivc_proof, io_arity=IO_ARITY)
        return CompressedChunkProof(
            compressed=cp, chunk_idx=proof.chunk_idx,
            n_blocks=proof.n_blocks, leaf_depth=proof.leaf_depth,
            total_depth=proof.total_depth)

    # ------------------------------------------------------------------
    @property
    def recursive(self):
        """Lazily-built RecursiveSNARK with the BLAKE3 step as F — the
        augmented-IVC engine (O(1) verifier; docs/AUGMENTED.md). Runs on
        the prover's cycle: Pasta, or BN254/Grumpkin for
        ChunkProver(curve="bn254") — the reference's default engine for
        the augmented construction (main.rs:319-331)."""
        if self._recursive is None:
            from ..nova.recursive import RecursiveSNARK
            from ..ops import curve as C_

            cycles = {"pallas": (C_.PALLAS, C_.VESTA),
                      "vesta": (C_.VESTA, C_.PALLAS),
                      "bn254": (C_.BN254, C_.GRUMPKIN),
                      "grumpkin": (C_.GRUMPKIN, C_.BN254)}
            cycle = cycles[self.ivc.curve.name]

            def f_gadget(ctx, z_prev, extra):
                return nova_circ.nova_step_body(ctx, z_prev, extra, 0,
                                                self.depth_bits)

            def f_host(z, extra):
                step = nova_circ.StepInputs(
                    m=tuple(extra["m"]), b=int(extra["b"][0]),
                    down_left=int(extra["down_left"][0]))
                _, z_out = nova_circ.eval_step_witness(
                    z, step, self.modulus, depth_bits=self.depth_bits)
                return z_out

            self._recursive = RecursiveSNARK(
                f_gadget, f_host, arity=IO_ARITY, label=b"blake3-rec",
                f_extra_decl=nova_circ.declare_step_inputs, cycle=cycle)
        return self._recursive

    def prove_recursive(self, data: bytes, chunk_idx: int,
                        progress: bool = False):
        """Prove via the augmented recursive IVC: per-step in-circuit fold
        verification, chain-length-independent verifier work. Returns
        (root_hash, RecursiveChunkProof)."""
        proof_data = self._hash_with_path(data, chunk_idx)
        sched = nova_circ.build_schedule(proof_data)
        step_inputs = [{"m": list(s.m), "b": [s.b],
                        "down_left": [s.down_left]} for s in sched.steps]
        rproof = self.recursive.prove(sched.z0, len(sched.steps),
                                      step_inputs=step_inputs,
                                      progress=progress)
        proof = RecursiveChunkProof(
            rec=rproof, chunk_idx=chunk_idx, n_blocks=proof_data.n_blocks,
            leaf_depth=proof_data.leaf_depth,
            total_depth=proof_data.total_depth)
        return proof_data.root_hash, proof

    def verify_recursive(self, proof: "RecursiveChunkProof",
                         expected_hash: Optional[bytes] = None) -> bytes:
        self._check_statement(
            proof.rec.z0, proof.rec.n_steps, proof.chunk_idx,
            proof.n_blocks, proof.leaf_depth, proof.total_depth)
        z_final = self.recursive.verify(proof.rec)
        return self._check_final(z_final, proof, expected_hash)

    # ------------------------------------------------------------------
    def prove_segmented(self, data: bytes, chunk_idx: int, n_segments: int,
                        devices=None, progress: bool = False):
        """Prove a chunk as n_segments independent parallel fold chains
        (SURVEY.md §2c #3; parallel/segments.py). Returns
        (root_hash, SegmentedChunkProof)."""
        from ..parallel.segments import prove_segments

        proof_data = self._hash_with_path(data, chunk_idx)
        zs, sched, canon, X_host = self._device_witness_chain(proof_data)
        seg = prove_segments(self.ivc, zs, canon, X_host, n_segments,
                             devices=devices, progress=progress)
        proof = SegmentedChunkProof(
            segmented=seg, chunk_idx=chunk_idx,
            n_blocks=proof_data.n_blocks,
            leaf_depth=proof_data.leaf_depth,
            total_depth=proof_data.total_depth)
        return proof_data.root_hash, proof

    def verify_segmented(self, proof: "SegmentedChunkProof",
                         expected_hash: Optional[bytes] = None) -> bytes:
        from ..parallel.segments import verify_segments

        self._check_statement(
            proof.segmented.z0, proof.segmented.num_steps, proof.chunk_idx,
            proof.n_blocks, proof.leaf_depth, proof.total_depth)
        z_final = verify_segments(self.ivc, proof.segmented,
                                  io_arity=IO_ARITY)
        return self._check_final(z_final, proof, expected_hash)

    def verify_compressed(self, proof: CompressedChunkProof,
                          expected_hash: Optional[bytes] = None) -> bytes:
        self._check_statement(
            proof.compressed.chain.z0, proof.compressed.num_steps,
            proof.chunk_idx, proof.n_blocks, proof.leaf_depth,
            proof.total_depth)
        z_final = self.spartan.verify(proof.compressed, io_arity=IO_ARITY)
        return self._check_final(z_final, proof, expected_hash)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    p1 = sub.add_parser("prove")
    p1.add_argument("--file", required=True)
    p1.add_argument("--chunk", type=int, default=0)
    p1.add_argument("--out", default="proof.json")
    p1.add_argument("--compress", action="store_true",
                    help="emit a succinct compressed proof (Spartan+IPA)")
    p1.add_argument("--platform", default=None)
    p2 = sub.add_parser("verify")
    p2.add_argument("--proof", required=True)
    p2.add_argument("--expect-hash", default=None)
    p2.add_argument("--vk", default=None,
                    help="verify from an exported vk.json (the prover "
                         "stack is never constructed)")
    p2.add_argument("--platform", default=None)
    p3 = sub.add_parser("export-vk")
    p3.add_argument("--out", default="vk.json")
    p3.add_argument("--platform", default=None)
    args = ap.parse_args(argv)

    from ..utils.config import setup_jax
    setup_jax(platform=args.platform)

    if args.cmd == "export-vk":
        ChunkProver().export_vk(args.out)
        print(f"verification key written to {args.out}")
        return

    if args.cmd == "verify" and args.vk:
        expect = bytes.fromhex(args.expect_hash) if args.expect_hash else None
        t0 = time.time()
        proof = ChunkProof.load(args.proof)
        root = verify_with_vk(args.vk, proof, expect)
        print(f"VERIFIED (vk-only) root hash: {root.hex()}  "
              f"({time.time() - t0:.2f}s, {proof.ivc_proof.num_steps} steps)")
        return

    if args.cmd == "prove":
        with open(args.file, "rb") as f:
            data = f.read()
        prover = ChunkProver()
        t0 = time.time()
        root, proof = prover.prove(data, args.chunk, progress=True)
        dt = time.time() - t0
        n = proof.ivc_proof.num_steps
        print(f"root hash: {root.hex()}")
        print(f"steps: {n}  time: {dt:.2f}s  folds/sec: {n / dt:.3f}")
        if args.compress:
            t0 = time.time()
            cproof = prover.compress(proof)
            cproof.save(args.out)
            print(f"compressed in {time.time() - t0:.2f}s")
        else:
            proof.save(args.out)
        print(f"proof written to {args.out}")
    else:
        prover = ChunkProver()
        expect = bytes.fromhex(args.expect_hash) if args.expect_hash else None
        t0 = time.time()
        try:
            proof = ChunkProof.load(args.proof)
            root = prover.verify(proof, expect)
            n = proof.ivc_proof.num_steps
        except ValueError:
            cproof = CompressedChunkProof.load(args.proof)
            root = prover.verify_compressed(cproof, expect)
            n = cproof.compressed.num_steps
        print(f"VERIFIED root hash: {root.hex()}  "
              f"({time.time() - t0:.2f}s, {n} steps)")


if __name__ == "__main__":
    main()
