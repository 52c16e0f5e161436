"""Pedersen vector commitments (non-hiding), the arecibo CommitmentKey
equivalent (PublicParams::setup builds generator vectors via MSM keys,
rust_fold/src/main.rs:99-109).

Keys are deterministic hash-to-curve generator vectors (ops/curve.py
derive_generators), cached on disk (derivation is host-side Tonelli–Shanks).
Commit(v) = Σ v_i · G_i via the TPU Pippenger MSM. Witness vectors carry a
static small/large split: a handful of positions hold full-width field
elements (IsZero inverse hints), everything else is < 2^40 — committing the
small part with 5 radix-256 windows instead of 32 is a ~6x saving.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import curve as C
from ..ops import field as F
from ..ops import msm as M

_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".cache")

SMALL_BITS = 40  # witness values are bits / u32 words / u34 sums


def _load_or_derive(spec: C.CurveSpec, label: bytes, n: int) -> np.ndarray:
    os.makedirs(_CACHE_DIR, exist_ok=True)
    path = os.path.join(
        _CACHE_DIR, f"gens_{spec.name}_{label.decode()}_{n}.npy")
    if os.path.exists(path):
        return np.load(path)
    gens = C.derive_generators(spec, label, n)
    arr = np.array([[g[0], g[1]] for g in gens], dtype=object)
    limbs = np.zeros((n, 2, F.N_LIMBS), np.int32)
    for i, (x, y) in enumerate(gens):
        limbs[i, 0] = F.int_to_limbs(x * spec.base.r_mod_p % spec.base.p)
        limbs[i, 1] = F.int_to_limbs(y * spec.base.r_mod_p % spec.base.p)
    np.save(path, limbs)
    return limbs


@dataclass
class CommitmentKey:
    spec: C.CurveSpec
    n: int
    points: C.Point          # stacked, Montgomery projective (n, 32) x3
    gens_affine: np.ndarray  # (n, 2, 32) Montgomery affine limbs
    label: bytes = b""

    def __post_init__(self):
        self._jit_cache = {}
        self._scaled = {}  # (m, windows) -> (W4, m, limbs) per coordinate
        self._scaled_tm_cache = {}  # (m, windows) -> (px_tm, py_tm) affine
        self._scaled_big_cache = {}  # tuple(big_idx) -> (W4, nbig) projective

    def scaled(self, m: int, max_bits: int) -> C.Point:
        """Pre-scaled generators 16^w * G_j for the first m points — the
        fixed-base fast path: the bases of a commitment key never change,
        so the ~4*W4-step scaling scan runs once per (m, window-count) and
        every subsequent commit skips it entirely (ops/msm.py design).

        Disk-cached per (curve, label, m, w4) as uint8 (limbs are base-256
        digits): the full-width blake3-nova scan is a 256-step doubling
        chain over 16k points — minutes on the CPU test mesh, which is what
        blew the round-4 multichip dryrun budget (VERDICT r04 next #2)."""
        w4 = M.n_windows4(max_bits)
        # Reuse a superset if present (msm slices the window prefix; the
        # point prefix is sliced here) — scaling 64 windows of the full key
        # is ~256 sequential doubling steps, never pay it twice.
        for (mm, ww), pts in self._scaled.items():
            if mm >= m and ww >= w4:
                if mm == m:
                    return pts
                return tuple(x[:, :m] for x in pts)
        disk = os.path.join(
            _CACHE_DIR, f"scaled_{self.spec.name}_"
            f"{self.label.decode()}_{m}_{w4}.npy") if self.label else None
        if disk and os.path.exists(disk):
            arr = np.load(disk).astype(np.int32)       # (3, W4, m, 32)
            scaled = tuple(jnp.asarray(arr[i]) for i in range(3))
            self._scaled[(m, w4)] = scaled
            return scaled
        key = ("scale", m, w4)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(
                lambda p: M.scale_points16(self.spec, p, w4))
        pts = tuple(p[:m] for p in self.points)
        scaled = self._jit_cache[key](pts)
        if disk:
            arr = np.stack([np.asarray(x) for x in scaled])
            assert arr.min() >= 0 and arr.max() < 256, \
                "scaled limbs not canonical base-256 digits"
            np.save(disk, arr.astype(np.uint8))
        self._scaled[(m, w4)] = scaled
        return scaled

    @staticmethod
    def create(spec: C.CurveSpec, label: bytes, n: int) -> "CommitmentKey":
        limbs = _load_or_derive(spec, label, n)
        x = jnp.asarray(limbs[:, 0])
        y = jnp.asarray(limbs[:, 1])
        z = jnp.broadcast_to(jnp.asarray(spec.base.one_mont_limbs),
                             (n, F.N_LIMBS))
        return CommitmentKey(spec, n, (x, y, z), limbs, label)

    # -- pallas fast path ----------------------------------------------------
    def scaled_tm(self, m: int, max_bits: int) -> Tuple[jnp.ndarray,
                                                        jnp.ndarray]:
        """Time-major AFFINE pre-scaled bases for the pallas MSM
        (ops/msm_pallas.py): two (B, 32, n_lanes) Montgomery arrays, cached
        per (m, max_bits). Device batch-inversion path on TPU; host-exact
        path on the CPU mesh (small test keys)."""
        from ..ops import msm_pallas as MP

        key = (m, M.n_windows4(max_bits))
        if key in self._scaled_tm_cache:
            return self._scaled_tm_cache[key]
        b, lpw, w4, n_lanes = MP.plan(m, max_bits)
        disk = os.path.join(
            _CACHE_DIR, f"scaledtm_{self.spec.name}_"
            f"{self.label.decode()}_{m}_{w4}_{b}.npy") if self.label else None
        if disk and os.path.exists(disk):
            arr = np.load(disk)
            out = (jnp.asarray(arr[0]), jnp.asarray(arr[1]))
            self._scaled_tm_cache[key] = out
            return out
        if jax.default_backend() == "tpu":
            xa, ya = MP.scaled_affine_device(
                self.spec, self.scaled(m, max_bits), m, w4)
        else:
            f = self.spec.base
            rinv = pow(f.r_mod_p, f.p - 2, f.p)
            gens = []
            for i in range(m):
                x = F.limbs_to_int(self.gens_affine[i, 0]) * rinv % f.p
                y = F.limbs_to_int(self.gens_affine[i, 1]) * rinv % f.p
                gens.append((x, y))
            xa, ya = MP.scaled_affine_host(self.spec, gens, w4)
        out = (jnp.asarray(MP.to_tm(np.asarray(xa), m, b, lpw, w4, n_lanes)),
               jnp.asarray(MP.to_tm(np.asarray(ya), m, b, lpw, w4, n_lanes)))
        if disk:
            np.save(disk, np.stack([np.asarray(out[0]), np.asarray(out[1])]))
        self._scaled_tm_cache[key] = out
        return out

    def scaled_big(self, big_idx: np.ndarray) -> C.Point:
        """Pre-scaled (W4, nbig) projective Montgomery bases for the few
        full-width witness positions, host-computed once. Passing these to
        M.msm(scaled=...) removes its 256-step on-the-fly doubling scan —
        measured ~500 ms per batched split commit when scaled on the fly
        (tools/profile_lockstep_phases.py: split vs small-only J=128)."""
        key = tuple(int(v) for v in big_idx)
        if key in self._scaled_big_cache:
            return self._scaled_big_cache[key]
        f = self.spec.base
        rinv = pow(f.r_mod_p, f.p - 2, f.p)
        w4 = M.n_windows4(256)
        nb = len(big_idx)
        out = np.zeros((3, w4, nb, F.N_LIMBS), np.int32)
        one = F.int_to_limbs(f.r_mod_p)
        for i, gi in enumerate(big_idx):
            x = F.limbs_to_int(self.gens_affine[int(gi), 0]) * rinv % f.p
            y = F.limbs_to_int(self.gens_affine[int(gi), 1]) * rinv % f.p
            pt = (x, y)
            for w in range(w4):
                assert pt is not None
                out[0, w, i] = F.int_to_limbs(pt[0] * f.r_mod_p % f.p)
                out[1, w, i] = F.int_to_limbs(pt[1] * f.r_mod_p % f.p)
                out[2, w, i] = one
                for _ in range(4):
                    pt = C.host_add(self.spec, pt, pt)
        res = tuple(jnp.asarray(out[i]) for i in range(3))
        self._scaled_big_cache[key] = res
        return res

    # Tiny MSMs (m < 256) produce kernel shapes (b = 8, singleton grid
    # dims) that crash the Mosaic compiler ("Check failed: limits[i] <=
    # dim(i)"); padding the big-part MSM to 256 points gives the normal
    # b=16/1024-lane shapes at ~10% of a W commit's adds.
    NB_PAD = 256

    def scaled_tm_big(self, big_idx: np.ndarray) -> Tuple[jnp.ndarray,
                                                          jnp.ndarray]:
        """Time-major affine pre-scaled bases for JUST the big positions at
        full width, zero-padded to NB_PAD points — lets the split commit's
        big part run as a (tiny) pallas MSM instead of a vmapped XLA MSM
        (the XLA big part measured ~500 ms per J=128 batched split commit
        even with pre-scaled bases; tools/profile_lockstep_phases.py)."""
        from ..ops import msm_pallas as MP

        assert len(big_idx) <= self.NB_PAD, (
            f"{len(big_idx)} big witness positions exceed the NB_PAD="
            f"{self.NB_PAD} padded big-part MSM (raise NB_PAD)")
        key = ("tm_big", tuple(int(v) for v in big_idx))
        if key in self._scaled_tm_cache:
            return self._scaled_tm_cache[key]
        f = self.spec.base
        rinv = pow(f.r_mod_p, f.p - 2, f.p)
        nb = self.NB_PAD
        gens = []
        for gi in big_idx:
            x = F.limbs_to_int(self.gens_affine[int(gi), 0]) * rinv % f.p
            y = F.limbs_to_int(self.gens_affine[int(gi), 1]) * rinv % f.p
            gens.append((x, y))
        b, lpw, w4, n_lanes = MP.plan(nb, 256)
        xa, ya = MP.scaled_affine_host(self.spec, gens, w4)
        # zero-pad the point axis to NB_PAD (padding digits are 0 = dump).
        pad = np.zeros((w4, nb - len(gens), F.N_LIMBS), np.int32)
        xa = np.concatenate([np.asarray(xa), pad], axis=1)
        ya = np.concatenate([np.asarray(ya), pad], axis=1)
        out = (jnp.asarray(MP.to_tm(xa, nb, b, lpw, w4, n_lanes)),
               jnp.asarray(MP.to_tm(ya, nb, b, lpw, w4, n_lanes)))
        self._scaled_tm_cache[key] = out
        return out

    def _maybe_canon(self, pt: C.Point, canonical: bool) -> C.Point:
        """Convert projective Montgomery output to canonical limbs INSIDE
        the producing jit (callers then use pt_to_affine_host_canon: zero
        extra device dispatches on the per-fold sync path)."""
        if not canonical:
            return pt
        from ..ops import field as _F
        return tuple(_F.from_mont(self.spec.base, x) for x in pt)

    def commit_pallas_fn(self, m: int, max_bits: int = 256,
                         canonical: bool = False):
        """Pure fast-path commit fn(scalars_canon, px_tm, py_tm) -> projective
        point, for embedding in jitted programs. The base arrays are RUNTIME
        ARGUMENTS (jit-closure constants feeding pallas inputs are ~70x
        slower — ops/pallas_field.field_consts_dev)."""
        from ..ops import msm_pallas as MP

        return lambda s, px, py: self._maybe_canon(
            MP.msm_pallas(self.spec, s, px, py, m, max_bits), canonical)

    def commit_split_pallas_fn(self, m: int, big_idx: np.ndarray,
                               max_bits: int = SMALL_BITS):
        """Split fast-path commit fn(s, px, py, pxb, pyb): small part via
        the pallas MSM at SMALL_BITS windows, the few full-width positions
        via a second (tiny) pallas MSM over their own pre-scaled bases
        (scaled_tm_big). Round 4: the big part previously ran as an XLA
        MSM — ~500 ms per J=128 batched split commit even pre-scaled."""
        from ..ops import msm_pallas as MP

        assert len(big_idx) <= self.NB_PAD, \
            f"{len(big_idx)} big positions > NB_PAD={self.NB_PAD}"
        big = jnp.asarray(big_idx.astype(np.int32))
        nb = len(big_idx)
        nbp = self.NB_PAD

        def fn(s, px, py, pxb, pyb):
            small = s.at[big].set(0) if nb else s
            acc = MP.msm_pallas(self.spec, small, px, py, m, max_bits)
            if nb:
                sb = jnp.zeros((nbp, F.N_LIMBS), jnp.int32)
                sb = sb.at[:nb].set(s[big])
                acc = C.pt_add(self.spec, acc,
                               MP.msm_pallas(self.spec, sb, pxb, pyb,
                                             nbp, 256))
            return acc

        return fn

    def commit_many_pallas_fn(self, m: int, max_bits: int = 256,
                              canonical: bool = False):
        """Batched fast-path commit fn(scalars (J, m, 32), px_tm, py_tm) ->
        stacked projective (J, 32) x3 — J MSMs over the SHARED base array in
        one dispatch (ops/msm_pallas.msm_pallas_many)."""
        from ..ops import msm_pallas as MP

        return lambda s, px, py: self._maybe_canon(
            MP.msm_pallas_many(self.spec, s, px, py, m, max_bits), canonical)

    def commit_many_pallas(self, scalars: jnp.ndarray,
                           max_bits: int = 256,
                           canonical: bool = False) -> C.Point:
        """Standalone-dispatch batched commit, jit-cached per (J, m, bits)."""
        J, m = scalars.shape[0], scalars.shape[1]
        key = ("pallas_many", J, m, max_bits, canonical)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(
                self.commit_many_pallas_fn(m, max_bits, canonical))
        px, py = self.scaled_tm(m, max_bits)
        return self._jit_cache[key](scalars, px, py)

    def commit_many_split_pallas_fn(self, m: int, big_idx: np.ndarray,
                                    max_bits: int = SMALL_BITS,
                                    canonical: bool = False):
        """Batched split commit fn(s, px, py, pxb, pyb): small parts
        through ONE msm_pallas_many dispatch at SMALL_BITS windows, the
        few full-width positions through a SECOND (tiny) msm_pallas_many
        over their own pre-scaled time-major bases (scaled_tm_big)."""
        from ..ops import msm_pallas as MP

        assert len(big_idx) <= self.NB_PAD, \
            f"{len(big_idx)} big positions > NB_PAD={self.NB_PAD}"
        big = jnp.asarray(big_idx.astype(np.int32))
        nb = len(big_idx)
        nbp = self.NB_PAD

        def fn(s, px, py, pxb, pyb):
            small = s.at[:, big].set(0) if nb else s
            acc = MP.msm_pallas_many(self.spec, small, px, py, m, max_bits)
            if nb:
                sb = jnp.zeros((s.shape[0], nbp, F.N_LIMBS), jnp.int32)
                sb = sb.at[:, :nb].set(s[:, big, :])
                bigp = MP.msm_pallas_many(self.spec, sb, pxb, pyb,
                                          nbp, 256)
                acc = jax.vmap(
                    lambda a, b2: C.pt_add(self.spec, a, b2))(acc, bigp)
            return self._maybe_canon(acc, canonical)

        return fn

    def commit_many_split_pallas(self, scalars: jnp.ndarray,
                                 big_idx: np.ndarray,
                                 canonical: bool = False) -> C.Point:
        """Standalone-dispatch batched split commit (per-shape jit cache)."""
        J, m = scalars.shape[0], scalars.shape[1]
        key = ("pallas_many_split", J, m, len(big_idx), canonical)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(
                self.commit_many_split_pallas_fn(m, big_idx,
                                                 canonical=canonical))
        px, py = self.scaled_tm(m, SMALL_BITS)
        pxb, pyb = self.scaled_tm_big(big_idx)
        return self._jit_cache[key](scalars, px, py, pxb, pyb)

    def commit_many_pallas_mesh(self, scalars: jnp.ndarray, mesh,
                                max_bits: int = 256, axis: str = "chain",
                                canonical: bool = False,
                                big_idx: Optional[np.ndarray] = None
                                ) -> C.Point:
        """Batched commit with the JOB axis sharded over a mesh axis —
        chain-per-chip lockstep (SURVEY.md §2c; VERDICT r03 next #10): each
        device runs the full pallas kernel chain on its J/D jobs against
        REPLICATED pre-scaled bases, so the fast path and the mesh compose
        (no collective needed; jobs are independent MSMs). J must divide by
        the axis size. big_idx selects the split variant (small windows +
        full-width positions via scaled_big)."""
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        J, m = scalars.shape[0], scalars.shape[1]
        D = mesh.shape[axis]
        assert J % D == 0, f"jobs {J} must divide by mesh axis {axis}={D}"
        nbig = -1 if big_idx is None else len(big_idx)
        key = ("pl_many_mesh", J, m, max_bits, canonical, nbig,
               id(mesh), axis)
        if key not in self._jit_cache:
            if big_idx is None:
                fn = self.commit_many_pallas_fn(m, max_bits, canonical)
                specs = (P(axis), P(), P())
            else:
                fn = self.commit_many_split_pallas_fn(m, big_idx,
                                                      canonical=canonical)
                specs = (P(axis), P(), P(), P(), P())
            self._jit_cache[key] = jax.jit(shard_map(
                fn, mesh=mesh, in_specs=specs,
                out_specs=(P(axis), P(axis), P(axis)), check_rep=False))
        if big_idx is None:
            return self._jit_cache[key](scalars,
                                        *self.scaled_tm(m, max_bits))
        px, py = self.scaled_tm(m, SMALL_BITS)
        pxb, pyb = self.scaled_tm_big(big_idx)
        return self._jit_cache[key](scalars, px, py, pxb, pyb)

    def commit_pallas(self, scalars_canon: jnp.ndarray,
                      max_bits: int = 256,
                      canonical: bool = False) -> C.Point:
        """Standalone-dispatch pallas commit, jit-cached per (m, max_bits).

        The TPU compile relay in this environment caches NOTHING across
        processes and each pallas-MSM compile costs minutes, so the prover
        reuses ONE standalone program per shape everywhere (fold loop, W
        commits, verify) instead of embedding the MSM into larger fused
        programs (each embedding = another full compile)."""
        m = scalars_canon.shape[0]
        key = ("pallas", m, max_bits, canonical)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(
                self.commit_pallas_fn(m, max_bits, canonical))
        px, py = self.scaled_tm(m, max_bits)
        return self._jit_cache[key](scalars_canon, px, py)

    def commit_split_pallas(self, scalars_canon: jnp.ndarray,
                            big_idx: np.ndarray) -> C.Point:
        """Standalone-dispatch split commit (two pallas MSMs: small-window
        main part + tiny full-width big part), jit-cached per shape."""
        m = scalars_canon.shape[0]
        key = ("pallas_split", m, len(big_idx))
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(
                self.commit_split_pallas_fn(m, big_idx))
        px, py = self.scaled_tm(m, SMALL_BITS)
        pxb, pyb = self.scaled_tm_big(big_idx)
        return self._jit_cache[key](scalars_canon, px, py, pxb, pyb)

    def commit_fn(self, m: int, max_bits: int = 256):
        """Pure commit function fn(scalars, scaled) for m scalars —
        composable under vmap/jit. The pre-scaled generator array is a
        RUNTIME ARGUMENT, never a closure: closure capture bakes it into
        the program as a constant (hundreds of MB at full width), which
        blows up serialized-HLO size (this environment's remote-compile
        relay rejects such programs outright)."""
        return lambda s, scaled: M.msm(self.spec, s, None,
                                       max_bits=max_bits, scaled=scaled)

    def commit_split_fn(self, m: int, big_idx: np.ndarray):
        """Pure split-commit fn(scalars, scaled_small): positions in
        big_idx full-width against HOST-pre-scaled bases (scaled_big — no
        256-step in-graph doubling scan), the rest with SMALL_BITS windows
        against the pre-scaled argument."""
        big = jnp.asarray(big_idx.astype(np.int32))
        big_scaled = self.scaled_big(big_idx) if len(big_idx) else None

        def fn(s, scaled_small):
            small = s.at[big].set(0) if len(big_idx) else s
            acc = M.msm(self.spec, small, None, max_bits=SMALL_BITS,
                        scaled=scaled_small)
            if len(big_idx):
                acc = C.pt_add(self.spec, acc,
                               M.msm(self.spec, s[big], None,
                                     max_bits=256, scaled=big_scaled))
            return acc

        return fn

    def commit(self, scalars_canon: jnp.ndarray,
               max_bits: int = 256) -> C.Point:
        """Commit to a vector of canonical-digit scalars (m, 32), m <= n.
        Jitted per (m, max_bits); repeated shapes hit the compile cache."""
        m = scalars_canon.shape[0]
        key = ("plain", m, max_bits)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(self.commit_fn(m, max_bits))
        return self._jit_cache[key](scalars_canon, self.scaled(m, max_bits))

    def commit_split(self, scalars_canon: jnp.ndarray,
                     big_idx: np.ndarray) -> C.Point:
        """Commit with the small/large split: positions in big_idx are
        committed full-width, the rest with SMALL_BITS windows."""
        m = scalars_canon.shape[0]
        key = ("split", m, len(big_idx))
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(self.commit_split_fn(m, big_idx))
        return self._jit_cache[key](scalars_canon,
                                    self.scaled(m, SMALL_BITS))
