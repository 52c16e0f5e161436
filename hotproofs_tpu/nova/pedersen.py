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

    def __post_init__(self):
        self._jit_cache = {}
        self._scaled = None  # (W=32, n, limbs) per coordinate, lazy

    def _scaled_points(self) -> C.Point:
        """Pre-scaled generators 256^w * G_j for the fixed-base MSM path
        (computed once on device; the bases of a commitment key never
        change, so every window's Horner weighting is baked in)."""
        if self._scaled is None:
            f = jax.jit(lambda p: M.scale_generators(self.spec, p, 32))
            self._scaled = jax.tree_util.tree_map(lambda x: x, f(self.points))
        return self._scaled

    @staticmethod
    def create(spec: C.CurveSpec, label: bytes, n: int) -> "CommitmentKey":
        limbs = _load_or_derive(spec, label, n)
        x = jnp.asarray(limbs[:, 0])
        y = jnp.asarray(limbs[:, 1])
        z = jnp.broadcast_to(jnp.asarray(spec.base.one_mont_limbs),
                             (n, F.N_LIMBS))
        return CommitmentKey(spec, n, (x, y, z), limbs)

    def commit(self, scalars_canon: jnp.ndarray,
               max_bits: int = 256) -> C.Point:
        """Commit to a vector of canonical-digit scalars (m, 32), m <= n.
        Jitted per (m, max_bits); repeated shapes hit the compile cache."""
        m = scalars_canon.shape[0]
        key = ("plain", m, max_bits)
        if key not in self._jit_cache:
            pts = tuple(p[:m] for p in self.points)
            self._jit_cache[key] = jax.jit(
                lambda s: M.msm(self.spec, s, pts, max_bits=max_bits))
        return self._jit_cache[key](scalars_canon)

    def commit_split(self, scalars_canon: jnp.ndarray,
                     big_idx: np.ndarray) -> C.Point:
        """Commit with the small/large split: positions in big_idx are
        committed full-width, the rest with SMALL_BITS windows."""
        m = scalars_canon.shape[0]
        key = ("split", m, len(big_idx))
        if key not in self._jit_cache:
            pts = tuple(p[:m] for p in self.points)
            big = jnp.asarray(big_idx.astype(np.int32))

            def fn(s):
                small = s.at[big].set(0) if len(big_idx) else s
                acc = M.msm(self.spec, small, pts, max_bits=SMALL_BITS)
                if len(big_idx):
                    big_pts = tuple(p[big] for p in pts)
                    acc = C.pt_add(self.spec, acc,
                                   M.msm(self.spec, s[big], big_pts,
                                         max_bits=256))
                return acc

            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key](scalars_canon)
