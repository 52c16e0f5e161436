"""Batched elliptic-curve arithmetic for TPU (short Weierstrass, a=0).

TPU-native replacement for the reference's CPU curve stacks (`pasta_curves`,
`halo2curves` — rust_fold/Cargo.toml:24,29). Points are projective (X:Y:Z)
triples of Montgomery-form limb vectors (hotproofs_tpu.ops.field), and ALL
group operations use the complete addition formulas of Renes–Costello–Batina
2015 (Algorithms 7 and 9 for a=0 curves): branchless, no special cases for
identity or doubling — exactly what SIMD/VPU execution needs. Identity is
(0 : 1 : 0).

Supported curves: Pallas/Vesta (y^2 = x^3 + 5, the reference's test engines,
main.rs:364-371), BN254 G1 (y^2 = x^3 + 3) and Grumpkin (y^2 = x^3 - 17),
matching the reference's Bn256EngineZM/GrumpkinEngine default (main.rs:319).

Host-side exact-integer mirrors (host_*) serve as oracles for tests and for
one-off host computations (generator derivation, proof verification spot
checks).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import field as F

Point = Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]  # (X, Y, Z) limb arrays


@dataclass(frozen=True)
class CurveSpec:
    name: str
    base: F.FieldSpec     # coordinate field
    scalar: F.FieldSpec   # group order field
    b: int                # curve constant: y^2 = x^3 + b
    gen: Tuple[int, int]  # affine generator

    @property
    def b3_mont(self) -> np.ndarray:
        b3 = (3 * self.b) % self.base.p
        return F.int_to_limbs((b3 * self.base.r_mod_p) % self.base.p)


def _sqrt_mod(a: int, p: int) -> Optional[int]:
    """Tonelli–Shanks square root (host-side, generator derivation only)."""
    a %= p
    if a == 0:
        return 0
    if pow(a, (p - 1) // 2, p) != 1:
        return None
    if p % 4 == 3:
        return pow(a, (p + 1) // 4, p)
    q, s = p - 1, 0
    while q % 2 == 0:
        q //= 2
        s += 1
    z = 2
    while pow(z, (p - 1) // 2, p) != p - 1:
        z += 1
    m, c, t, r = s, pow(z, q, p), pow(a, q, p), pow(a, (q + 1) // 2, p)
    while t != 1:
        i, tt = 0, t
        while tt != 1:
            tt = tt * tt % p
            i += 1
        bex = pow(c, 1 << (m - i - 1), p)
        m, c, t, r = i, bex * bex % p, t * bex * bex % p, r * bex % p
    return r


def _grumpkin_gen_y() -> int:
    p = F.BN254_FR
    return _sqrt_mod((1 - 17) % p, p)


PALLAS = CurveSpec("pallas", F.pallas_base, F.pallas_scalar, 5,
                   (F.PALLAS_P - 1, 2))
VESTA = CurveSpec("vesta", F.vesta_base, F.vesta_scalar, 5,
                  (F.VESTA_P - 1, 2))
BN254 = CurveSpec("bn254", F.bn254_base, F.bn254_scalar, 3, (1, 2))
GRUMPKIN = CurveSpec("grumpkin", F.grumpkin_base, F.grumpkin_scalar,
                     (-17) % F.BN254_FR, (1, _grumpkin_gen_y()))

CURVES = {c.name: c for c in (PALLAS, VESTA, BN254, GRUMPKIN)}


# ---------------------------------------------------------------------------
# Batched point ops (Montgomery-form limbs).
# ---------------------------------------------------------------------------


def identity(shape=()) -> Point:
    """(0 : 1 : 0) — but note Y must be 1 in Montgomery form per-curve; use
    identity_for(spec) when the curve is known."""
    raise NotImplementedError("use identity_for(spec, shape)")


def identity_for(spec: CurveSpec, shape=()) -> Point:
    x = F.zeros(shape)
    y = jnp.broadcast_to(jnp.asarray(spec.base.one_mont_limbs),
                         tuple(shape) + (F.N_LIMBS,))
    z = F.zeros(shape)
    return (x, y, z)


def pt_add(spec: CurveSpec, p: Point, q: Point) -> Point:
    """Complete projective addition, RCB15 Algorithm 7 (a=0). 12 mulmods."""
    f = spec.base
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    b3 = jnp.asarray(spec.b3_mont)
    mul = lambda a, b: F.mont_mul(f, a, b)
    add = lambda a, b: F.add(f, a, b)
    sub = lambda a, b: F.sub(f, a, b)

    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t2 = mul(Z1, Z2)
    t3 = mul(add(X1, Y1), add(X2, Y2))
    t3 = sub(t3, add(t0, t1))
    t4 = mul(add(Y1, Z1), add(Y2, Z2))
    t4 = sub(t4, add(t1, t2))
    X3 = mul(add(X1, Z1), add(X2, Z2))
    Y3 = sub(X3, add(t0, t2))
    X3 = add(t0, t0)
    t0 = add(X3, t0)
    t2 = mul(b3, t2)
    Z3 = add(t1, t2)
    t1 = sub(t1, t2)
    Y3 = mul(b3, Y3)
    X3 = mul(t4, Y3)
    X3 = sub(mul(t3, t1), X3)
    Y3 = add(mul(t1, Z3), mul(Y3, t0))
    Z3 = add(mul(Z3, t4), mul(t0, t3))
    return (X3, Y3, Z3)


def pt_double(spec: CurveSpec, p: Point) -> Point:
    """Complete projective doubling, RCB15 Algorithm 9 (a=0). 8 mulmods."""
    f = spec.base
    X, Y, Z = p
    b3 = jnp.asarray(spec.b3_mont)
    mul = lambda a, b: F.mont_mul(f, a, b)
    add = lambda a, b: F.add(f, a, b)
    sub = lambda a, b: F.sub(f, a, b)

    t0 = mul(Y, Y)
    Z3 = add(t0, t0)
    Z3 = add(Z3, Z3)
    Z3 = add(Z3, Z3)
    t1 = mul(Y, Z)
    t2 = mul(Z, Z)
    t2 = mul(b3, t2)
    X3 = mul(t2, Z3)
    Y3 = add(t0, t2)
    Z3 = mul(t1, Z3)
    t1 = add(t2, t2)
    t2 = add(t1, t2)
    t0 = sub(t0, t2)
    Y3 = mul(t0, Y3)
    Y3 = add(X3, Y3)
    t1 = mul(X, Y)
    X3 = mul(t0, t1)
    X3 = add(X3, X3)
    return (X3, Y3, Z3)


def pt_select(mask: jnp.ndarray, p: Point, q: Point) -> Point:
    """mask ? p : q (mask shape = batch shape)."""
    return tuple(F.select(mask, a, b) for a, b in zip(p, q))


def pt_scalar_mul(spec: CurveSpec, scalar_limbs: jnp.ndarray,
                  p: Point) -> Point:
    """Double-and-add over the 256 limb bits, MSB-first, via lax.scan."""
    bits = []
    for i in range(F.N_LIMBS * F.LIMB_BITS):
        limb, off = divmod(i, F.LIMB_BITS)
        bits.append((scalar_limbs[..., limb] >> off) & 1)
    bits_arr = jnp.stack(bits[::-1])  # (256, ...) MSB first

    acc0 = identity_for(spec, p[0].shape[:-1])

    def step(acc, bit):
        acc = pt_double(spec, acc)
        added = pt_add(spec, acc, p)
        acc = pt_select(bit, added, acc)
        return acc, None

    acc, _ = jax.lax.scan(step, acc0, bits_arr)
    return acc


def pt_from_affine(spec: CurveSpec, x: int, y: int) -> Point:
    """Host constructor: affine ints -> Montgomery projective arrays."""
    f = spec.base
    r = f.r_mod_p
    xm = jnp.asarray(F.int_to_limbs((x % f.p) * r % f.p))
    ym = jnp.asarray(F.int_to_limbs((y % f.p) * r % f.p))
    zm = jnp.asarray(f.one_mont_limbs)
    return (xm, ym, zm)


def pt_to_affine_host(spec: CurveSpec, p: Point):
    """Host-side: convert (possibly batched) points to affine int pairs.
    Returns list of (x, y) or None (identity)."""
    f = spec.base
    X = f.limbs_to_ints(np.asarray(F.jitted("from_mont", f)(p[0]))).ravel()
    Y = f.limbs_to_ints(np.asarray(F.jitted("from_mont", f)(p[1]))).ravel()
    Z = f.limbs_to_ints(np.asarray(F.jitted("from_mont", f)(p[2]))).ravel()
    out = []
    for x, y, z in zip(X.tolist(), Y.tolist(), Z.tolist()):
        if z == 0:
            out.append(None)
        else:
            zi = pow(z, f.p - 2, f.p)
            out.append((x * zi % f.p, y * zi % f.p))
    return out


def pt_to_affine_host_canon(spec: CurveSpec, p) -> list:
    """Host-only affine conversion of CANONICAL-limb projective points
    (tuple of (n, 32) arrays already converted from Montgomery form INSIDE
    the producing program). Unlike pt_to_affine_host this dispatches NO
    device work — three tiny from_mont dispatches through the compile
    relay measured ~185 ms per call (tools/profile_lockstep_phases.py),
    paid once per fold on the hot path."""
    f = spec.base
    X = f.limbs_to_ints(np.asarray(p[0])).ravel()
    Y = f.limbs_to_ints(np.asarray(p[1])).ravel()
    Z = f.limbs_to_ints(np.asarray(p[2])).ravel()
    out = []
    for x, y, z in zip(X.tolist(), Y.tolist(), Z.tolist()):
        if z == 0:
            out.append(None)
        else:
            zi = pow(z, f.p - 2, f.p)
            out.append((x * zi % f.p, y * zi % f.p))
    return out


def pt_stack(points: Sequence[Point]) -> Point:
    return tuple(jnp.stack([pt[i] for pt in points]) for i in range(3))


# ---------------------------------------------------------------------------
# Host-side exact-integer oracle (affine; None = identity).
# ---------------------------------------------------------------------------


def host_add(spec: CurveSpec, p, q):
    pp = spec.base.p
    if p is None:
        return q
    if q is None:
        return p
    x1, y1 = p
    x2, y2 = q
    if x1 == x2 and (y1 + y2) % pp == 0:
        return None
    if p == q:
        lam = (3 * x1 * x1) * pow(2 * y1, pp - 2, pp) % pp
    else:
        lam = (y2 - y1) * pow(x2 - x1, pp - 2, pp) % pp
    x3 = (lam * lam - x1 - x2) % pp
    y3 = (lam * (x1 - x3) - y1) % pp
    return (x3, y3)


def _host_proj_add(spec: CurveSpec, P, Q):
    """RCB15 Alg 7 on host ints, projective (X, Y, Z); identity=(0,1,0)."""
    m = spec.base.p
    b3 = 3 * spec.b % m
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    t0 = X1 * X2 % m
    t1 = Y1 * Y2 % m
    t2 = Z1 * Z2 % m
    t3 = ((X1 + Y1) * (X2 + Y2) - t0 - t1) % m
    t4 = ((Y1 + Z1) * (Y2 + Z2) - t1 - t2) % m
    ty = ((X1 + Z1) * (X2 + Z2) - t0 - t2) % m
    x3 = 3 * t0 % m
    t2b = b3 * t2 % m
    z3 = (t1 + t2b) % m
    t1b = (t1 - t2b) % m
    yb = b3 * ty % m
    X3 = (t3 * t1b - t4 * yb) % m
    Y3 = (t1b * z3 + yb * x3) % m
    Z3 = (z3 * t4 + x3 * t3) % m
    return (X3, Y3, Z3)


def host_scalar_mul(spec: CurveSpec, k: int, p):
    """Host double-and-add in projective coords (one inverse at the end)."""
    if p is None:
        return None
    k %= spec.scalar.p
    if k == 0:
        return None
    m = spec.base.p
    acc = (0, 1, 0)
    pp = (p[0], p[1], 1)
    while k:
        if k & 1:
            acc = _host_proj_add(spec, acc, pp)
        pp = _host_proj_add(spec, pp, pp)
        k >>= 1
    X, Y, Z = acc
    if Z == 0:
        return None
    zi = pow(Z, m - 2, m)
    return (X * zi % m, Y * zi % m)


def host_msm(spec: CurveSpec, scalars: Sequence[int], points) -> object:
    acc = None
    for k, p in zip(scalars, points):
        acc = host_add(spec, acc, host_scalar_mul(spec, int(k), p))
    return acc


def host_on_curve(spec: CurveSpec, p) -> bool:
    if p is None:
        return True
    x, y = p
    return (y * y - (x * x * x + spec.b)) % spec.base.p == 0


# ---------------------------------------------------------------------------
# Deterministic generator derivation (commitment keys).
# ---------------------------------------------------------------------------


def derive_generators(spec: CurveSpec, label: bytes, n: int) -> List[Tuple[int, int]]:
    """Derive n independent generators by hash-to-x + try-and-increment.

    TPU-stack equivalent of arecibo's commitment-key derivation (used by
    PublicParams::setup, rust_fold/src/main.rs:99-109). The procedure is our
    own (documented, deterministic): x = SHA-512(label || i || ctr) mod p,
    take the lexicographically smaller square root for y, cofactor is 1 for
    all supported curves. Nothing-up-my-sleeve derivation; independence holds
    under the random-oracle heuristic."""
    p = spec.base.p
    out: List[Tuple[int, int]] = []
    for i in range(n):
        ctr = 0
        while True:
            h = hashlib.sha512(
                b"hotproofs_tpu/gen/" + spec.name.encode() + b"/" + label
                + i.to_bytes(8, "little") + ctr.to_bytes(4, "little")
            ).digest()
            x = int.from_bytes(h, "little") % p
            y2 = (x * x * x + spec.b) % p
            y = _sqrt_mod(y2, p)
            if y is not None:
                y = min(y, p - y)
                out.append((x, y))
                break
            ctr += 1
    return out
