"""Batched BLAKE3 witness generation on device (pure uint32 JAX ops).

TPU-native replacement for the circom-emitted sequential WASM witness
calculator (build/*_js/witness_calculator.js:137-208, ~69k signals evaluated
one at a time per proof step): computes the ENTIRE witness matrix for a
batch of independent compression instances as a handful of fused vector ops
— bit decompositions, uint32 adds with explicit carry extraction, and word
XORs. This is SURVEY.md §7 P2 / BASELINE config 3 (4096 blocks per chip).

Exactness: emission order mirrors the DSL allocation order of
blake3_compression.standalone_compression signal-for-signal; tests assert
bit-equality against the (self-checking) host EvalCtx witness. The circuit
contains no field-wide hints (no IsZero), so every signal fits uint32 and no
modular arithmetic is needed anywhere.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.blake3_ref import IV, MSG_PERMUTATION
from .blake3_compression import (G_SCHEDULE, R1, R2, R3, R4, VESTA_PRIME,
                                 get_compression_circuit)

U32 = jnp.uint32


def _decomp(w: jnp.ndarray, n: int = 32) -> jnp.ndarray:
    """(B,) uint32 -> (B, n) uint32 bits, LSB first."""
    return (w[..., None] >> jnp.arange(n, dtype=U32)) & U32(1)


def _rotr(w: jnp.ndarray, r: int) -> jnp.ndarray:
    return (w >> U32(r)) | (w << U32(32 - r))


def _add_with_carry(*terms: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sum uint32 terms; returns (low 32 bits, wrap count) — the wrap count
    IS the value of bits 32+ of the exact sum."""
    acc = terms[0]
    carry = jnp.zeros_like(acc)
    for t in terms[1:]:
        nxt = acc + t
        carry = carry + (nxt < acc).astype(U32)
        acc = nxt
    return acc, carry


def batched_compression_witness(h: jnp.ndarray, m: jnp.ndarray,
                                t: jnp.ndarray, b: jnp.ndarray,
                                d: jnp.ndarray) -> jnp.ndarray:
    """Full witness matrix (B, n_signals) int32 for the standalone
    compression circuit. Inputs: h (B,8), m (B,16), t (B,2) uint32;
    b, d (B,) uint32."""
    h, m, t = h.astype(U32), m.astype(U32), t.astype(U32)
    b, d = b.astype(U32), d.astype(U32)
    B = h.shape[0]
    aux: List[jnp.ndarray] = []

    def emit_bits(w, n=32):
        aux.append(_decomp(w, n))

    def emit_split2(low, carry):  # Bits34: 32 bits + 2 carry bits
        aux.append(jnp.concatenate(
            [_decomp(low, 32), (carry & U32(1))[..., None],
             (carry >> U32(1))[..., None]], axis=-1))

    def emit_split1(low, carry):  # Bits33: 32 bits + 1 carry bit
        aux.append(jnp.concatenate(
            [_decomp(low, 32), carry[..., None]], axis=-1))

    # h_bits scope: ToBits(32) per h word.
    for i in range(8):
        emit_bits(h[:, i])
    # init scope: t0, t1, b, d decompositions.
    for w in (t[:, 0], t[:, 1], b, d):
        emit_bits(w)

    state = [h[:, i] for i in range(8)]
    state += [jnp.full((B,), IV[i], U32) for i in range(4)]
    state += [t[:, 0], t[:, 1], b, d]
    msg = [m[:, i] for i in range(16)]

    for rnd in range(7):
        for gi, (ia, ib, ic, id_) in enumerate(G_SCHEDULE):
            va, vb, vc, vd = state[ia], state[ib], state[ic], state[id_]
            mx, my = msg[2 * gi], msg[2 * gi + 1]

            low, carry = _add_with_carry(va, vb, mx)
            emit_split2(low, carry)
            va = low
            x = vd ^ va
            emit_bits(x)
            vd = _rotr(x, R1)
            low, carry = _add_with_carry(vc, vd)
            emit_split1(low, carry)
            vc = low
            x = vb ^ vc
            emit_bits(x)
            vb = _rotr(x, R2)
            low, carry = _add_with_carry(va, vb, my)
            emit_split2(low, carry)
            va = low
            x = vd ^ va
            emit_bits(x)
            vd = _rotr(x, R3)
            low, carry = _add_with_carry(vc, vd)
            emit_split1(low, carry)
            vc = low
            x = vb ^ vc
            emit_bits(x)
            vb = _rotr(x, R4)

            state[ia], state[ib], state[ic], state[id_] = va, vb, vc, vd
        if rnd < 6:
            msg = [msg[p] for p in MSG_PERMUTATION]

    out_words = []
    for i in range(8):
        x = state[i] ^ state[i + 8]
        out_words.append(x)
        emit_bits(x)
    for i in range(8, 16):
        x = state[i] ^ h[:, i - 8]
        out_words.append(x)
        emit_bits(x)

    header = jnp.concatenate(
        [jnp.ones((B, 1), U32), jnp.stack(out_words, axis=1), h, m, t,
         b[..., None], d[..., None]], axis=1)
    # Whole matrix is uint32 (words can exceed int31).
    return jnp.concatenate([header] + aux, axis=1)


@lru_cache(maxsize=None)
def jitted_generator():
    return jax.jit(batched_compression_witness)


def expected_n_signals(modulus: int = VESTA_PRIME) -> int:
    r1cs, _ = get_compression_circuit(modulus)
    return r1cs.n_signals
