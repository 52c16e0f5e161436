"""Batched BLAKE3 witness generation on device (pure uint32 JAX ops).

TPU-native replacement for the circom-emitted sequential WASM witness
calculator (build/*_js/witness_calculator.js:137-208, ~69k signals evaluated
one at a time per proof step): computes ENTIRE witness matrices for batches
of instances as fused vector ops — bit decompositions, uint32 adds with
explicit carry extraction, word XORs and boolean control logic. This is
SURVEY.md §7 P2 / BASELINE config 3 (4096 blocks per chip), extended to the
full Nova step circuit so per-step witnesses for a whole fold chain are one
batched kernel call.

Exactness: emission order mirrors the DSL allocation order signal-for-signal
(tests assert bit-equality against the self-checking host EvalCtx).

Full-width signals: the step circuit has exactly three IsZero inverse hints
(depth, block_count, block_count-(n_blocks-1)); every other signal fits
uint32. The batched kernel emits a placeholder 0/1 at those positions
(the *is-zero* flags it computes anyway) and reports their indices via
``nova_big_positions``; callers patch the three modular inverses (host
precomputable from the public schedule alone) when building field vectors.
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
from .blake3_nova import IO_ARITY, get_nova_step_circuit

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


class _Emitter:
    def __init__(self):
        self.aux: List[jnp.ndarray] = []
        self.cursor = 0  # signals emitted so far (aux only)

    def bits(self, w, n=32):
        self.aux.append(_decomp(w, n))
        self.cursor += n

    def split2(self, low, carry):  # Bits34: 32 bits + 2 carry bits
        self.aux.append(jnp.concatenate(
            [_decomp(low, 32), (carry & U32(1))[..., None],
             (carry >> U32(1))[..., None]], axis=-1))
        self.cursor += 34

    def split1(self, low, carry):  # Bits33: 32 bits + 1 carry bit
        self.aux.append(jnp.concatenate(
            [_decomp(low, 32), carry[..., None]], axis=-1))
        self.cursor += 33

    def one(self, v):
        self.aux.append(v[..., None])
        self.cursor += 1


def _compression_core(em: _Emitter, h_words: List[jnp.ndarray],
                      m_words: List[jnp.ndarray], t0, t1, b, d
                      ) -> List[jnp.ndarray]:
    """Emit the compression_gadget aux signals; returns 16 output words.
    Mirrors blake3_compression.compression_gadget allocation order."""
    B = t0.shape[0]
    for w in (t0, t1, b, d):
        em.bits(w)

    state = list(h_words)
    state += [jnp.full((B,), IV[i], U32) for i in range(4)]
    state += [t0, t1, b, d]
    msg = list(m_words)

    for rnd in range(7):
        for gi, (ia, ib, ic, id_) in enumerate(G_SCHEDULE):
            va, vb, vc, vd = state[ia], state[ib], state[ic], state[id_]
            mx, my = msg[2 * gi], msg[2 * gi + 1]

            low, carry = _add_with_carry(va, vb, mx)
            em.split2(low, carry)
            va = low
            x = vd ^ va
            em.bits(x)
            vd = _rotr(x, R1)
            low, carry = _add_with_carry(vc, vd)
            em.split1(low, carry)
            vc = low
            x = vb ^ vc
            em.bits(x)
            vb = _rotr(x, R2)
            low, carry = _add_with_carry(va, vb, my)
            em.split2(low, carry)
            va = low
            x = vd ^ va
            em.bits(x)
            vd = _rotr(x, R3)
            low, carry = _add_with_carry(vc, vd)
            em.split1(low, carry)
            vc = low
            x = vb ^ vc
            em.bits(x)
            vb = _rotr(x, R4)

            state[ia], state[ib], state[ic], state[id_] = va, vb, vc, vd
        if rnd < 6:
            msg = [msg[p] for p in MSG_PERMUTATION]

    out_words = []
    for i in range(8):
        x = state[i] ^ state[i + 8]
        out_words.append(x)
        em.bits(x)
    for i in range(8, 16):
        x = state[i] ^ h_words[i - 8]
        out_words.append(x)
        em.bits(x)
    return out_words


def batched_compression_witness(h: jnp.ndarray, m: jnp.ndarray,
                                t: jnp.ndarray, b: jnp.ndarray,
                                d: jnp.ndarray) -> jnp.ndarray:
    """Witness matrix (B, n_signals) uint32 for the standalone circuit.
    Inputs: h (B,8), m (B,16), t (B,2), b (B,), d (B,) uint32."""
    h, m, t = h.astype(U32), m.astype(U32), t.astype(U32)
    b, d = b.astype(U32), d.astype(U32)
    B = h.shape[0]
    em = _Emitter()
    for i in range(8):  # h_bits scope
        em.bits(h[:, i])
    out_words = _compression_core(
        em, [h[:, i] for i in range(8)], [m[:, i] for i in range(16)],
        t[:, 0], t[:, 1], b, d)
    header = jnp.concatenate(
        [jnp.ones((B, 1), U32), jnp.stack(out_words, axis=1), h, m, t,
         b[..., None], d[..., None]], axis=1)
    return jnp.concatenate([header] + em.aux, axis=1)


def batched_nova_witness(z_in: jnp.ndarray, m: jnp.ndarray, b: jnp.ndarray,
                         down_left: jnp.ndarray,
                         d_flags: int = 0,
                         depth_bits: int = 8) -> jnp.ndarray:
    """Witness matrix (B, n_signals) uint32 for the Nova step circuit.

    z_in: (B, 15) uint32 (all z components fit u32 by construction);
    m: (B, 16); b, down_left: (B,). The three IsZero inverse positions carry
    placeholder values (patch via nova_big_positions + host inverses).
    depth_bits must match the circuit's (blake3_nova.nova_step_body)."""
    z_in, m = z_in.astype(U32), m.astype(U32)
    b, down_left = b.astype(U32), down_left.astype(U32)
    B = z_in.shape[0]
    em = _Emitter()

    n_blocks, block_count = z_in[:, 0], z_in[:, 1]
    h_w = [z_in[:, 2 + i] for i in range(8)]
    total_depth, depth = z_in[:, 10], z_in[:, 11]
    cil, cih = z_in[:, 12], z_in[:, 13]
    leaf_depth = z_in[:, 14]

    # depth_check scope.
    two_pow_d = U32(1 << depth_bits)
    em.bits(depth, depth_bits)
    em.bits(leaf_depth, depth_bits)
    is_root = (depth == 0).astype(U32)
    em.one(jnp.zeros((B,), U32))  # inv placeholder (is_zero(depth))
    em.one(is_root)
    ltv = depth + two_pow_d - (leaf_depth - U32(1))
    em.bits(ltv, depth_bits + 1)
    is_parent = U32(1) - ((ltv >> U32(depth_bits)) & U32(1))
    ltv2 = depth + two_pow_d - leaf_depth
    em.bits(ltv2, depth_bits + 1)

    # flags scope.
    not_parent = U32(1) - is_parent
    eq_first = (block_count == 0).astype(U32)
    em.one(jnp.zeros((B,), U32))  # inv placeholder (is_zero(block_count))
    em.one(eq_first)
    eq_last = (block_count == n_blocks - U32(1)).astype(U32)
    em.one(jnp.zeros((B,), U32))  # inv placeholder
    em.one(eq_last)
    first_set = eq_first * not_parent
    em.one(first_set)
    is_last_block = eq_last * not_parent
    em.one(is_last_block)
    par_and_last = is_parent * eq_last
    em.one(par_and_last)
    par_or_last = is_parent + eq_last - par_and_last
    use_root = par_or_last * is_root
    em.one(use_root)
    d_word = (U32(d_flags) + first_set + U32(2) * is_last_block
              + U32(8) * use_root + U32(4) * is_parent)

    # h_bits scope.
    for i in range(8):
        em.bits(h_w[i])

    # message scope.
    dl = jnp.where(is_parent.astype(bool), down_left, U32(1))
    em.one(dl)
    m_eff = []
    for i in range(8):
        pl = jnp.where(dl.astype(bool), h_w[i], m[:, i])
        em.one(pl)
        me = jnp.where(is_parent.astype(bool), pl, m[:, i])
        em.one(me)
        m_eff.append(me)
    for i in range(8, 16):
        pr = jnp.where(dl.astype(bool), m[:, i - 8], h_w[i - 8])
        em.one(pr)
        me = jnp.where(is_parent.astype(bool), pr, m[:, i])
        em.one(me)
        m_eff.append(me)

    # h_comp scope: 8x32 per-bit muxes against constant IV bits.
    h_comp = []
    for i in range(8):
        hc = jnp.where(is_parent.astype(bool), jnp.full((B,), IV[i], U32),
                       h_w[i])
        em.bits(hc)  # the 32 mux outputs ARE the bits of hc, in bit order
        h_comp.append(hc)

    # t scope.
    t0 = cil * not_parent
    em.one(t0)
    t1 = cih * not_parent
    em.one(t1)

    # compress scope.
    out_words = _compression_core(em, h_comp, m_eff, t0, t1,
                                  b.astype(U32), d_word)

    # update scope.
    decr = (is_last_block + is_parent) * (U32(1) - is_root)
    em.one(decr)

    z_out = jnp.stack(
        [n_blocks, block_count + not_parent] + out_words[:8]
        + [total_depth, depth - decr, cil, cih, leaf_depth], axis=1)
    header = jnp.concatenate(
        [jnp.ones((B, 1), U32), z_out, z_in, m, b[..., None],
         down_left[..., None]], axis=1)
    return jnp.concatenate([header] + em.aux, axis=1)


@lru_cache(maxsize=None)
def nova_big_positions(modulus: int = VESTA_PRIME,
                       depth_bits: int = 8) -> np.ndarray:
    """Signal indices of the three full-width IsZero inverse hints."""
    _, layout = get_nova_step_circuit(modulus, 0, depth_bits)
    idx = [seg.start for seg in layout.segments
           if seg.role == "aux" and seg.name.endswith("/inv")]
    assert len(idx) == 3
    return np.asarray(idx, np.int64)


def nova_inverse_values(depth: int, block_count: int, n_blocks: int,
                        modulus: int = VESTA_PRIME) -> List[int]:
    """Host-side values for the three inverse hints of one step (exact
    mirror of the is_zero hint lambdas — functions of the public schedule)."""
    def inv(v):
        v %= modulus
        return pow(v, modulus - 2, modulus) if v else 0

    return [inv(depth), inv(block_count),
            inv(block_count - (n_blocks - 1))]


@lru_cache(maxsize=None)
def jitted_generator():
    return jax.jit(batched_compression_witness)


@lru_cache(maxsize=None)
def jitted_nova_generator(d_flags: int = 0, depth_bits: int = 8):
    return jax.jit(lambda z, m, b, dl: batched_nova_witness(
        z, m, b, dl, d_flags, depth_bits))


def expected_n_signals(modulus: int = VESTA_PRIME) -> int:
    r1cs, _ = get_compression_circuit(modulus)
    return r1cs.n_signals
