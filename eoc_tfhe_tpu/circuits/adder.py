"""Homomorphic integer circuits over bootstrapped gates.

BASELINE.json configs[2]: the full boolean gate set chained into an 8-bit
ripple-carry adder. The reference has no circuit layer (its wrapper only does
leveled add/sub); this is new capability required by the north star.

Gate-level batching: there is no parallelism across the ripple (the carry is
sequential), but every bit-level gate call is batched over the adder batch —
the scaling axis that replaces "sequence length" (SURVEY.md §5).

Fast mode (default, r5): the carry-save identity gives the full adder in
ONE bootstrap per bit — carry_out = MAJ(a,b,c) (a sign bootstrap), sum a
pure linear combination (enc(a⊕b⊕c) = enc(a)+enc(b)+enc(c)−2·enc(maj),
exact on the ±1/8 encoding) — plus one BATCHED refresh bootstrap over all
sum bits.  An 8-bit add is 9 blind-rotate calls (8·B + 8B-batch rotate
work) vs the classic XOR/XOR/MUX chain's 24 calls (≈32·B rotate work):
~3.5× less bootstrap work, ~2.7× fewer sequential dispatches, with every
output still a fresh bootstrap output and no internal decision margin
worse than the classic path's own XOR (see full_adder_fast).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import gates
from ..core.lwe import (LweCiphertext, lwe_add, lwe_add_mul, lwe_index,
                        lwe_negate, lwe_stack, lwe_sub_mul)
from ..core.bootstrap import EvalKey
from ..core.params import GateBootstrappingParams


def full_adder(a: LweCiphertext, b: LweCiphertext, carry: LweCiphertext,
               ek: EvalKey, params: GateBootstrappingParams,
               rotation_impl: str = "auto") -> tuple[LweCiphertext, LweCiphertext]:
    """(sum, carry_out) — 3 bootstrapped gates + one MUX (2 woKS bootstraps).

    carry_out = MUX(a XOR b, carry_in, a): if a != b the carry propagates,
    otherwise it equals a (= b).
    """
    t = gates.xor_(a, b, ek, params, rotation_impl)
    s = gates.xor_(t, carry, ek, params, rotation_impl)
    carry_out = gates.mux(t, carry, a, ek, params, rotation_impl)
    return s, carry_out


def full_adder_fast(a: LweCiphertext, b: LweCiphertext, carry: LweCiphertext,
                    ek: EvalKey, params: GateBootstrappingParams,
                    rotation_impl: str = "auto"
                    ) -> tuple[LweCiphertext, LweCiphertext]:
    """(sum, carry_out) in ONE bootstrap — the carry-save identity.

    carry_out = MAJ(a, b, c): a single sign bootstrap of L = a + b + c
    (gates.maj — input stdev sqrt(3)·sigma, LOWER than a plain XOR's
    sqrt(8)·sigma).  The sum then needs NO bootstrap: with bits encoded as
    ±1/8, ``enc(a⊕b⊕c) = enc(a) + enc(b) + enc(c) − 2·enc(MAJ(a,b,c))``
    holds EXACTLY on the torus (all four phase cases land on ±1/8 with no
    wrap; t ones → L = (2t−3)/8, maj = t≥2 — check: t=0 → −3/8+2/8 = −1/8,
    t=1 → −1/8+2/8 = 1/8, t=2 → 1/8−2/8 = −1/8, t=3 → 3/8−2/8 = 1/8).

    Output-noise contract: carry_out is a fresh bootstrap output (the
    ripple chain stays at constant noise); the sum is a LINEAR combination
    with var(sum) = var(a)+var(b)+var(c)+4·var(carry_out) (~7× a fresh
    output; tracked exactly in current_variance).  Decrypting such a sum
    is safe at both shipped parameter sets; chaining it into further gates
    consumes margin — use ripple_carry_add's default refresh for
    compose-safe outputs.
    """
    cout = gates.maj(a, b, carry, ek, params, rotation_impl)
    s = lwe_sub_mul(lwe_add(lwe_add(a, b), carry), 2, cout)
    return s, cout


def half_adder_fast(a: LweCiphertext, b: LweCiphertext, ek: EvalKey,
                    params: GateBootstrappingParams,
                    rotation_impl: str = "auto"
                    ) -> tuple[LweCiphertext, LweCiphertext]:
    """(sum, carry) in ONE bootstrap: carry = AND(a, b); the sum is linear.

    On the ±1/8 encoding, ``enc(a⊕b) = enc(a) + enc(b) − 2·enc(a∧b) − 1/8``
    exactly (t ones → L = (2t−2)/8: t=0 → −2/8+2/8−1/8 = −1/8, t=1 →
    0+2/8−1/8 = 1/8, t=2 → 2/8−2/8−1/8 = −1/8).  Same output-noise
    contract as full_adder_fast: carry fresh, sum linear
    (var(a)+var(b)+4·var(carry) ≈ 6× a fresh output, tracked)."""
    carry = gates.and_(a, b, ek, params, rotation_impl)
    s = lwe_sub_mul(lwe_add(a, b), 2, carry)
    from ..core.lwe import lwe_noiseless_trivial
    off = lwe_noiseless_trivial(
        jnp.broadcast_to(jnp.int32(-gates.MU_BOOL), s.b.shape), s.n)
    return lwe_add(s, off), carry


def _lwe_broadcast(ct: LweCiphertext, k: int) -> LweCiphertext:
    """Prepend a broadcast axis of size k (share one operand across bits)."""
    bt = jax.numpy.broadcast_to
    return LweCiphertext(
        a=bt(ct.a[None], (k,) + ct.a.shape),
        b=bt(ct.b[None], (k,) + ct.b.shape),
        current_variance=bt(ct.current_variance[None],
                            (k,) + ct.current_variance.shape))


def ripple_mul(a_bits: LweCiphertext, b_bits: LweCiphertext,
               ek: EvalKey, params: GateBootstrappingParams,
               rotation_impl: str = "auto"
               ) -> tuple[LweCiphertext, None]:
    """n-bit product mod 2^n, LSB first — bootstrapped 8×8 multiplier.

    Array multiplication with the fast-adder machinery: partial-product
    row i is ONE batched AND (a_i shared across b's low n−i bits), then a
    fast ripple (full_adder_fast: one MAJ bootstrap per position) adds it
    into the accumulator at offset i, with one BATCHED refresh per row so
    every accumulator bit stays a fresh bootstrap output (the MAJ chain
    only ever sees fresh inputs — same margins as ripple_carry_add).

    Cost at n=8: 36 AND + 28 MAJ + 28 refresh bootstraps ≈ 92·B blind
    rotates in 43 dispatches.  The reference has no multiplier (its wrapper
    stops at leveled add/sub); new capability, mod-2^n semantics matching
    add/sub.  Returns (prod_bits, None) — no carry/overflow analog.
    """
    nbits = a_bits.b.shape[0]
    # row 0: acc_j = AND(a_0, b_j), one batched gate over all n positions
    pp0 = gates.and_(_lwe_broadcast(lwe_index(a_bits, 0), nbits), b_bits,
                     ek, params, rotation_impl)
    acc = [lwe_index(pp0, j) for j in range(nbits)]
    for i in range(1, nbits):
        w = nbits - i
        pp = gates.and_(_lwe_broadcast(lwe_index(a_bits, i), w),
                        lwe_index(b_bits, slice(0, w)), ek, params,
                        rotation_impl)
        carry = gates.constant(
            jax.numpy.zeros(a_bits.b.shape[1:], bool), params)
        sums = []
        for j in range(w):
            s, carry = full_adder_fast(acc[i + j], lwe_index(pp, j), carry,
                                       ek, params, rotation_impl)
            sums.append(s)
        refreshed = _refresh_stacked(sums, ek, params, rotation_impl)
        for j in range(w):
            acc[i + j] = lwe_index(refreshed, j)
    return lwe_stack(acc), None


def _refresh_stacked(sums: list[LweCiphertext], ek: EvalKey,
                     params: GateBootstrappingParams,
                     rotation_impl: str) -> LweCiphertext:
    """One BATCHED refresh bootstrap over all bit positions at once.

    The per-bit sums have no sequential dependency, so the noise reset is
    a single (nbits, ...) bootstrap call — one blind-rotate scan for the
    whole word, not one per bit."""
    return gates.refresh(lwe_stack(sums), ek, params, rotation_impl)


def ripple_carry_add(a_bits: LweCiphertext, b_bits: LweCiphertext,
                     ek: EvalKey, params: GateBootstrappingParams,
                     rotation_impl: str = "auto", mode: str = "fast",
                     ) -> tuple[LweCiphertext, LweCiphertext]:
    """n-bit ripple-carry addition, LSB first on the leading axis.

    Args:
      a_bits, b_bits: LWE batches with shape (nbits, ...) — any trailing batch.
      mode: "fast" (default) — one MAJ bootstrap per bit via the carry-save
        identity (full_adder_fast) plus ONE batched refresh bootstrap over
        all sum bits: ~n+1 blind rotates total, output noise identical to
        the classic path (every output is a fresh bootstrap), and internal
        decision margins no worse (MAJ sqrt(3)·sigma, refresh sqrt(7)·sigma,
        vs classic XOR's sqrt(8)·sigma).  "raw" — fast without the final
        refresh: n rotates; sum bits keep the documented ~7× linear
        variance (fine to decrypt, consumes margin if composed).
        "classic" — the original XOR/XOR/MUX full adder (~4n rotates).
    Returns:
      (sum_bits with shape (nbits, ...), final carry).
    """
    if mode not in ("fast", "raw", "classic"):
        raise ValueError(f"unknown ripple mode {mode!r}; "
                         "'fast', 'raw' or 'classic'")
    nbits = a_bits.b.shape[0]
    carry = gates.constant(
        jax.numpy.zeros(a_bits.b.shape[1:], bool), params)
    sums = []
    for i in range(nbits):
        ai, bi = lwe_index(a_bits, i), lwe_index(b_bits, i)
        if mode == "classic":
            s, carry = full_adder(ai, bi, carry, ek, params, rotation_impl)
        else:
            s, carry = full_adder_fast(ai, bi, carry, ek, params,
                                       rotation_impl)
        sums.append(s)
    if mode == "fast":
        return _refresh_stacked(sums, ek, params, rotation_impl), carry
    return lwe_stack(sums), carry


def ripple_borrow_sub(a_bits: LweCiphertext, b_bits: LweCiphertext,
                      ek: EvalKey, params: GateBootstrappingParams,
                      rotation_impl: str = "auto", mode: str = "fast",
                      ) -> tuple[LweCiphertext, LweCiphertext]:
    """n-bit ripple-borrow subtraction a - b, LSB first.

    mode="fast" (default): with u = NOT a (a free negation),
    borrow_out = MAJ(u, b, borrow_in) — one sign bootstrap per bit — and
    the difference is linear: diff = ¬(u ⊕ b ⊕ c), so
    ``enc(diff) = 2·enc(borrow_out) − (enc(u)+enc(b)+enc(c))`` exactly
    (all 8 input cases land on ±1/8; same algebra as full_adder_fast with
    the output parity flipped).  One batched refresh bootstrap resets the
    diff bits to fresh noise: ~n+1 rotates vs classic's ~4n.
    mode="raw" skips the refresh (decrypt-bound outputs);
    mode="classic" is the original XOR/XOR/MUX chain:
    borrow_out = MUX(a XOR b, b, borrow_in).

    Returns (diff_bits, final borrow) — borrow=1 means a < b (wraparound
    two's-complement result, matching an n-bit CPU SUB).
    """
    if mode not in ("fast", "raw", "classic"):
        raise ValueError(f"unknown ripple mode {mode!r}; "
                         "'fast', 'raw' or 'classic'")
    nbits = a_bits.b.shape[0]
    borrow = gates.constant(
        jax.numpy.zeros(a_bits.b.shape[1:], bool), params)
    diffs = []
    for i in range(nbits):
        ai, bi = lwe_index(a_bits, i), lwe_index(b_bits, i)
        if mode == "classic":
            t = gates.xor_(ai, bi, ek, params, rotation_impl)
            d = gates.xor_(t, borrow, ek, params, rotation_impl)
            borrow = gates.mux(t, bi, borrow, ek, params, rotation_impl)
        else:
            u = gates.not_(ai)
            bout = gates.maj(u, bi, borrow, ek, params, rotation_impl)
            L = lwe_add(lwe_add(u, bi), borrow)
            d = lwe_add_mul(lwe_negate(L), 2, bout)
            borrow = bout
        diffs.append(d)
    if mode == "fast":
        return _refresh_stacked(diffs, ek, params, rotation_impl), borrow
    return lwe_stack(diffs), borrow


def compare_lt(a_bits: LweCiphertext, b_bits: LweCiphertext,
               ek: EvalKey, params: GateBootstrappingParams,
               rotation_impl: str = "auto") -> LweCiphertext:
    """Unsigned a < b: the final borrow of the ripple subtraction — computed
    without materializing the difference.

    One MAJ bootstrap per bit (borrow_out = MAJ(NOT a_i, b_i, borrow_in),
    as in ripple_borrow_sub's fast mode): n blind rotates vs the previous
    XOR+MUX chain's ~3n, with identical output contract (the result is a
    fresh bootstrap output)."""
    nbits = a_bits.b.shape[0]
    lt = gates.constant(jax.numpy.zeros(a_bits.b.shape[1:], bool), params)
    for i in range(nbits):
        ai, bi = lwe_index(a_bits, i), lwe_index(b_bits, i)
        lt = gates.maj(gates.not_(ai), bi, lt, ek, params, rotation_impl)
    return lt


def equals(a_bits: LweCiphertext, b_bits: LweCiphertext,
           ek: EvalKey, params: GateBootstrappingParams,
           rotation_impl: str = "auto") -> LweCiphertext:
    """Bitwise equality: AND-reduction of per-bit XNORs (balanced tree).

    Batched: ONE XNOR call over the whole bit axis, then log2(n) batched
    AND levels (halves ANDed against halves; an odd leftover rides along
    untouched) — 4 gate dispatches at n=8 instead of 15 per-bit calls
    (each dispatch costs ~25 ms through the axon relay, ROOFLINE.md)."""
    eqs = gates.xnor(a_bits, b_bits, ek, params, rotation_impl)
    m = a_bits.b.shape[0]
    while m > 1:
        half = m // 2
        merged = gates.and_(lwe_index(eqs, slice(0, half)),
                            lwe_index(eqs, slice(half, 2 * half)),
                            ek, params, rotation_impl)
        if m % 2:
            tail = lwe_index(eqs, slice(2 * half, m))
            merged = LweCiphertext(
                a=jnp.concatenate([merged.a, tail.a]),
                b=jnp.concatenate([merged.b, tail.b]),
                current_variance=jnp.concatenate(
                    [merged.current_variance, tail.current_variance]))
        eqs = merged
        m = half + m % 2
    return lwe_index(eqs, 0)


def select_word(c: LweCiphertext, a_bits: LweCiphertext,
                b_bits: LweCiphertext, ek: EvalKey,
                params: GateBootstrappingParams,
                rotation_impl: str = "auto") -> LweCiphertext:
    """Per-bit MUX: c ? a : b over whole words — ONE batched MUX call with
    the selector broadcast across the bit axis (not n per-bit dispatches)."""
    nbits = a_bits.b.shape[0]
    return gates.mux(_lwe_broadcast(c, nbits), a_bits, b_bits, ek,
                     params, rotation_impl)
