"""Homomorphic integer circuits over bootstrapped gates.

BASELINE.json configs[2]: the full boolean gate set chained into an 8-bit
ripple-carry adder. The reference has no circuit layer (its wrapper only does
leveled add/sub); this is new capability required by the north star.

Gate-level batching: there is no parallelism across the ripple (the carry is
sequential), but every bit-level gate call is batched over the adder batch —
the scaling axis that replaces "sequence length" (SURVEY.md §5).
"""

from __future__ import annotations

import jax

from ..core import gates
from ..core.lwe import LweCiphertext, lwe_index, lwe_stack
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


def ripple_carry_add(a_bits: LweCiphertext, b_bits: LweCiphertext,
                     ek: EvalKey, params: GateBootstrappingParams,
                     rotation_impl: str = "auto"
                     ) -> tuple[LweCiphertext, LweCiphertext]:
    """n-bit ripple-carry addition, LSB first on the leading axis.

    Args:
      a_bits, b_bits: LWE batches with shape (nbits, ...) — any trailing batch.
    Returns:
      (sum_bits with shape (nbits, ...), final carry).
    """
    nbits = a_bits.b.shape[0]
    carry = gates.constant(
        jax.numpy.zeros(a_bits.b.shape[1:], bool), params)
    sums = []
    for i in range(nbits):
        ai, bi = lwe_index(a_bits, i), lwe_index(b_bits, i)
        s, carry = full_adder(ai, bi, carry, ek, params, rotation_impl)
        sums.append(s)
    return lwe_stack(sums), carry


def ripple_borrow_sub(a_bits: LweCiphertext, b_bits: LweCiphertext,
                      ek: EvalKey, params: GateBootstrappingParams,
                      rotation_impl: str = "auto"
                      ) -> tuple[LweCiphertext, LweCiphertext]:
    """n-bit ripple-borrow subtraction a - b, LSB first.

    Per bit: diff = a XOR b XOR borrow_in;
    borrow_out = MUX(a XOR b, b, borrow_in): when a != b the borrow equals
    b (the only differing case that borrows is a=0, b=1); when a == b the
    incoming borrow propagates.
    Returns (diff_bits, final borrow) — borrow=1 means a < b (wraparound
    two's-complement result, matching an n-bit CPU SUB).
    """
    nbits = a_bits.b.shape[0]
    borrow = gates.constant(
        jax.numpy.zeros(a_bits.b.shape[1:], bool), params)
    diffs = []
    for i in range(nbits):
        ai, bi = lwe_index(a_bits, i), lwe_index(b_bits, i)
        t = gates.xor_(ai, bi, ek, params, rotation_impl)
        d = gates.xor_(t, borrow, ek, params, rotation_impl)
        borrow = gates.mux(t, bi, borrow, ek, params, rotation_impl)
        diffs.append(d)
    return lwe_stack(diffs), borrow


def compare_lt(a_bits: LweCiphertext, b_bits: LweCiphertext,
               ek: EvalKey, params: GateBootstrappingParams,
               rotation_impl: str = "auto") -> LweCiphertext:
    """Unsigned a < b: the final borrow of the ripple subtraction — computed
    without materializing the difference (n MUX chains only)."""
    nbits = a_bits.b.shape[0]
    lt = gates.constant(jax.numpy.zeros(a_bits.b.shape[1:], bool), params)
    for i in range(nbits):
        ai, bi = lwe_index(a_bits, i), lwe_index(b_bits, i)
        t = gates.xor_(ai, bi, ek, params, rotation_impl)
        lt = gates.mux(t, bi, lt, ek, params, rotation_impl)
    return lt


def equals(a_bits: LweCiphertext, b_bits: LweCiphertext,
           ek: EvalKey, params: GateBootstrappingParams,
           rotation_impl: str = "auto") -> LweCiphertext:
    """Bitwise equality: AND-reduction of per-bit XNORs (balanced tree)."""
    nbits = a_bits.b.shape[0]
    eqs = [gates.xnor(lwe_index(a_bits, i), lwe_index(b_bits, i), ek, params,
                      rotation_impl) for i in range(nbits)]
    while len(eqs) > 1:
        nxt = [gates.and_(eqs[j], eqs[j + 1], ek, params, rotation_impl)
               for j in range(0, len(eqs) - 1, 2)]
        if len(eqs) % 2:
            nxt.append(eqs[-1])
        eqs = nxt
    return eqs[0]


def select_word(c: LweCiphertext, a_bits: LweCiphertext,
                b_bits: LweCiphertext, ek: EvalKey,
                params: GateBootstrappingParams,
                rotation_impl: str = "auto") -> LweCiphertext:
    """Per-bit MUX: c ? a : b over whole words (c broadcast across bits)."""
    nbits = a_bits.b.shape[0]
    outs = [gates.mux(c, lwe_index(a_bits, i), lwe_index(b_bits, i), ek,
                      params, rotation_impl) for i in range(nbits)]
    return lwe_stack(outs)
