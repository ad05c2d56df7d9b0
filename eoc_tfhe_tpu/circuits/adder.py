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
from ..core.lwe import LweCiphertext, lwe_index
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
    from ..core.lwe import lwe_stack
    return lwe_stack(sums), carry
