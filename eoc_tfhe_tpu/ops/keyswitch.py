"""LWE key switching as one-hot int8 matmuls.

TPU-native replacement for upstream ``lwe-keyswitch-functions.cpp``
(``lweKeySwitch`` -> ``lweKeySwitchTranslate_fromArray``; hot loop #2 of
bootstrapping, SURVEY.md §3.5). The reference's per-coefficient table gather
(N*t scalar lookups into an 82 MB table) maps poorly to TPU; instead we form
the digit one-hot tensor and contract it against the limb-decomposed key
table on the MXU — exact int8 x int8 -> int32 arithmetic, recombined mod 2^32
(gather-free; SURVEY.md §7 hard part #4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.lwe import LweCiphertext
from ..core.keys import KeySwitchKey
from . import polymul


def prepare_keyswitch_matmul(ks: KeySwitchKey) -> jax.Array:
    """Limb-decompose the packed ks table for the MXU contraction.

    Returns (n_in * t * base, (n_out+1) * LIMBS) **bfloat16** holding the
    signed int8 limbs, with the u=0 plane zeroed (upstream skips aij == 0
    instead of subtracting an encryption of zero; zeroing the column
    reproduces that exactly).

    Why bf16: the contraction is onehot{0,1} x limb[-128..127] summed over
    n_in*t nonzeros — every operand is exactly representable in bf16 and
    every f32 partial sum is bounded by n_in*t*127 < 2^24, so a bf16 x bf16
    -> f32 MXU matmul is EXACT while running at full MXU rate (the int8 x
    int8 dot was not lowered to the MXU int8 path by XLA and measured ~40 ms
    at B=2048 on v5e; the bf16 form is ~1 ms).
    """
    n_in, t, base, m = ks.ks.shape

    # One jitted program (not eager op-by-op): each eager dispatch pays an
    # axon-relay round trip plus a cold-cache compile, and this runs inside
    # the keygen budget (r5: eager form measured ~7-20 s cold, jitted ~2 s).
    @jax.jit
    def build(table):
        table = table.at[:, :, 0, :].set(0)
        limbs = polymul.decompose_signed_limbs(table)  # (n_in, t, base, m, L)
        return limbs.astype(jnp.bfloat16).reshape(n_in * t * base,
                                                  m * polymul.LIMBS)

    return build(ks.ks)


def keyswitch_digits(a: jax.Array, t: int, basebit: int) -> jax.Array:
    """Digit extraction with rounding offset (upstream ``lweKeySwitchTranslate``).

    Args:
      a: (..., n_in) int32 coefficients of the input sample.
    Returns:
      (..., n_in, t) int32 digits in [0, base).
    """
    base = 1 << basebit
    prec_offset = jnp.uint32(1 << (32 - (1 + basebit * t)))
    aibar = a.astype(jnp.uint32) + prec_offset
    shifts = jnp.array([32 - (j + 1) * basebit for j in range(t)], jnp.uint32)
    return ((aibar[..., None] >> shifts) & jnp.uint32(base - 1)).astype(jnp.int32)


def keyswitch_apply(ct_extracted: LweCiphertext, ks: KeySwitchKey,
                    t: int, basebit: int,
                    prepared: jax.Array | None = None) -> LweCiphertext:
    """``lweKeySwitch``: (a over n_in, b)  ->  LWE over n_out.

    result = (0, b) - sum_{i,j} ks[i, j, digit_ij(a)].
    """
    n_in, tt, base, m = ks.ks.shape
    assert tt == t and base == (1 << basebit)
    n_out = m - 1
    if prepared is None:
        prepared = prepare_keyswitch_matmul(ks)

    digits = keyswitch_digits(ct_extracted.a, t, basebit)          # (..., n_in, t)
    u = jnp.arange(base, dtype=jnp.int32)
    onehot = (digits[..., None] == u).astype(jnp.bfloat16)         # (..., n_in, t, base)
    batch_shape = digits.shape[:-2]
    x8 = onehot.reshape((-1, n_in * t * base))
    # bf16 x bf16 -> f32 is exact here (see prepare_keyswitch_matmul) and
    # hits the MXU; the f32 sums are exact integers, so the cast is exact.
    z = jax.lax.dot_general(x8, prepared.astype(jnp.bfloat16),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)    # (B, m*L)
    z = z.astype(jnp.int32).reshape(batch_shape + (m, polymul.LIMBS))
    delta = polymul.recombine_limbs(z, axis=-1)                    # (..., m)

    a = (-delta[..., :n_out]).astype(jnp.int32)
    b = (ct_extracted.b - delta[..., n_out]).astype(jnp.int32)
    # Variance: each NONZERO digit subtracts one ks entry — upstream
    # ``lweKeySwitchTranslate_fromArray`` skips aij == 0 (one ``lweSubTo``
    # per nonzero digit, each adding the entry's variance), so the exact
    # recurrence counts them per sample rather than assuming n_in * t.
    nnz = jnp.sum((digits != 0).astype(jnp.float32), axis=(-2, -1))
    # Plus the digit-rounding term: each input coefficient is rounded to
    # t*basebit bits (err uniform +-2^(31-t*basebit), centered by the
    # prec_offset), contributing n_in * E[s^2] * 2^(-2*t*basebit)/12 to the
    # output phase variance (E[s^2] = 1/2 for binary keys).
    tb = t * basebit
    round_var = jnp.float32(n_in * 2.0 ** (-2 * tb) / 24.0)
    var = ct_extracted.current_variance + nnz * ks.variance + round_var
    return LweCiphertext(a=a, b=b, current_variance=var)
