"""Batched TGSW layer: gadget decomposition and the external product.

TPU-native re-implementation of upstream ``tgsw-functions.cpp`` /
``tgsw-fft-operations.cpp`` (wasm name ``new_TGswParams``; marker
``TGSWPARAMS``). The external product here is the "speed-of-light kernel" the
north star names (SURVEY.md §2.2): instead of the reference's
decompose -> 6 IFFTs -> pointwise MAC -> 2 FFTs pipeline in f64, we compute
decompose -> exact int8-limb MXU matmul (see ``ops/polymul.py``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .params import TGswParams
from .tlwe import TLweCiphertext, TLweKey, tlwe_sym_encrypt_zero
from ..ops import polymul


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TGswCiphertext:
    """Batched TGSW sample(s): (k+1)*l TLWE rows (reference ``TGswSample``)."""

    rows: jax.Array  # (..., kpl, k+1, N) int32
    current_variance: jax.Array  # (...) float32

    @property
    def kpl(self) -> int:
        return self.rows.shape[-3]

    @property
    def k(self) -> int:
        return self.rows.shape[-2] - 1

    @property
    def N(self) -> int:
        return self.rows.shape[-1]


def tgsw_sym_encrypt_int(key: jax.Array, messages: jax.Array, alpha: float,
                         tgsw_key: TLweKey, params: TGswParams) -> TGswCiphertext:
    """``tGswSymEncryptInt``: encrypt small integers (e.g. key bits) as TGSW.

    Each of the kpl rows is a fresh zero-TLWE; row (bloc*l + p) then gets
    mu * h[p] added to the constant coefficient of polynomial ``bloc``
    (upstream ``tGswAddMuIntH``).
    """
    messages = jnp.asarray(messages, jnp.int32)
    batch_shape = messages.shape
    kpl, k, l = params.kpl, params.tlwe_params.k, params.l
    N = params.tlwe_params.N

    z = tlwe_sym_encrypt_zero(key, alpha, tgsw_key, batch_shape + (kpl,))
    rows = z.a  # (..., kpl, k+1, N)

    # mu * h[p] on constant coeff of bloc for row bloc*l+p.
    h = jnp.asarray(params.h, jnp.int32)               # (l,)
    add = jnp.zeros((kpl, k + 1, N), jnp.int32)
    for bloc in range(k + 1):
        for p in range(l):
            add = add.at[bloc * l + p, bloc, 0].set(h[p])
    rows = (rows + messages[..., None, None, None] * add).astype(jnp.int32)
    var = jnp.full(batch_shape, np.float32(alpha) ** 2, jnp.float32)
    return TGswCiphertext(rows=rows, current_variance=var)


def decompose_h(sample_polys: jax.Array, params: TGswParams) -> jax.Array:
    """``tGswTorus32PolynomialDecompH``: signed gadget decomposition.

    Args:
      sample_polys: (..., k+1, N) int32 torus polynomials.
    Returns:
      (..., (k+1)*l, N) int32 digits in [-Bg/2, Bg/2), ordered
      [bloc0 digit0..l-1, bloc1 digit0..l-1] to match TGSW row order.
    """
    Bgbit, l = params.Bgbit, params.l
    halfBg = params.halfBg
    maskMod = params.maskMod
    offset = jnp.uint32(params.offset)

    u = sample_polys.astype(jnp.uint32) + offset       # (..., k+1, N)
    shifts = jnp.array([32 - (p + 1) * Bgbit for p in range(l)], jnp.uint32)
    digits = ((u[..., None, :] >> shifts[:, None]) & jnp.uint32(maskMod)).astype(jnp.int32)
    digits = digits - jnp.int32(halfBg)                # (..., k+1, l, N)
    kp1 = sample_polys.shape[-2]
    return digits.reshape(sample_polys.shape[:-2] + (kp1 * l, sample_polys.shape[-1]))


def tgsw_extern_mul(acc: TLweCiphertext, tgsw_rows: jax.Array, params: TGswParams,
                    row_variance: float | jax.Array = 0.0) -> TLweCiphertext:
    """External product  tgsw ⊡ acc  (upstream ``tGswExternMulToTLwe`` semantics,
    functional: returns the product instead of accumulating in place).

    Args:
      acc: batched TLWE (..., k+1, N).
      tgsw_rows: shared TGSW sample rows (kpl, k+1, N) int32 — key material
        shared across the batch (the bootstrapping-key case).
    """
    digits = decompose_h(acc.a, params)                # (..., kpl, N)
    out = polymul.small_by_torus_matmul(digits, tgsw_rows, x_bound=params.halfBg)
    # Variance: kpl * N * Bg^2/4 * row_var + decomposition rounding; tracked loosely
    # (upstream tracks the same first-order term).
    kpl, N = params.kpl, params.tlwe_params.N
    var = acc.current_variance + kpl * N * (params.halfBg ** 2) * jnp.asarray(row_variance, jnp.float32)
    return TLweCiphertext(a=out, current_variance=var)
