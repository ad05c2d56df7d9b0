"""Batched TLWE (ring-LWE over the torus) layer.

TPU-native re-implementation of upstream ``tlwe-functions.cpp`` (wasm name
``new_TLweParams``; marker ``TLWEPARAMS`` — SURVEY.md §2.2). A TLWE sample is
(k+1) torus polynomials; phase(c) = b - sum_i key_i * a_i with negacyclic
polynomial products, computed exactly on the MXU (see ``ops/polymul.py``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .params import TLweParams
from .numeric import gaussian32, uniform_binary, uniform_torus32
from ..ops import polymul
from .lwe import LweCiphertext


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TLweKey:
    """k binary polynomials (reference ``TLweKey``)."""

    key: jax.Array  # (k, N) int32 in {0,1}

    @property
    def k(self) -> int:
        return self.key.shape[0]

    @property
    def N(self) -> int:
        return self.key.shape[1]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TLweCiphertext:
    """Batched TLWE sample(s): a[..., :k, :] mask polys, a[..., k, :] the body."""

    a: jax.Array  # (..., k+1, N) int32
    current_variance: jax.Array  # (...) float32

    @property
    def k(self) -> int:
        return self.a.shape[-2] - 1

    @property
    def N(self) -> int:
        return self.a.shape[-1]

    @property
    def b(self) -> jax.Array:
        return self.a[..., -1, :]


def tlwe_key_gen(key: jax.Array, params: TLweParams) -> TLweKey:
    """Uniform binary ring key (upstream ``tLweKeyGen``)."""
    return TLweKey(key=uniform_binary(key, (params.k, params.N)))


def tlwe_sym_encrypt_zero(key: jax.Array, alpha: float, tlwe_key: TLweKey,
                          batch_shape: tuple = ()) -> TLweCiphertext:
    """``tLweSymEncryptZero``: fresh encryptions of the zero polynomial.

    b = sum_i key_i * a_i + gaussian noise (per coefficient), a_i uniform.
    """
    k, N = tlwe_key.k, tlwe_key.N
    k_a, k_e = jax.random.split(key)
    a = uniform_torus32(k_a, batch_shape + (k, N))
    noise = gaussian32(jnp.zeros(batch_shape + (N,), jnp.int32), alpha, k_e,
                       batch_shape + (N,))
    b = (noise + polymul.torus_by_small_shared_matmul(a, tlwe_key.key)).astype(jnp.int32)
    full = jnp.concatenate([a, b[..., None, :]], axis=-2)
    var = jnp.full(batch_shape, np.float32(alpha) ** 2, jnp.float32)
    return TLweCiphertext(a=full, current_variance=var)


def tlwe_phase(ct: TLweCiphertext, tlwe_key: TLweKey) -> jax.Array:
    """``tLwePhase``: b - sum_i key_i * a_i (exact)."""
    mask = ct.a[..., :-1, :]
    dot = polymul.torus_by_small_shared_matmul(mask, tlwe_key.key)
    return (ct.b - dot).astype(jnp.int32)


def tlwe_noiseless_trivial(mu_poly: jax.Array, k: int) -> TLweCiphertext:
    """``tLweNoiselessTrivial``: (0, ..., 0, mu(X))."""
    mu_poly = jnp.asarray(mu_poly, jnp.int32)
    N = mu_poly.shape[-1]
    zeros = jnp.zeros(mu_poly.shape[:-1] + (k, N), jnp.int32)
    return TLweCiphertext(a=jnp.concatenate([zeros, mu_poly[..., None, :]], axis=-2),
                          current_variance=jnp.zeros(mu_poly.shape[:-1], jnp.float32))


def tlwe_add(x: TLweCiphertext, y: TLweCiphertext) -> TLweCiphertext:
    return TLweCiphertext(a=(x.a + y.a).astype(jnp.int32),
                          current_variance=x.current_variance + y.current_variance)


def tlwe_sub(x: TLweCiphertext, y: TLweCiphertext) -> TLweCiphertext:
    return TLweCiphertext(a=(x.a - y.a).astype(jnp.int32),
                          current_variance=x.current_variance + y.current_variance)


def tlwe_extract_lwe_sample(ct: TLweCiphertext, index: int = 0) -> LweCiphertext:
    """``tLweExtractLweSampleIndex``: coefficient ``index`` as an LWE sample over n = k*N.

    ext_a[i*N + j] = a_i[index - j]  for j <= index,
                   = -a_i[N + index - j]  for j > index  (negacyclic wrap).
    """
    k, N = ct.k, ct.N
    mask = ct.a[..., :-1, :]                       # (..., k, N)
    j = np.arange(N)
    src = (index - j) % N
    sign = np.where(j <= index, 1, -1).astype(np.int32)
    ext = (mask[..., src] * sign).astype(jnp.int32)  # (..., k, N)
    a = ext.reshape(ext.shape[:-2] + (k * N,))
    b = ct.b[..., index]
    return LweCiphertext(a=a, b=b, current_variance=ct.current_variance)
