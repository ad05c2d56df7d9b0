"""Exact negacyclic polynomial multiplication on the MXU.

This module is the TPU-native replacement for the reference core's FFT stack
(upstream ``lagrangehalfc_arithmetic.cpp`` + ``fft_processors/nayuki`` — the
Lagrange half-complex f64 FFT selected by the reference build,
``/root/reference/build.sh:54-57``, ``config.yml:17-21``).

Why not an FFT: TPUs have no native f64, and an error analysis of f32 FFTs at
the default parameter set (N=1024, Bg=2^7, l=3) shows the rounding error of a
single external product (~2^28 absolute on the torus) would swamp the noise
budget; no limb-splitting scheme rescues a 24-bit mantissa (the pointwise
products need ~46 significant bits). Instead we compute the negacyclic
convolution *exactly* over Z/2^32:

  * the left operand is small (gadget digits in [-Bg/2, Bg/2), or key bits),
    so it fits int8;
  * the right operand (torus polynomials) is split into 4 signed 8-bit limbs,
    with the top limb wrapped mod 256 (sound because all arithmetic is mod
    2^32);
  * each limb product is an int8 x int8 -> int32 matmul against the
    negacyclic Toeplitz matrix of the limb — this hits the MXU's native
    8-bit path and the int32 accumulation is exact (max |acc| =
    (k+1)*l*N * 128 * 128 < 2^31 for every supported parameter set);
  * limbs are recombined with int32 shifts (wraparound = mod 2^32).

The result equals the infinite-precision negacyclic product mod 2^32 — i.e.
it is *more* exact than the reference's f64 FFT (which commits small rounding
errors absorbed into ciphertext noise). Decryption results are bit-exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

LIMBS = 4
_I32 = jnp.int32


def decompose_signed_limbs(y: jax.Array, num_limbs: int = LIMBS) -> jax.Array:
    """Split int32 into ``num_limbs`` signed base-256 limbs, top limb wrapped.

    Returns int32 values in [-128, 127] with
    ``sum_t limbs[..., t] << (8 t) == y (mod 2**32)``.
    """
    y = jnp.asarray(y, _I32)
    limbs = []
    c = y
    for t in range(num_limbs):
        if t == num_limbs - 1:
            l = (((c + 128) & 255) - 128).astype(_I32)  # wrap mod 256: exact mod 2^32
        else:
            l = (((c + 128) & 255) - 128).astype(_I32)
            c = ((c - l) >> 8).astype(_I32)  # exact: c - l divisible by 256
        limbs.append(l)
    return jnp.stack(limbs, axis=-1)  # (..., num_limbs)


def recombine_limbs(z: jax.Array, axis: int) -> jax.Array:
    """Inverse of :func:`decompose_signed_limbs` modulo 2**32 along ``axis``."""
    z = jnp.asarray(z, _I32)
    num = z.shape[axis]
    parts = jnp.moveaxis(z, axis, 0)
    out = jnp.zeros_like(parts[0])
    for t in range(num):
        out = (out + (parts[t] << jnp.int32(8 * t))).astype(_I32)
    return out


def negacyclic_extend(p: jax.Array) -> jax.Array:
    """(..., N) -> (..., 2N) doubled vector [p, -p]: index m gives X^m coefficient role."""
    return jnp.concatenate([p, (-p).astype(p.dtype)], axis=-1)


def _toeplitz_from_ext(ext: jax.Array, N: int) -> jax.Array:
    """(..., 2N) -> (..., N, N) with M[..., r, c] = ext[..., (c - r) mod 2N].

    Gather-free: tile 2N-periodic data N times and reshape with row stride
    2N-1, which realizes the (c - r) diagonal indexing as pure data movement
    (fast on TPU, where minor-dim gathers are slow).
    """
    tiled = jnp.broadcast_to(ext[..., None, :], ext.shape[:-1] + (N, 2 * N))
    flat = tiled.reshape(ext.shape[:-1] + (N * 2 * N,))
    W = flat[..., : N * (2 * N - 1)].reshape(ext.shape[:-1] + (N, 2 * N - 1))
    return W[..., :N]


def negacyclic_toeplitz(y: jax.Array) -> jax.Array:
    """Negacyclic Toeplitz matrix of y: M[..., r, c] s.t. (x mul y)[c] = sum_r x[r] M[r, c]."""
    N = y.shape[-1]
    return _toeplitz_from_ext(negacyclic_extend(y), N)


def negacyclic_polymul_exact(x: jax.Array, y: jax.Array) -> jax.Array:
    """Reference-exact negacyclic product of two int32 polys (mod 2**32).

    Shape-polymorphic over broadcastable leading dims. Builds the full
    Toeplitz of ``y`` and contracts in int32 — simple and exact, but not the
    fast path (use :func:`small_by_torus_matmul` in hot loops).
    """
    x = jnp.asarray(x, _I32)
    M = negacyclic_toeplitz(jnp.asarray(y, _I32))
    return jnp.einsum("...r,...rc->...c", x, M, preferred_element_type=_I32).astype(_I32)


def small_by_torus_matmul(x_small: jax.Array, y_torus: jax.Array,
                          x_bound: int = 128) -> jax.Array:
    """Exact  out[..., u, :] = sum_j x_small[..., j, :] (negacyclic*) y_torus[j, u, :].

    The heart of the external product (upstream ``tGswFFTExternMulToTLwe``,
    SURVEY.md §3.5 hot loop): ``x_small`` are per-sample gadget digits
    (|x| <= Bg/2 <= ``x_bound``), ``y_torus`` the shared TGSW row polynomials.

    Args:
      x_small: (..., J, N) int32, |values| <= x_bound (<= 128).
      y_torus: (J, U, N) int32 — shared across the batch (key material).
    Returns:
      (..., U, N) int32, exact mod 2**32.
    """
    J, U, N = y_torus.shape
    assert x_small.shape[-2:] == (J, N), (x_small.shape, y_torus.shape)
    # Exactness guard: int32 accumulator must not saturate.
    assert J * N * x_bound * 128 < 2**31, "int32 accumulation would overflow"

    # Decompose AFTER the negacyclic extension: limbs of -y are themselves
    # int8-safe (a naive [limbs, -limbs] doubling turns -128 into +128, which
    # would wrap on the int8 cast and silently corrupt low limbs).
    ext = negacyclic_extend(y_torus)                   # (J, U, 2N) int32
    limbs = jnp.moveaxis(decompose_signed_limbs(ext), -1, -2)  # (J, U, L, 2N)
    M = _toeplitz_from_ext(limbs.astype(jnp.int8), N)  # (J, U, L, N_r, N_c)

    batch_shape = x_small.shape[:-2]
    x8 = x_small.astype(jnp.int8).reshape((-1, J, N))
    # Contract (J, N_r) in one dot_general — no int8 transpose (a measured
    # ~2 ms/step on v5e when done explicitly).
    z = jax.lax.dot_general(x8, M, (((1, 2), (0, 3)), ((), ())),
                            preferred_element_type=_I32)   # (B, U, L, N_c)
    z = z.reshape(batch_shape + (U, LIMBS, N))
    return recombine_limbs(z, axis=-2)                 # (..., U, N)


def torus_by_small_shared_matmul(a_torus: jax.Array, key_small: jax.Array,
                                 key_bound: int = 1) -> jax.Array:
    """Exact  out[..., :] = sum_j a_torus[..., j, :] (negacyclic*) key_small[j, :].

    The keygen-side product (upstream ``tLweSymEncryptZero``): per-sample
    torus masks convolved with the *shared small* key polynomials (binary
    coefficients). The torus side is limb-split (it is per-sample here), the
    key side feeds the Toeplitz.

    Args:
      a_torus:  (..., J, N) int32 torus polynomials.
      key_small: (J, N) int32 with |values| <= 128 (binary keys in practice).
    Returns:
      (..., N) int32, exact mod 2**32.
    """
    J, N = key_small.shape
    assert a_torus.shape[-2:] == (J, N)
    assert J * N * 128 * key_bound < 2**31, "int32 accumulation would overflow"

    M = negacyclic_toeplitz(key_small).astype(jnp.int8)  # (J, N, N)
    M8 = jnp.transpose(M, (0, 1, 2)).reshape(J * N, N)

    limbs = decompose_signed_limbs(a_torus)            # (..., J, N, L)
    batch_shape = a_torus.shape[:-2]
    x8 = jnp.moveaxis(limbs, -1, -3).astype(jnp.int8)  # (..., L, J, N)
    x8 = x8.reshape((-1, J * N))
    z = jax.lax.dot_general(x8, M8, (((1,), (0,)), ((), ())),
                            preferred_element_type=_I32)  # (B*L?, N) — L folded in batch
    z = z.reshape(batch_shape + (LIMBS, N))
    return recombine_limbs(z, axis=-2)
