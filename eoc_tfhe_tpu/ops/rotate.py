"""Negacyclic monomial rotations X^a * p(X) mod (X^N + 1).

TPU-native equivalent of upstream ``torusPolynomialMulByXai`` /
``torusPolynomialMulByXaiMinusOne`` (``polynomials.cpp``; core of blind
rotation, SURVEY.md §3.5). Two interchangeable implementations:

  * ``mul_by_xai_gather`` — take_along_axis on the doubled vector [p, -p].
    Simple; fine on CPU, gather-bound on TPU.
  * ``mul_by_xai_onehot`` — two small one-hot matmuls (chunk-level permutation
    followed by intra-chunk shift), keeping the hot path on the MXU with
    exact integer arithmetic. Cost O(B * N * C) MACs for chunk size C —
    negligible next to the external product.

Amounts ``a`` are per-sample (data-dependent) integers in [0, 2N).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def mul_by_xai_gather(p: jax.Array, a: jax.Array) -> jax.Array:
    """X^a * p with per-sample amounts.

    Args:
      p: (..., N) int32 polynomials.
      a: (...) or broadcastable int32 amounts in [0, 2N).
    """
    N = p.shape[-1]
    ext = jnp.concatenate([p, (-p).astype(p.dtype)], axis=-1)   # (..., 2N)
    c = jnp.arange(N, dtype=jnp.int32)
    idx = (c - jnp.asarray(a, jnp.int32)[..., None]) % (2 * N)  # (..., N)
    idx = jnp.broadcast_to(idx, p.shape[:-1] + (N,))
    return jnp.take_along_axis(ext, idx, axis=-1)


def mul_by_xai_minus_one_gather(p: jax.Array, a: jax.Array) -> jax.Array:
    """(X^a - 1) * p — the CMux difference input (upstream ``MulByXaiMinusOne``)."""
    return (mul_by_xai_gather(p, a) - p).astype(p.dtype)


def _chunk_perm_onehot(q: jax.Array, n_chunks: int) -> jax.Array:
    """Signed one-hot (..., out_chunk, in_chunk) for negacyclic chunk rotation by q.

    out_chunk[pc] = sign * in_chunk[(pc - q) mod n_chunks], sign = -1 when the
    (pc - q) wraps an odd number of times around n_chunks (negacyclic fold of
    the doubled 2*n_chunks space).
    """
    pc = jnp.arange(n_chunks, dtype=jnp.int32)[:, None]
    ic = jnp.arange(n_chunks, dtype=jnp.int32)[None, :]
    qq = jnp.asarray(q, jnp.int32)[..., None, None]
    d = (pc - qq) % (2 * n_chunks)
    hit = (d % n_chunks) == ic
    sign = jnp.where(d < n_chunks, 1, -1)
    return (hit * sign).astype(jnp.int8)


def _lane_shift_onehot(s: jax.Array, C: int) -> jax.Array:
    """One-hot (..., 2, C, C) selecting out[c] = cur[c - s] (c>=s) else nxt[C + c - s]."""
    c = jnp.arange(C, dtype=jnp.int32)[:, None]
    j = jnp.arange(C, dtype=jnp.int32)[None, :]
    ss = jnp.asarray(s, jnp.int32)[..., None, None]
    cur = (j == (c - ss)).astype(jnp.int8)           # contribution from chunk p
    nxt = (j == (C + c - ss)).astype(jnp.int8)       # contribution from chunk p-1 (rot by q+1)
    return jnp.stack([cur, nxt], axis=-3)            # (..., 2, C, C)


def mul_by_xai_onehot(p: jax.Array, a: jax.Array, chunk: int = 128) -> jax.Array:
    """MXU-friendly X^a * p: chunk permutation + intra-chunk shift, both matmuls.

    Decompose a = q*C + s (C = chunk size). Rotation by q*C permutes (with
    negacyclic sign) the N/C chunks; the residual shift by s pulls lanes from
    the chunk itself (rotated by q) and its predecessor (rotated by q+1).
    All arithmetic int8 x int32 -> int32 via two small einsums.

    Args:
      p: (..., N) int32.
      a: (...) int32 in [0, 2N).
    """
    N = p.shape[-1]
    C = min(chunk, N)
    n_chunks = N // C
    a = jnp.asarray(a, jnp.int32)
    q, s = a // C, a % C

    pc = p.reshape(p.shape[:-1] + (n_chunks, C))
    rot_q = jnp.einsum("...oi,...ic->...oc", _chunk_perm_onehot(q, n_chunks), pc,
                       preferred_element_type=jnp.int32)
    rot_q1 = jnp.einsum("...oi,...ic->...oc", _chunk_perm_onehot(q + 1, n_chunks), pc,
                        preferred_element_type=jnp.int32)
    sel = _lane_shift_onehot(s, C)                   # (..., 2, C, C)
    stacked = jnp.stack([rot_q, rot_q1], axis=-3)    # (..., 2, n_chunks, C)
    out = jnp.einsum("...tcj,...tpj->...pc", sel, stacked,
                     preferred_element_type=jnp.int32)
    return out.reshape(p.shape).astype(jnp.int32)


def mul_by_xai_barrel(p: jax.Array, a: jax.Array) -> jax.Array:
    """Barrel-shifter rotation: log2(2N) conditional uniform rolls.

    out[..., c] = ext[..., (c - a) mod 2N] with ext = [p, -p]. Each stage k
    applies a *uniform* roll by 2^k (cheap vectorized data movement) selected
    per sample by bit k of a — no gathers, no one-hot matmuls, O(N log N)
    elementwise work total.
    """
    N = p.shape[-1]
    ext = jnp.concatenate([p, (-p).astype(p.dtype)], axis=-1)   # (..., 2N)
    a = jnp.broadcast_to(jnp.asarray(a, jnp.int32), p.shape[:-1])
    nbits = (2 * N - 1).bit_length()
    for k in range(nbits):
        rolled = jnp.roll(ext, 1 << k, axis=-1)
        take = ((a >> k) & 1).astype(bool)[..., None]
        ext = jnp.where(take, rolled, ext)
    return ext[..., :N]


def mul_by_xai(p: jax.Array, a: jax.Array, impl: str = "auto") -> jax.Array:
    """Dispatch: "auto" picks the barrel shifter on TPU (gathers are slow
    there; one-hot matmuls measured 3.8x faster than gather, barrel faster
    still) and gather elsewhere."""
    if impl == "auto":
        impl = "barrel" if jax.default_backend() == "tpu" else "gather"
    if impl == "gather":
        return mul_by_xai_gather(p, a)
    if impl == "onehot":
        return mul_by_xai_onehot(p, a)
    if impl == "barrel":
        return mul_by_xai_barrel(p, a)
    raise ValueError(f"unknown rotation impl {impl!r}")
