"""Batched LWE layer: keygen, encrypt, phase, decrypt, linear ops.

TPU-native re-implementation of the reference core's ``lwe-functions.cpp``
(wrapper call sites ``/root/reference/ao-tfhe/eoc-tfhe-run.cpp:149,161-162,
261,291,411,447-448,490-491``; wasm names ``lweSymEncrypt/lweSymDecrypt/
lwePhase/lweCopy/lweNoiselessTrivial``).

Design departures from the reference (SURVEY.md §7 design stance):
  * A ciphertext is a flat batched tensor pair ``a: (..., n) int32``,
    ``b: (...) int32`` — not a one-at-a-time heap struct. Every op below is
    shape-polymorphic over leading batch dimensions and jit/vmap/shard_map
    friendly.
  * ``current_variance`` is tracked exactly like upstream (a float per
    sample), carried as a float32 leaf.
  * Randomness is explicit (``jax.random`` keys) instead of process-global
    generators.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .params import LweParams
from .numeric import gaussian32, uniform_binary, uniform_torus32, approx_phase_np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LweKey:
    """Binary LWE secret key s in {0,1}^n (reference ``LweKey``)."""

    s: jax.Array  # (n,) int32 in {0,1}

    @property
    def n(self) -> int:
        return self.s.shape[-1]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LweCiphertext:
    """Batched LWE sample(s): phase(c) = b - <a, s>  (reference ``LweSample``)."""

    a: jax.Array  # (..., n) int32
    b: jax.Array  # (...)    int32
    current_variance: jax.Array  # (...) float32

    @property
    def n(self) -> int:
        return self.a.shape[-1]

    @property
    def batch_shape(self):
        return self.b.shape


def lwe_key_gen(key: jax.Array, params: LweParams) -> LweKey:
    """Uniform binary secret key (upstream ``lweKeyGen``)."""
    return LweKey(s=uniform_binary(key, (params.n,)))


def lwe_sym_encrypt(key: jax.Array, message: jax.Array, alpha: float, lwe_key: LweKey
                    ) -> LweCiphertext:
    """``lweSymEncrypt``: b = gaussian32(mu, alpha) + <a, s>, a uniform.

    ``message`` may have any batch shape; one fresh mask and noise sample per
    element.
    """
    message = jnp.asarray(message, jnp.int32)
    shape = message.shape
    n = lwe_key.n
    k_a, k_e = jax.random.split(key)
    a = uniform_torus32(k_a, shape + (n,))
    noisy_mu = gaussian32(message, alpha, k_e, shape)
    b = noisy_mu + jnp.einsum("...n,n->...", a, lwe_key.s,
                              preferred_element_type=jnp.int32).astype(jnp.int32)
    var = jnp.full(shape, np.float32(alpha) ** 2, jnp.float32)
    return LweCiphertext(a=a, b=b.astype(jnp.int32), current_variance=var)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SeededLweCiphertext:
    """LWE sample with the public mask ``a`` stored as its PRNG seed.

    The mask of an LWE encryption is public uniform randomness; shipping a
    16-byte seed instead of the n*4-byte vector is the standard TFHE
    "seeded/compressed ciphertext" trick (the reference has no
    wire-compression tier — its per-sample base64 blobs carry the full
    ``a``, ``eoc-tfhe-run.cpp:294`` — but its unseeded-lrand48 keygen
    relies on exactly the same replayable-PRNG property, SURVEY.md §5).
    ``expand`` reconstructs bit-identical ciphertexts on any backend
    (threefry is backend-independent, and the expansion impl is pinned —
    ``_MASK_IMPL``).  Motivation here: the serving tier's client->server
    upload shrinks from 2,524 B to ~24 B per request (serving.py; the relay
    link is the measured bottleneck, ROOFLINE.md).
    """

    seed: jax.Array  # (..., 4) uint32 — 128-bit mask seed (see _expand_mask)
    b: jax.Array     # (...)    int32
    current_variance: jax.Array  # (...) float32

    @property
    def batch_shape(self):
        return self.b.shape


#: The mask-expansion PRNG is PINNED, not ambient: client and server must
#: derive identical masks regardless of either process's
#: ``jax_default_prng_impl`` (r5 review: under impl="rbg" the key-data
#: layout differs and the wire format would break).
_MASK_IMPL = "threefry2x32"


def _expand_mask(seed_data: jax.Array, n: int) -> jax.Array:
    """(..., 4) uint32 128-bit seeds -> (..., n) int32 masks.

    Construction: the 4 words form TWO independent threefry2x32 keys; the
    mask is the XOR of their output streams.  XOR of independent uniform
    streams stays uniform, and a mask collision now needs BOTH 64-bit keys
    to collide — a 2^128 keyspace / 2^64 birthday bound instead of the
    single-key 2^64 / 2^32 (r5 review: at the serving tier's ~5k/s a 2^32
    corpus is reachable; identical masks leak plaintext differences via
    b1 - b2)."""
    flat = seed_data.reshape((-1, 4))

    def one(kd):
        k1 = jax.random.wrap_key_data(kd[:2], impl=_MASK_IMPL)
        k2 = jax.random.wrap_key_data(kd[2:], impl=_MASK_IMPL)
        return (jax.random.bits(k1, (n,), jnp.uint32)
                ^ jax.random.bits(k2, (n,), jnp.uint32)).astype(jnp.int32)

    a = jax.vmap(one)(flat)
    return a.reshape(seed_data.shape[:-1] + (n,))


def lwe_sym_encrypt_seeded(key: jax.Array, message: jax.Array, alpha: float,
                           lwe_key: LweKey) -> SeededLweCiphertext:
    """``lweSymEncrypt`` emitting a seeded ciphertext.

    Each batch element gets its own 128-bit mask seed (uniform words drawn
    from the caller's key — any PRNG impl; expansion itself is pinned, see
    ``_MASK_IMPL``) so rows are independently shippable;
    ``lwe_seeded_expand`` of the result decrypts identically to
    :func:`lwe_sym_encrypt` output at the same noise level.
    """
    message = jnp.asarray(message, jnp.int32)
    shape = message.shape
    B = int(np.prod(shape)) if shape else 1
    k_a, k_e = jax.random.split(key)
    seeds = jax.random.bits(k_a, (B, 4), jnp.uint32)            # (B, 4)
    a = _expand_mask(seeds, lwe_key.n).reshape(shape + (lwe_key.n,))
    noisy_mu = gaussian32(message, alpha, k_e, shape)
    b = noisy_mu + jnp.einsum("...n,n->...", a, lwe_key.s,
                              preferred_element_type=jnp.int32).astype(jnp.int32)
    var = jnp.full(shape, np.float32(alpha) ** 2, jnp.float32)
    return SeededLweCiphertext(seed=seeds.reshape(shape + (4,)),
                               b=b.astype(jnp.int32), current_variance=var)


def lwe_seeded_expand(ct: SeededLweCiphertext, n: int) -> LweCiphertext:
    """Reconstruct the full ciphertext from a seeded one (jit-safe; runs
    on-device so a server never receives the expanded mask over the wire)."""
    return LweCiphertext(a=_expand_mask(ct.seed, n), b=ct.b,
                         current_variance=ct.current_variance)


def lwe_phase(ct: LweCiphertext, lwe_key: LweKey) -> jax.Array:
    """``lwePhase``: b - <a, s> (exact int32 wraparound)."""
    dot = jnp.einsum("...n,n->...", ct.a, lwe_key.s,
                     preferred_element_type=jnp.int32).astype(jnp.int32)
    return (ct.b - dot).astype(jnp.int32)


def lwe_sym_decrypt(ct: LweCiphertext, lwe_key: LweKey, Msize: int) -> np.ndarray:
    """``lweSymDecrypt`` = approxPhase(lwePhase(ct), Msize). Host-side result."""
    phase = np.asarray(lwe_phase(ct, lwe_key))
    return approx_phase_np(phase, Msize)


# ---------------------------------------------------------------------------
# Linear (leveled) operations — all exact int32 vector arithmetic.
# ---------------------------------------------------------------------------

def lwe_clear(template: LweCiphertext) -> LweCiphertext:
    """``lweClear``: the (0, 0) sample with the same shape."""
    return LweCiphertext(a=jnp.zeros_like(template.a), b=jnp.zeros_like(template.b),
                         current_variance=jnp.zeros_like(template.current_variance))


def lwe_noiseless_trivial(mu: jax.Array, n: int) -> LweCiphertext:
    """``lweNoiselessTrivial``: (0, mu) — decrypts to mu under every key."""
    mu = jnp.asarray(mu, jnp.int32)
    return LweCiphertext(a=jnp.zeros(mu.shape + (n,), jnp.int32), b=mu,
                         current_variance=jnp.zeros(mu.shape, jnp.float32))


def lwe_copy(ct: LweCiphertext) -> LweCiphertext:
    """``lweCopy`` (functional: identity; kept for API parity)."""
    return LweCiphertext(a=ct.a, b=ct.b, current_variance=ct.current_variance)


def lwe_negate(ct: LweCiphertext) -> LweCiphertext:
    """``lweNegate``: encrypt(-mu)."""
    return LweCiphertext(a=(-ct.a).astype(jnp.int32), b=(-ct.b).astype(jnp.int32),
                         current_variance=ct.current_variance)


def lwe_add(x: LweCiphertext, y: LweCiphertext) -> LweCiphertext:
    """``lweAddTo`` semantics, functional: x + y."""
    return LweCiphertext(a=(x.a + y.a).astype(jnp.int32), b=(x.b + y.b).astype(jnp.int32),
                         current_variance=x.current_variance + y.current_variance)


def lwe_sub(x: LweCiphertext, y: LweCiphertext) -> LweCiphertext:
    """``lweSubTo`` semantics, functional: x - y."""
    return LweCiphertext(a=(x.a - y.a).astype(jnp.int32), b=(x.b - y.b).astype(jnp.int32),
                         current_variance=x.current_variance + y.current_variance)


def lwe_add_mul(x: LweCiphertext, p: int, y: LweCiphertext) -> LweCiphertext:
    """``lweAddMulTo``: x + p*y for an integer constant p."""
    p32 = jnp.int32(p)
    return LweCiphertext(a=(x.a + p32 * y.a).astype(jnp.int32),
                         b=(x.b + p32 * y.b).astype(jnp.int32),
                         current_variance=x.current_variance + float(p) ** 2 * y.current_variance)


def lwe_sub_mul(x: LweCiphertext, p: int, y: LweCiphertext) -> LweCiphertext:
    """``lweSubMulTo``: x - p*y."""
    p32 = jnp.int32(p)
    return LweCiphertext(a=(x.a - p32 * y.a).astype(jnp.int32),
                         b=(x.b - p32 * y.b).astype(jnp.int32),
                         current_variance=x.current_variance + float(p) ** 2 * y.current_variance)


def lwe_stack(cts: list[LweCiphertext]) -> LweCiphertext:
    """Stack single samples into a batch along a new leading axis."""
    return LweCiphertext(
        a=jnp.stack([c.a for c in cts]),
        b=jnp.stack([c.b for c in cts]),
        current_variance=jnp.stack([c.current_variance for c in cts]),
    )


def lwe_index(ct: LweCiphertext, idx) -> LweCiphertext:
    """Select a sub-batch (leading-axis indexing)."""
    return LweCiphertext(a=ct.a[idx], b=ct.b[idx], current_variance=ct.current_variance[idx])
