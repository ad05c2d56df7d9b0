"""Torus numerics: exact Torus32 arithmetic as int32 with wraparound.

TPU-native re-implementation of the reference core's ``numeric-functions.cpp``
(call sites in the wrapper: ``modSwitchToTorus32`` at
``/root/reference/ao-tfhe/eoc-tfhe-run.cpp:145,260,290``;
``modSwitchFromTorus32`` at ``:162,412``; ``gaussian32`` present in the
shipped wasm's name section).

The torus T = R/Z is discretized as Torus32 = int32: the value ``t`` encodes
the real ``t / 2**32``. All additive torus arithmetic is therefore exact int32
wraparound arithmetic, which XLA's int32 ops already provide on every backend.

Two implementation tiers:
  * jnp functions — exact, jittable, batched; the power-of-two ``Msize`` mod
    switches used inside bootstrapping need no 64-bit arithmetic at all.
  * numpy (``*_np``) host functions — exact uint64 reference semantics for the
    general odd-``Msize`` paths used by the integer/ASCII API layer
    (``Msize = 2**31 - 1``, ``eoc-tfhe-run.cpp:35``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

TORUS_DTYPE = jnp.int32
_TWO32 = 1 << 32
_TWO63 = 1 << 63


# ---------------------------------------------------------------------------
# Host (numpy) exact reference semantics — uint64 arithmetic, any Msize.
# ---------------------------------------------------------------------------

def _interv(Msize: int) -> int:
    # Upstream: interv = ((UINT64_C(1) << 63) / Msize) * 2  (width of each slice)
    return (_TWO63 // int(Msize)) * 2


def mod_switch_to_torus32_np(mu, Msize: int) -> np.ndarray:
    """Exact ``modSwitchToTorus32``: message in Z_Msize -> Torus32 phase."""
    interv = np.uint64(_interv(Msize))
    mu_u = np.asarray(mu, dtype=np.int64).astype(np.uint64)
    with np.errstate(over="ignore"):
        phase64 = mu_u * interv  # uint64 wraparound, as upstream
    return (phase64 >> np.uint64(32)).astype(np.uint32).astype(np.int32)


def mod_switch_from_torus32_np(phase, Msize: int) -> np.ndarray:
    """Exact ``modSwitchFromTorus32``: Torus32 phase -> nearest message in Z_Msize."""
    interv = np.uint64(_interv(Msize))
    half = interv // np.uint64(2)
    phase_u = np.asarray(phase, dtype=np.int32).astype(np.uint32).astype(np.uint64)
    with np.errstate(over="ignore"):
        phase64 = (phase_u << np.uint64(32)) + half  # uint64 wraparound
    return (phase64 // interv).astype(np.int64)


def approx_phase_np(phase, Msize: int) -> np.ndarray:
    """Exact ``approxPhase``: round a torus phase to the nearest of Msize slots."""
    interv = np.uint64(_interv(Msize))
    half = interv // np.uint64(2)
    phase_u = np.asarray(phase, dtype=np.int32).astype(np.uint32).astype(np.uint64)
    with np.errstate(over="ignore"):
        phase64 = (phase_u << np.uint64(32)) + half
        phase64 -= phase64 % interv
    return (phase64 >> np.uint64(32)).astype(np.uint32).astype(np.int32)


# ---------------------------------------------------------------------------
# Device (jnp) paths.
# ---------------------------------------------------------------------------

def mod_switch_to_torus32(mu: jax.Array, Msize: int) -> jax.Array:
    """Jittable ``modSwitchToTorus32`` for power-of-two ``Msize``.

    For Msize = 2**m: phase = mu * 2**(32-m) exactly (upstream's uint64 route
    reduces to this because interv = 2**(64-m)).
    """
    m = int(Msize).bit_length() - 1
    if (1 << m) != Msize:
        raise ValueError("jnp mod_switch_to_torus32 requires power-of-two Msize; "
                         "use mod_switch_to_torus32_np for the general case")
    return (jnp.asarray(mu, jnp.int32) << jnp.int32(32 - m)).astype(jnp.int32)


def mod_switch_from_torus32(phase: jax.Array, Msize: int) -> jax.Array:
    """Jittable ``modSwitchFromTorus32`` for power-of-two ``Msize``.

    For Msize = 2**m the upstream uint64 computation reduces to
    ``(uint32(phase) + 2**(31-m)) >> (32-m)`` — pure int32 ops. Used inside
    bootstrapping with Msize = 2N.
    """
    m = int(Msize).bit_length() - 1
    if (1 << m) != Msize:
        raise ValueError("jnp mod_switch_from_torus32 requires power-of-two Msize; "
                         "use mod_switch_from_torus32_np for the general case")
    p = jnp.asarray(phase, jnp.int32).astype(jnp.uint32)
    return ((p + jnp.uint32(1 << (31 - m))) >> jnp.uint32(32 - m)).astype(jnp.int32)


def dtot32(d: jax.Array) -> jax.Array:
    """double -> Torus32: int32(round toward zero of frac(d) * 2**32), upstream ``dtot32``.

    Implemented in float32 — exact for the magnitudes used here (gaussian noise
    scaled by small sigma; |d * 2**32| << 2**24 for every sigma in the default
    parameter sets).
    """
    frac = d - jnp.trunc(d)
    scaled = jnp.trunc(frac * np.float32(_TWO32))
    # Fold (-2^32, 2^32) into the int32 range (-2^31, 2^31) — two's-complement wrap.
    wrapped = scaled - jnp.where(scaled >= np.float32(2**31), np.float32(_TWO32), 0.0)
    wrapped = wrapped + jnp.where(wrapped < np.float32(-(2**31)), np.float32(_TWO32), 0.0)
    return wrapped.astype(jnp.int32)


def gaussian32(mu: jax.Array, sigma: float, key: jax.Array, shape) -> jax.Array:
    """``gaussian32``: torus gaussian sample around ``mu`` with stddev ``sigma``.

    The reference draws from a C++ ``normal_distribution<double>`` seeded by a
    global Mersenne generator (``tfhe_random_generator_setSeed``,
    ``eoc-tfhe-run.cpp:228``); here randomness is an explicit ``jax.random``
    key (threefry), giving determinism-by-construction (the replay property
    the reference gets from its unseeded ``lrand48``, SURVEY.md §5).
    """
    noise = jax.random.normal(key, shape, dtype=jnp.float32) * np.float32(sigma)
    return (jnp.asarray(mu, jnp.int32) + dtot32(noise)).astype(jnp.int32)


def uniform_torus32(key: jax.Array, shape) -> jax.Array:
    """Uniform Torus32 sample (upstream ``uniformTorus32_distrib``)."""
    return jax.random.bits(key, shape, dtype=jnp.uint32).astype(jnp.int32)


def uniform_binary(key: jax.Array, shape) -> jax.Array:
    """Uniform {0,1} int32 sample (LWE/TLwe key coefficients)."""
    return jax.random.bernoulli(key, 0.5, shape).astype(jnp.int32)


def double_to_t32(d: float) -> int:
    """Host-side exact dtot32 for a Python float (used for gate constants)."""
    frac = d - int(d)
    v = int(frac * _TWO32)
    v &= 0xFFFFFFFF
    return v - _TWO32 if v >= 2**31 else v


def t32_to_double(t):
    """Torus32 -> centered double in [-1/2, 1/2) (upstream ``t32tod``).

    Host-side numpy; exact (int32 / 2^32 is representable in f64).
    """
    return np.asarray(t, np.int32).astype(np.float64) / _TWO32
