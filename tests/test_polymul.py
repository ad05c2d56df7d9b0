"""Exact negacyclic polymul: int8-limb MXU backend vs arbitrary-precision reference."""

import numpy as np
import jax.numpy as jnp

from eoc_tfhe_tpu.ops import polymul, rotate


def negacyclic_ref(x, y):
    """Arbitrary-precision negacyclic product mod 2^32, via Python ints."""
    N = len(x)
    out = [0] * N
    for r in range(N):
        for c in range(N):
            m = r + c
            if m < N:
                out[m] += int(x[r]) * int(y[c])
            else:
                out[m - N] -= int(x[r]) * int(y[c])
    return np.array([((v + 2**31) % 2**32) - 2**31 for v in out], dtype=np.int64).astype(np.int32)


def test_limb_decompose_roundtrip():
    rng = np.random.default_rng(0)
    y = rng.integers(-(2**31), 2**31, size=1000, dtype=np.int64).astype(np.int32)
    limbs = np.asarray(polymul.decompose_signed_limbs(jnp.asarray(y)))
    assert limbs.min() >= -128 and limbs.max() <= 127
    back = np.asarray(polymul.recombine_limbs(jnp.asarray(limbs), axis=-1))
    np.testing.assert_array_equal(back, y)


def test_negacyclic_polymul_exact_small():
    rng = np.random.default_rng(1)
    N = 16
    x = rng.integers(-64, 64, size=N).astype(np.int32)
    y = rng.integers(-(2**31), 2**31, size=N, dtype=np.int64).astype(np.int32)
    got = np.asarray(polymul.negacyclic_polymul_exact(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_array_equal(got, negacyclic_ref(x, y))


def test_small_by_torus_matmul_matches_reference():
    rng = np.random.default_rng(2)
    N, J, U, B = 32, 4, 2, 3
    x = rng.integers(-64, 64, size=(B, J, N)).astype(np.int32)
    y = rng.integers(-(2**31), 2**31, size=(J, U, N), dtype=np.int64).astype(np.int32)
    got = np.asarray(polymul.small_by_torus_matmul(jnp.asarray(x), jnp.asarray(y)))
    for b in range(B):
        for u in range(U):
            want = np.zeros(N, np.int32)
            for j in range(J):
                want = (want.astype(np.int64) + negacyclic_ref(x[b, j], y[j, u]).astype(np.int64)
                        ).astype(np.int32)
            np.testing.assert_array_equal(got[b, u], want)


def test_torus_by_small_shared_matches_reference():
    rng = np.random.default_rng(3)
    N, J, B = 32, 2, 4
    a = rng.integers(-(2**31), 2**31, size=(B, J, N), dtype=np.int64).astype(np.int32)
    key = rng.integers(0, 2, size=(J, N)).astype(np.int32)
    got = np.asarray(polymul.torus_by_small_shared_matmul(jnp.asarray(a), jnp.asarray(key)))
    for b in range(B):
        want = np.zeros(N, np.int32)
        for j in range(J):
            want = (want.astype(np.int64) + negacyclic_ref(key[j], a[b, j]).astype(np.int64)
                    ).astype(np.int32)
        np.testing.assert_array_equal(got[b], want)


def test_mul_by_xai_both_impls():
    rng = np.random.default_rng(4)
    N, B = 256, 5
    p = rng.integers(-(2**31), 2**31, size=(B, N), dtype=np.int64).astype(np.int32)
    a = rng.integers(0, 2 * N, size=(B,)).astype(np.int32)
    got_g = np.asarray(rotate.mul_by_xai_gather(jnp.asarray(p), jnp.asarray(a)))
    got_o = np.asarray(rotate.mul_by_xai_onehot(jnp.asarray(p), jnp.asarray(a), chunk=64))
    got_b = np.asarray(rotate.mul_by_xai_barrel(jnp.asarray(p), jnp.asarray(a)))
    for b in range(B):
        delta = np.zeros(N, np.int64)
        delta[int(a[b]) % (2 * N) % N] = 1 if (int(a[b]) % (2 * N)) < N else -1
        want = negacyclic_ref(delta.astype(np.int32), p[b])
        np.testing.assert_array_equal(got_g[b], want)
        np.testing.assert_array_equal(got_o[b], want)
        np.testing.assert_array_equal(got_b[b], want)


def test_mul_by_xai_identity_and_sign():
    p = jnp.asarray(np.arange(8, dtype=np.int32))
    # a = 0: identity
    np.testing.assert_array_equal(np.asarray(rotate.mul_by_xai_gather(p, jnp.int32(0))),
                                  np.arange(8, dtype=np.int32))
    # a = N: negation (X^N = -1)
    np.testing.assert_array_equal(np.asarray(rotate.mul_by_xai_gather(p, jnp.int32(8))),
                                  -np.arange(8, dtype=np.int32))
    # onehot impl agrees
    np.testing.assert_array_equal(
        np.asarray(rotate.mul_by_xai_onehot(p[None], jnp.asarray([8], np.int32), chunk=4))[0],
        -np.arange(8, dtype=np.int32))
