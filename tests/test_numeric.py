"""Torus numerics: exactness against independent uint64 reference math."""

import numpy as np
import jax
import jax.numpy as jnp

from eoc_tfhe_tpu.core import numeric


def ref_mod_switch_to(mu, Msize):
    interv = ((1 << 63) // Msize) * 2
    phase64 = (int(mu) * interv) % (1 << 64)
    return np.int32(np.uint32((phase64 >> 32) & 0xFFFFFFFF))


def ref_mod_switch_from(phase, Msize):
    interv = ((1 << 63) // Msize) * 2
    phase64 = (((int(phase) & 0xFFFFFFFF) << 32) + interv // 2) % (1 << 64)
    return phase64 // interv


def test_mod_switch_np_roundtrip_odd_msize():
    Msize = (1 << 31) - 1  # the wrapper's integer encoding (eoc-tfhe-run.cpp:35)
    vals = np.array([0, 1, 42, 58, 1000, -5 % Msize, Msize - 1], dtype=np.int64)
    phases = numeric.mod_switch_to_torus32_np(vals, Msize)
    back = numeric.mod_switch_from_torus32_np(phases, Msize)
    np.testing.assert_array_equal(back, vals % Msize)


def test_mod_switch_np_matches_reference_semantics():
    for Msize in [8, 2048, (1 << 31) - 1, 7, 12345]:
        for mu in [0, 1, 2, Msize // 2, Msize - 1]:
            got = numeric.mod_switch_to_torus32_np(mu, Msize)
            assert int(np.uint32(got)) == int(np.uint32(ref_mod_switch_to(mu, Msize))), (Msize, mu)
    for Msize in [8, 2048, 12345]:
        for phase in [0, 1, -1, 2**30, -(2**30), 123456789, -987654321]:
            got = numeric.mod_switch_from_torus32_np(np.int32(phase), Msize)
            assert int(got) == int(ref_mod_switch_from(phase, Msize)), (Msize, phase)


def test_mod_switch_jnp_pow2_matches_np():
    rng = np.random.default_rng(1)
    phases = rng.integers(-(2**31), 2**31, size=1000, dtype=np.int64).astype(np.int32)
    for Msize in [8, 64, 2048]:
        got = np.asarray(numeric.mod_switch_from_torus32(jnp.asarray(phases), Msize))
        want = numeric.mod_switch_from_torus32_np(phases, Msize)
        np.testing.assert_array_equal(got.astype(np.int64), want % Msize)
        mus = rng.integers(0, Msize, size=100)
        got_to = np.asarray(numeric.mod_switch_to_torus32(jnp.asarray(mus, dtype=jnp.int32), Msize))
        want_to = numeric.mod_switch_to_torus32_np(mus, Msize)
        np.testing.assert_array_equal(got_to, want_to)


def test_approx_phase_rounds_to_slot():
    Msize = 8
    mu = numeric.mod_switch_to_torus32_np(3, Msize)
    noisy = np.int32(mu + 12345)
    assert int(numeric.approx_phase_np(noisy, Msize)) == int(mu)


def test_gaussian32_zero_sigma_is_exact():
    out = numeric.gaussian32(jnp.int32(12345), 0.0, jax.random.key(0), (16,))
    np.testing.assert_array_equal(np.asarray(out), np.full(16, 12345, np.int32))


def test_gaussian32_small_sigma_stays_close():
    sigma = 2.0 ** -25
    out = np.asarray(numeric.gaussian32(jnp.int32(0), sigma, jax.random.key(1), (10000,)))
    # noise stddev in Torus32 units = sigma * 2^32 = 128
    assert np.abs(out.astype(np.int64)).max() < 128 * 6
    assert 64 < out.astype(np.int64).std() < 256


def test_double_to_t32():
    assert numeric.double_to_t32(0.25) == 1 << 30
    assert numeric.double_to_t32(-0.25) == -(1 << 30)
    assert numeric.double_to_t32(1.0 / 8) == 1 << 29
