"""LWE layer: batched encrypt/decrypt round trips and linear homomorphisms.

Mirrors the reference's black-box vector style (SURVEY.md §4): fixed
plaintexts 42 / 15+27 / 50-8, via configs[0] of BASELINE.json.
"""

import numpy as np
import jax
import jax.numpy as jnp

from eoc_tfhe_tpu.core import lwe, numeric
from eoc_tfhe_tpu.core.params import default_128bit_params

P128 = default_128bit_params()
MSIZE = (1 << 31) - 1              # eoc-tfhe-run.cpp:35
ALPHA = 1.0 / (10.0 * MSIZE)       # eoc-tfhe-run.cpp:36


def test_int32_roundtrip_42():
    sk = lwe.lwe_key_gen(jax.random.key(0), P128.in_out_params)
    mu = numeric.mod_switch_to_torus32_np(42, MSIZE)
    ct = lwe.lwe_sym_encrypt(jax.random.key(1), jnp.asarray(mu), ALPHA, sk)
    dec = numeric.mod_switch_from_torus32_np(np.asarray(lwe.lwe_phase(ct, sk)), MSIZE)
    assert int(dec) == 42


def test_batched_roundtrip():
    sk = lwe.lwe_key_gen(jax.random.key(0), P128.in_out_params)
    vals = np.arange(256, dtype=np.int64)
    mus = numeric.mod_switch_to_torus32_np(vals, MSIZE)
    ct = lwe.lwe_sym_encrypt(jax.random.key(2), jnp.asarray(mus), ALPHA, sk)
    assert ct.a.shape == (256, P128.n)
    dec = numeric.mod_switch_from_torus32_np(np.asarray(lwe.lwe_phase(ct, sk)), MSIZE)
    np.testing.assert_array_equal(dec, vals)


def test_homomorphic_add_15_27():
    sk = lwe.lwe_key_gen(jax.random.key(0), P128.in_out_params)
    m1 = numeric.mod_switch_to_torus32_np(15, MSIZE)
    m2 = numeric.mod_switch_to_torus32_np(27, MSIZE)
    c1 = lwe.lwe_sym_encrypt(jax.random.key(3), jnp.asarray(m1), ALPHA, sk)
    c2 = lwe.lwe_sym_encrypt(jax.random.key(4), jnp.asarray(m2), ALPHA, sk)
    s = lwe.lwe_add(c1, c2)
    dec = numeric.mod_switch_from_torus32_np(np.asarray(lwe.lwe_phase(s, sk)), MSIZE)
    assert int(dec) == 42


def test_homomorphic_sub_50_8():
    # Real subtraction — the reference's Lua layer aliases subtract to add
    # (tfhe.lua:41-43); we implement the real thing (SURVEY.md appendix A).
    sk = lwe.lwe_key_gen(jax.random.key(0), P128.in_out_params)
    m1 = numeric.mod_switch_to_torus32_np(50, MSIZE)
    m2 = numeric.mod_switch_to_torus32_np(8, MSIZE)
    c1 = lwe.lwe_sym_encrypt(jax.random.key(5), jnp.asarray(m1), ALPHA, sk)
    c2 = lwe.lwe_sym_encrypt(jax.random.key(6), jnp.asarray(m2), ALPHA, sk)
    d = lwe.lwe_sub(c1, c2)
    dec = numeric.mod_switch_from_torus32_np(np.asarray(lwe.lwe_phase(d, sk)), MSIZE)
    assert int(dec) == 42


def test_noiseless_trivial_and_negate():
    sk = lwe.lwe_key_gen(jax.random.key(0), P128.in_out_params)
    mu = jnp.int32(123456)
    ct = lwe.lwe_noiseless_trivial(mu, P128.n)
    assert int(lwe.lwe_phase(ct, sk)) == 123456
    assert int(lwe.lwe_phase(lwe.lwe_negate(ct), sk)) == -123456


def test_add_mul_sub_mul():
    sk = lwe.lwe_key_gen(jax.random.key(0), P128.in_out_params)
    c1 = lwe.lwe_sym_encrypt(jax.random.key(7), jnp.int32(1000), 0.0, sk)
    c2 = lwe.lwe_sym_encrypt(jax.random.key(8), jnp.int32(11), 0.0, sk)
    got = lwe.lwe_add_mul(c1, 7, c2)
    assert int(lwe.lwe_phase(got, sk)) == 1000 + 7 * 11
    got = lwe.lwe_sub_mul(c1, 3, c2)
    assert int(lwe.lwe_phase(got, sk)) == 1000 - 3 * 11


def test_phase_wraparound_is_exact():
    # int32 wraparound must be exact: phases near the torus boundary.
    sk = lwe.lwe_key_gen(jax.random.key(0), P128.in_out_params)
    mu = jnp.int32(2**31 - 5)
    ct = lwe.lwe_sym_encrypt(jax.random.key(9), mu, 0.0, sk)
    assert int(lwe.lwe_phase(ct, sk)) == 2**31 - 5
