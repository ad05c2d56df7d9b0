"""Gate bootstrapping end-to-end on tiny parameters (BASELINE configs[1])."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eoc_tfhe_tpu.core import lwe, keys, bootstrap, gates
from eoc_tfhe_tpu.core.params import test_params as make_test_params
from eoc_tfhe_tpu.core.numeric import mod_switch_to_torus32_np
from eoc_tfhe_tpu.ops.keyswitch import keyswitch_apply, prepare_keyswitch_matmul

P = make_test_params()


@pytest.fixture(scope="module")
def keyset():
    return keys.new_random_gate_bootstrapping_secret_keyset(jax.random.key(42), P)


@pytest.fixture(scope="module")
def ek(keyset):
    return bootstrap.prepare_eval_key(keyset.cloud)


def test_keyswitch_roundtrip(keyset):
    """Keyswitch an extracted-key encryption back to the in/out key."""
    sk = keyset.lwe_key
    ext_key = keyset.extracted_key
    mu = np.int32(1 << 29)
    ct = lwe.lwe_sym_encrypt(jax.random.key(7), jnp.asarray(mu), 0.0, ext_key)
    out = keyswitch_apply(ct, keyset.cloud.bk.ks, t=P.ks.t, basebit=P.ks.basebit)
    phase = int(lwe.lwe_phase(out, sk))
    err = ((phase - (1 << 29) + 2**31) % 2**32) - 2**31
    assert abs(err) < 2**22, err


def test_keyswitch_batched(keyset):
    sk = keyset.lwe_key
    ext_key = keyset.extracted_key
    mus = (np.arange(8, dtype=np.int64) * (1 << 27)).astype(np.int32)
    ct = lwe.lwe_sym_encrypt(jax.random.key(8), jnp.asarray(mus), 0.0, ext_key)
    out = keyswitch_apply(ct, keyset.cloud.bk.ks, t=P.ks.t, basebit=P.ks.basebit)
    phases = np.asarray(lwe.lwe_phase(out, sk)).astype(np.int64)
    err = ((phases - mus.astype(np.int64) + 2**31) % 2**32) - 2**31
    assert np.abs(err).max() < 2**22


@pytest.mark.parametrize("rotation_impl", ["gather", "onehot"])
def test_bootstrap_sign(keyset, ek, rotation_impl):
    """bootstrap(mu, ct) = +-mu by sign of phase(ct)."""
    sk = keyset.lwe_key
    mu = np.int32(gates.MU_BOOL)
    for msg_mu, want_sign in [(1 << 29, 1), (-(1 << 29), -1)]:
        ct = lwe.lwe_sym_encrypt(jax.random.key(9), jnp.int32(msg_mu),
                                 P.in_out_params.alpha_min, sk)
        out = bootstrap.bootstrap(jnp.int32(mu), ct, ek, P, rotation_impl)
        phase = int(lwe.lwe_phase(out, sk))
        err = ((phase - want_sign * int(mu) + 2**31) % 2**32) - 2**31
        assert abs(err) < 2**27, (msg_mu, phase, err)


def test_bootstrap_batched(keyset, ek):
    sk = keyset.lwe_key
    signs = np.array([1, -1, 1, 1, -1, -1, 1, -1])
    mus = (signs * (1 << 29)).astype(np.int32)
    ct = lwe.lwe_sym_encrypt(jax.random.key(10), jnp.asarray(mus),
                             P.in_out_params.alpha_min, sk)
    out = bootstrap.bootstrap(jnp.int32(gates.MU_BOOL), ct, ek, P)
    phases = np.asarray(lwe.lwe_phase(out, sk)).astype(np.int64)
    want = signs * gates.MU_BOOL
    err = ((phases - want + 2**31) % 2**32) - 2**31
    assert np.abs(err).max() < 2**27


def _enc_bits(key, bits, keyset):
    return gates.encrypt_bit(key, jnp.asarray(bits), keyset.lwe_key, P)


def test_nand_truth_table(keyset, ek):
    """Config[1]: bootstrapped NAND over the full truth table, batched."""
    a = np.array([0, 0, 1, 1], bool)
    b = np.array([0, 1, 0, 1], bool)
    ca = _enc_bits(jax.random.key(11), a, keyset)
    cb = _enc_bits(jax.random.key(12), b, keyset)
    out = gates.nand(ca, cb, ek, P)
    got = gates.decrypt_bit(out, keyset.lwe_key)
    np.testing.assert_array_equal(got, ~(a & b))


def test_all_two_input_gates(keyset, ek):
    a = np.array([0, 0, 1, 1], bool)
    b = np.array([0, 1, 0, 1], bool)
    ca = _enc_bits(jax.random.key(13), a, keyset)
    cb = _enc_bits(jax.random.key(14), b, keyset)
    table = {
        gates.and_: a & b, gates.or_: a | b, gates.nor: ~(a | b),
        gates.xor_: a ^ b, gates.xnor: ~(a ^ b),
        gates.andny: ~a & b, gates.andyn: a & ~b,
        gates.orny: ~a | b, gates.oryn: a | ~b,
    }
    for fn, want in table.items():
        got = gates.decrypt_bit(fn(ca, cb, ek, P), keyset.lwe_key)
        np.testing.assert_array_equal(got, want, err_msg=fn.__name__)


def test_linear_gates(keyset):
    a = np.array([0, 1], bool)
    ca = _enc_bits(jax.random.key(15), a, keyset)
    np.testing.assert_array_equal(gates.decrypt_bit(gates.not_(ca), keyset.lwe_key), ~a)
    np.testing.assert_array_equal(gates.decrypt_bit(gates.copy(ca), keyset.lwe_key), a)
    cc = gates.constant(jnp.asarray(np.array([True, False])), P)
    np.testing.assert_array_equal(gates.decrypt_bit(cc, keyset.lwe_key),
                                  np.array([True, False]))


def test_mux(keyset, ek):
    c = np.array([0, 0, 1, 1], bool)
    a = np.array([0, 1, 0, 1], bool)
    b = np.array([1, 0, 1, 0], bool)
    cc = _enc_bits(jax.random.key(16), c, keyset)
    ca = _enc_bits(jax.random.key(17), a, keyset)
    cb = _enc_bits(jax.random.key(18), b, keyset)
    got = gates.decrypt_bit(gates.mux(cc, ca, cb, ek, P), keyset.lwe_key)
    np.testing.assert_array_equal(got, np.where(c, a, b))
