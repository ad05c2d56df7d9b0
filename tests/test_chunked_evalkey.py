"""Chunked (Pallas matmul-form) evaluation key through the full gate API."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eoc_tfhe_tpu.core import gates, keys, bootstrap
from eoc_tfhe_tpu.core.params import test_params as make_test_params

P = make_test_params()


@pytest.fixture(scope="module")
def keyset():
    return keys.new_random_gate_bootstrapping_secret_keyset(jax.random.key(6), P)


def test_nand_with_chunked_evalkey(keyset):
    ek_c = bootstrap.prepare_eval_key_fused(keyset.cloud)
    ek_r = bootstrap.prepare_eval_key(keyset.cloud)
    a = np.array([0, 0, 1, 1], bool)
    b = np.array([0, 1, 0, 1], bool)
    ca = gates.encrypt_bit(jax.random.key(41), jnp.asarray(a), keyset.lwe_key, P)
    cb = gates.encrypt_bit(jax.random.key(42), jnp.asarray(b), keyset.lwe_key, P)
    out_c = gates.nand(ca, cb, ek_c, P, rotation_impl="gather")
    out_r = gates.nand(ca, cb, ek_r, P, rotation_impl="gather")
    # Pallas path is bit-exact vs the scan path.
    np.testing.assert_array_equal(np.asarray(out_c.a), np.asarray(out_r.a))
    np.testing.assert_array_equal(np.asarray(out_c.b), np.asarray(out_r.b))
    np.testing.assert_array_equal(gates.decrypt_bit(out_c, keyset.lwe_key), ~(a & b))


def test_eval_key_form_validation(keyset):
    """EvalKey form/field consistency is enforced at construction (VERDICT
    r2 item 10): wrong combinations raise immediately, not inside a scan."""
    ek = bootstrap.prepare_eval_key(keyset.cloud)
    assert ek.form == "rows"
    ek_f = bootstrap.prepare_eval_key_fused(keyset.cloud)
    assert ek_f.form == "compact" and ek_f.bk_compact is not None
    ek_n = bootstrap.prepare_eval_key_ntt(keyset.cloud, P, kernel=False)
    assert ek_n.form == "ntt_scan" and ek_n.bk_ntt is not None

    import dataclasses
    with pytest.raises(ValueError, match="unknown EvalKey form"):
        bootstrap._check_eval_key(dataclasses.replace(ek, form="fft"))
    with pytest.raises(ValueError, match="requires its key field"):
        bootstrap._check_eval_key(dataclasses.replace(ek, form="ntt_kernel"))
    with pytest.raises(ValueError, match="requires ntt_ctx"):
        bootstrap._check_eval_key(dataclasses.replace(
            ek_n, form="ntt_scan", ntt_ctx=None))


def test_back_compat_chunked_alias(keyset):
    ek = bootstrap.prepare_eval_key_chunked(keyset.cloud)
    assert ek.form == "compact" and ek.bk_compact is not None
