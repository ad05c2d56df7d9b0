"""Fused Pallas NTT blind-rotate kernel vs the XLA scan path.

The kernel (ops/pallas_ntt_blindrot.py) re-implements the exact CRT-NTT
external product of ops/ntt.py as one fused Pallas call; both replace the
reference's f64 FFT blind rotation (upstream
``tfhe_blindRotate_FFT``/``tgsw-fft-operations.cpp`` — SURVEY.md §3.5).
Bit-exactness here chains to the independent f64 oracle through
tests/test_reference_oracle.py, which validates the scan path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eoc_tfhe_tpu.core import bootstrap, gates, keys
from eoc_tfhe_tpu.core import params as params_mod
from eoc_tfhe_tpu.ops import ntt
from eoc_tfhe_tpu.ops import pallas_ntt_blindrot as pnb


def toy_params():
    return params_mod.test_params(n=16, N=64, k=1, l=3, Bgbit=7)


@pytest.fixture(scope="module")
def keyset():
    return keys.new_random_gate_bootstrapping_secret_keyset(
        jax.random.key(0), toy_params())


def test_kernel_bit_exact_vs_scan(keyset):
    p = toy_params()
    tl = p.tgsw_params.tlwe_params
    N, k, n, B = tl.N, tl.k, p.n, 8
    ek = bootstrap.prepare_eval_key_ntt(keyset.cloud, p, kernel=False)
    ctx = ek.ntt_ctx

    r = np.random.default_rng(1)
    acc0 = jnp.asarray(r.integers(-2**31, 2**31, (B, k + 1, N),
                                  dtype=np.int64).astype(np.int32))
    bara = jnp.asarray(r.integers(0, 2 * N, (n, B), dtype=np.int64)
                       .astype(np.int32))

    ref = np.asarray(ntt.blind_rotate_ntt(acc0, bara, ek.bk_ntt, p, ctx))
    T8k = pnb.prepare_kernel_key(ek.bk_ntt, ctx)
    out = np.asarray(pnb.blind_rotate_ntt_pallas(acc0, bara, T8k, ctx, p,
                                                 block_b=B, interpret=True))
    np.testing.assert_array_equal(ref, out)


def test_kernel_key_layouts_match(keyset):
    p = toy_params()
    ek = bootstrap.prepare_eval_key_ntt(keyset.cloud, p, kernel=False)
    kj = np.asarray(pnb.prepare_kernel_key(ek.bk_ntt, ek.ntt_ctx))
    kn = pnb.prepare_kernel_key_np(np.asarray(ek.bk_ntt.T8))
    np.testing.assert_array_equal(kj, kn)


def test_bootstrap_woks_kernel_form_matches(keyset):
    """End-to-end NAND through bootstrap_woKS with the kernel-form eval key
    (interpret mode on CPU) is bit-exact vs the scan-form eval key."""
    p = toy_params()
    B = 4
    r = np.random.default_rng(2)
    a = jnp.asarray(r.integers(0, 2, B).astype(bool))
    b = jnp.asarray(r.integers(0, 2, B).astype(bool))
    ca = gates.encrypt_bit(jax.random.key(1), a, keyset.lwe_key, p)
    cb = gates.encrypt_bit(jax.random.key(2), b, keyset.lwe_key, p)

    ek_scan = bootstrap.prepare_eval_key_ntt(keyset.cloud, p, kernel=False)
    ek_kern = bootstrap.prepare_eval_key_ntt(keyset.cloud, p, kernel=True)
    assert ek_kern.bk_ntt_kernel is not None and ek_kern.bk_ntt is None

    out_s = gates.nand(ca, cb, ek_scan, p)
    out_k = gates.nand(ca, cb, ek_kern, p)
    np.testing.assert_array_equal(np.asarray(out_s.a), np.asarray(out_k.a))
    np.testing.assert_array_equal(np.asarray(out_s.b), np.asarray(out_k.b))
    got = gates.decrypt_bit(out_k, keyset.lwe_key)
    np.testing.assert_array_equal(np.asarray(got),
                                  ~(np.asarray(a) & np.asarray(b)))
