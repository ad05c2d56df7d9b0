"""Validation against the independent f64 FFT oracle (tests/oracle.py).

Round-1 VERDICT item 2: the package's exact-integer pipeline was previously
only self-consistent (Pallas vs XLA vs the same polymul primitives).  These
tests compare it against :mod:`tests.oracle` — a from-the-spec numpy
reimplementation of the reference pipeline with the Lagrange half-complex
f64 FFT the reference actually ships (Nayuki processor semantics) — at the
full default 128-bit parameter set, breaking the circularity.

Key agreement properties:
  * The oracle's f64 FFT external product equals the exact integer
    convolution to within a few ULP of f64 rounding (values ~2^48, mantissa
    2^52 — upstream relies on exactly this margin), so one-step outputs must
    match to |delta| <= a small bound.
  * Full bootstraps may diverge coefficient-wise (rounding differences feed
    back through the nonlinear gadget decomposition) but must decrypt
    identically and keep phases within the noise budget.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eoc_tfhe_tpu.core import bootstrap, gates, keys
from eoc_tfhe_tpu.core.params import default_128bit_params
from eoc_tfhe_tpu.core.params import test_params as toy_params
from eoc_tfhe_tpu.ops import ntt, polymul

import oracle


def _negacyclic_int64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Schoolbook negacyclic product over int64 (independent of the package)."""
    N = a.shape[-1]
    out = np.zeros(np.broadcast_shapes(a.shape, b.shape), np.int64)
    a = a.astype(np.int64)
    b = b.astype(np.int64)
    for s in range(N):
        bs = np.roll(b, s, axis=-1)
        sign = np.ones(N, np.int64)
        if s:
            sign[:s] = -1
        out += a[..., s:s + 1] * bs * sign
    return out


def test_oracle_fft_selftest():
    """The oracle's FFT pipeline reproduces exact small negacyclic products."""
    rng = np.random.default_rng(0)
    N = 64
    fft = oracle.LagrangeFFT(N)
    a = rng.integers(-100, 100, (3, N)).astype(np.int32)
    b = rng.integers(-1000, 1000, (3, N)).astype(np.int32)
    want = _negacyclic_int64(a, b).astype(np.int64).astype(np.int32)
    got = fft.poly_mul(a, b)
    np.testing.assert_array_equal(got, want)


def test_oracle_modswitch_matches_package():
    from eoc_tfhe_tpu.core import numeric
    rng = np.random.default_rng(1)
    xs = rng.integers(-2**31, 2**31, 256).astype(np.int32)
    got = oracle.mod_switch_from_torus32(xs, 2048)
    want = np.asarray(numeric.mod_switch_from_torus32(jnp.asarray(xs), 2048))
    np.testing.assert_array_equal(got % 2048, want % 2048)
    ms = np.asarray(oracle.mod_switch_to_torus32(np.arange(8), 8))
    want2 = np.asarray(numeric.mod_switch_to_torus32(jnp.arange(8), 8))
    np.testing.assert_array_equal(ms, want2)


@pytest.mark.parametrize("params_fn", [toy_params, default_128bit_params])
def test_external_product_vs_oracle_fft(params_fn):
    """One exact NTT external product vs the oracle's f64 FFT version."""
    params = params_fn()
    tg = params.tgsw_params
    N, J, U = tg.tlwe_params.N, tg.kpl, tg.tlwe_params.k + 1
    rng = np.random.default_rng(2)
    B = 2
    acc = rng.integers(-2**31, 2**31, (B, U, N)).astype(np.int64).astype(np.int32)
    bk_row = rng.integers(-2**31, 2**31, (1, J, U, N)).astype(np.int64).astype(np.int32)

    # package: exact integer path
    from eoc_tfhe_tpu.core.tgsw import decompose_h
    digits = decompose_h(jnp.asarray(acc), tg)
    ctx = ntt.context_for_params(params)
    key = ntt.prepare_key_ntt(jnp.asarray(bk_row), ctx)
    got = np.asarray(ntt.external_product_ntt(digits, key.T8[0], ctx))

    # oracle: decompose + f64 FFT MAC + direct, fully independent
    odig = oracle.decompose(acc, tg.l, tg.Bgbit)
    np.testing.assert_array_equal(np.asarray(digits), odig)
    fft = oracle.LagrangeFFT(N)
    dfft = fft.reverse(odig)
    bfft = fft.reverse(bk_row[0])
    want = fft.direct_torus32(np.einsum("bjf,juf->buf", dfft, bfft) * 0.5)

    # f64 rounding in the oracle: |delta| of a ~2^48-magnitude convolution is
    # a few ULP; the int32 wrap makes deltas either tiny or ~2^32-tiny.
    delta = (got.astype(np.int64) - want.astype(np.int64)) & 0xFFFFFFFF
    delta = np.minimum(delta, (1 << 32) - delta)
    assert delta.max() <= 16, delta.max()


def _encrypt_pair(keyset, params, a, b):
    ca = gates.encrypt_bit(jax.random.key(11), jnp.asarray(a), keyset.lwe_key, params)
    cb = gates.encrypt_bit(jax.random.key(12), jnp.asarray(b), keyset.lwe_key, params)
    return ca, cb


@pytest.mark.parametrize("params_fn,marker", [
    (toy_params, None),
    pytest.param(default_128bit_params, None, marks=pytest.mark.slow),
])
def test_gates_vs_oracle(params_fn, marker):
    """Full NAND/XOR bootstraps: package exact path vs oracle f64 path.

    Requires identical decryptions and phases within the noise budget.
    """
    params = params_fn()
    keyset = keys.new_random_gate_bootstrapping_secret_keyset(jax.random.key(0), params)
    ek = bootstrap.prepare_eval_key_ntt(keyset.cloud, params)

    orc = oracle.OracleBootstrap(
        bk_rows=np.asarray(keyset.cloud.bk.bk),
        ks=np.asarray(keyset.cloud.bk.ks.ks),
        params=params)

    rng = np.random.default_rng(3)
    B = 4
    a = rng.integers(0, 2, B).astype(bool)
    b = rng.integers(0, 2, B).astype(bool)
    ca, cb = _encrypt_pair(keyset, params, a, b)
    ca_np = (np.asarray(ca.a), np.asarray(ca.b))
    cb_np = (np.asarray(cb.a), np.asarray(cb.b))

    s = np.asarray(keyset.lwe_key.s)
    mu8 = int(oracle.mod_switch_to_torus32(1, 8))
    for gate, ogate, truth in [
        (gates.nand, orc.nand, ~(a & b)),
        (gates.xor_, orc.xor_, a ^ b),
    ]:
        out = gate(ca, cb, ek, params)
        oa, ob = ogate(ca_np, cb_np)

        got_bits = np.asarray(gates.decrypt_bit(out, keyset.lwe_key))
        orc_phase = oracle.lwe_phase(oa, ob, s)
        orc_bits = orc_phase > 0
        np.testing.assert_array_equal(got_bits, truth)
        np.testing.assert_array_equal(orc_bits, truth)

        # Phase agreement: both should sit near +-1/8; their difference is
        # bounded by the two pipelines' (independent) noise, far below the
        # 1/16 margin.
        our_phase = oracle.lwe_phase(np.asarray(out.a), np.asarray(out.b), s)
        diff = np.abs(our_phase.astype(np.int64) - orc_phase.astype(np.int64))
        assert diff.max() < (1 << 27), diff.max()
        assert np.abs(np.abs(our_phase.astype(np.int64)) - mu8).max() < (1 << 28)


@pytest.mark.parametrize("params_fn", [
    toy_params,
    pytest.param(default_128bit_params, marks=pytest.mark.slow),
])
def test_mux_vs_oracle(params_fn):
    """bootsMUX (2 woKS bootstraps + keyswitch) vs the f64 oracle."""
    params = params_fn()
    keyset = keys.new_random_gate_bootstrapping_secret_keyset(jax.random.key(0), params)
    ek = bootstrap.prepare_eval_key_ntt(keyset.cloud, params)
    orc = oracle.OracleBootstrap(
        bk_rows=np.asarray(keyset.cloud.bk.bk),
        ks=np.asarray(keyset.cloud.bk.ks.ks),
        params=params)

    rng = np.random.default_rng(9)
    B = 4
    c = rng.integers(0, 2, B).astype(bool)
    a = rng.integers(0, 2, B).astype(bool)
    b = rng.integers(0, 2, B).astype(bool)
    cc = gates.encrypt_bit(jax.random.key(21), jnp.asarray(c), keyset.lwe_key, params)
    ca = gates.encrypt_bit(jax.random.key(22), jnp.asarray(a), keyset.lwe_key, params)
    cb = gates.encrypt_bit(jax.random.key(23), jnp.asarray(b), keyset.lwe_key, params)

    out = gates.mux(cc, ca, cb, ek, params)
    truth = np.where(c, a, b)
    np.testing.assert_array_equal(
        np.asarray(gates.decrypt_bit(out, keyset.lwe_key)), truth)

    oa, ob = orc.mux((np.asarray(cc.a), np.asarray(cc.b)),
                     (np.asarray(ca.a), np.asarray(ca.b)),
                     (np.asarray(cb.a), np.asarray(cb.b)))
    s = np.asarray(keyset.lwe_key.s)
    np.testing.assert_array_equal(oracle.lwe_phase(oa, ob, s) > 0, truth)
    our_phase = oracle.lwe_phase(np.asarray(out.a), np.asarray(out.b), s)
    diff = np.abs(our_phase.astype(np.int64)
                  - oracle.lwe_phase(oa, ob, s).astype(np.int64))
    assert diff.max() < (1 << 28), diff.max()
