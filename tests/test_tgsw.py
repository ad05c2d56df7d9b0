"""TLWE/TGSW: decomposition exactness, phase round trips, external product."""

import numpy as np
import jax
import jax.numpy as jnp

from eoc_tfhe_tpu.core import tlwe, tgsw
from eoc_tfhe_tpu.core.params import test_params as make_test_params

P = make_test_params()  # N=64, k=1, n=16, l=2, Bgbit=8
TG = P.tgsw_params
TL = TG.tlwe_params


def test_decompose_h_reconstructs():
    """sum_p digit_p * h_p must approximate the input to Bgbit*l bits."""
    rng = np.random.default_rng(0)
    polys = rng.integers(-(2**31), 2**31, size=(3, TL.k + 1, TL.N),
                         dtype=np.int64).astype(np.int32)
    digits = np.asarray(tgsw.decompose_h(jnp.asarray(polys), TG))
    assert digits.min() >= -TG.halfBg and digits.max() < TG.halfBg
    h = np.asarray(TG.h, np.int64)
    # reconstruct bloc by bloc
    digits = digits.reshape(3, TL.k + 1, TG.l, TL.N)
    recon = (digits.astype(np.int64) * h[None, None, :, None]).sum(axis=2)
    recon = ((recon + 2**31) % 2**32 - 2**31).astype(np.int32)
    err = (polys.astype(np.int64) - recon.astype(np.int64))
    err = ((err + 2**31) % 2**32) - 2**31
    # The offset trick truncates (does not round-to-nearest) the low
    # 32 - l*Bgbit bits: the error is one-sided, < 2^(32 - l*Bgbit).
    assert np.abs(err).max() < 2 ** (32 - TG.l * TG.Bgbit)


def test_tlwe_roundtrip_zero():
    key = tlwe.tlwe_key_gen(jax.random.key(0), TL)
    ct = tlwe.tlwe_sym_encrypt_zero(jax.random.key(1), 1e-9, key, (5,))
    phase = np.asarray(tlwe.tlwe_phase(ct, key))
    assert phase.shape == (5, TL.N)
    assert np.abs(phase.astype(np.int64)).max() < 2**8  # tiny noise only


def test_tlwe_trivial_and_extract():
    key = tlwe.tlwe_key_gen(jax.random.key(0), TL)
    mu = np.zeros(TL.N, np.int32)
    mu[0] = 1 << 29
    mu[3] = 777
    ct = tlwe.tlwe_noiseless_trivial(jnp.asarray(mu), TL.k)
    np.testing.assert_array_equal(np.asarray(tlwe.tlwe_phase(ct, key)), mu)
    ext = tlwe.tlwe_extract_lwe_sample(ct, index=0)
    from eoc_tfhe_tpu.core.lwe import LweKey, lwe_phase
    ext_key = LweKey(s=key.key.reshape(-1))
    assert int(lwe_phase(ext, ext_key)) == 1 << 29
    ext3 = tlwe.tlwe_extract_lwe_sample(ct, index=3)
    assert int(lwe_phase(ext3, ext_key)) == 777


def test_extract_on_encrypted():
    key = tlwe.tlwe_key_gen(jax.random.key(0), TL)
    z = tlwe.tlwe_sym_encrypt_zero(jax.random.key(1), 0.0, key, ())
    mu = np.zeros(TL.N, np.int32)
    mu[0] = 12345678
    ct = tlwe.TLweCiphertext(a=(z.a + tlwe.tlwe_noiseless_trivial(jnp.asarray(mu), TL.k).a
                                ).astype(jnp.int32),
                             current_variance=z.current_variance)
    from eoc_tfhe_tpu.core.lwe import LweKey, lwe_phase
    ext = tlwe.tlwe_extract_lwe_sample(ct, index=0)
    assert int(lwe_phase(ext, LweKey(s=key.key.reshape(-1)))) == 12345678


def test_tgsw_extern_mul_scales_message():
    """TGSW(m) external-product TLwe_trivial(mu) ~ TLwe(m * mu)."""
    key = tlwe.tlwe_key_gen(jax.random.key(0), TL)
    m = 3
    tg_ct = tgsw.tgsw_sym_encrypt_int(jax.random.key(1), jnp.int32(m), 1e-9, key, TG)
    mu = np.zeros(TL.N, np.int32)
    mu[0] = 1 << 26
    acc = tlwe.tlwe_noiseless_trivial(jnp.broadcast_to(jnp.asarray(mu), (2, TL.N)), TL.k)
    out = tgsw.tgsw_extern_mul(acc, tg_ct.rows, TG)
    phase = np.asarray(tlwe.tlwe_phase(out, key)).astype(np.int64)
    want = np.zeros(TL.N, np.int64)
    want[0] = m * (1 << 26)
    err = ((phase - want + 2**31) % 2**32) - 2**31
    # error budget: decomposition truncation + key noise, far below 2^22
    assert np.abs(err).max() < 2**22, np.abs(err).max()


def test_tgsw_cmux_selects():
    """CMux semantics via extern mul: acc + TGSW(b) * (d) with b in {0,1}."""
    key = tlwe.tlwe_key_gen(jax.random.key(0), TL)
    for bit in (0, 1):
        tg_ct = tgsw.tgsw_sym_encrypt_int(jax.random.key(2), jnp.int32(bit), 1e-9, key, TG)
        mu = np.zeros(TL.N, np.int32)
        mu[0] = 1 << 28
        d = tlwe.tlwe_noiseless_trivial(jnp.asarray(mu)[None], TL.k)
        out = tgsw.tgsw_extern_mul(d, tg_ct.rows, TG)
        phase = np.asarray(tlwe.tlwe_phase(out, key)).astype(np.int64)[0, 0]
        want = bit * (1 << 28)
        err = ((phase - want + 2**31) % 2**32) - 2**31
        assert abs(err) < 2**22, (bit, err)
