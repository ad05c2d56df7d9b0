"""Fused Pallas blind rotation (interpret mode) vs the XLA scan — bit-exact."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eoc_tfhe_tpu.core import keys, bootstrap, tgsw
from eoc_tfhe_tpu.core.params import test_params as make_test_params
from eoc_tfhe_tpu.core.numeric import mod_switch_from_torus32
from eoc_tfhe_tpu.ops import pallas_blindrot, polymul

P = make_test_params()  # N=64 -> C=min(128,64)=64, Q=1, P=1
P32 = make_test_params(N=128)  # C=128? chunk=32 to exercise Q>1 folding


@pytest.fixture(scope="module")
def keyset():
    return keys.new_random_gate_bootstrapping_secret_keyset(jax.random.key(9), P)


def test_compact_bk_layout():
    rng = np.random.default_rng(0)
    n, J, U, N = 3, P.tgsw_params.kpl, P.k + 1, P.N
    bk = rng.integers(-(2**31), 2**31, (n, J, U, N), dtype=np.int64).astype(np.int32)
    T = np.asarray(pallas_blindrot.prepare_compact_bk(jnp.asarray(bk)))
    L = polymul.LIMBS
    Jp = pallas_blindrot._padded_rows(J)
    assert T.shape == (n, U * L * Jp, N)
    assert T.dtype == np.int8
    limbs = np.asarray(polymul.decompose_signed_limbs(jnp.asarray(bk)))  # (n,J,U,N,L)
    for (i, j, u, l) in [(0, 0, 0, 0), (1, 3, 1, 2), (2, 1, 1, 3)]:
        np.testing.assert_array_equal(T[i, (u * L + l) * Jp + j],
                                      limbs[i, j, u, :, l])
    # Padding rows are zero; limb recombination is exact mod 2^32.
    assert not T[0, (1 * L + 2) * Jp + J:(1 * L + 3) * Jp].any()
    recon = sum(T[1, (0 * L + l) * Jp + 2].astype(np.int64) << (8 * l)
                for l in range(L))
    np.testing.assert_array_equal(recon.astype(np.int32), bk[1, 2, 0])


@pytest.mark.parametrize("chunk", [64, 32, 16])
def test_pallas_blindrot_matches_scan(keyset, chunk):
    B, N, n = 4, P.N, P.n
    rng = np.random.default_rng(1)
    acc0 = rng.integers(-(2**31), 2**31, (B, P.k + 1, N), dtype=np.int64).astype(np.int32)
    bara = rng.integers(0, 2 * N, (B, n)).astype(np.int32)

    want = np.asarray(bootstrap.blind_rotate(
        jnp.asarray(acc0), jnp.asarray(bara), keyset.cloud.bk.bk, P,
        rotation_impl="gather"))

    bk_c = pallas_blindrot.prepare_compact_bk(keyset.cloud.bk.bk)
    got = np.asarray(pallas_blindrot.blind_rotate_pallas(
        jnp.asarray(acc0), jnp.asarray(bara.T), bk_c, P, chunk=chunk,
        interpret=True))
    np.testing.assert_array_equal(got, want)


def test_pallas_bootstrap_end_to_end(keyset):
    """Full bootstrap with the Pallas rotate path decrypts correctly."""
    from eoc_tfhe_tpu.core import lwe, gates
    from eoc_tfhe_tpu.core.tlwe import TLweCiphertext, tlwe_noiseless_trivial, tlwe_extract_lwe_sample
    from eoc_tfhe_tpu.ops import rotate
    from eoc_tfhe_tpu.ops.keyswitch import keyswitch_apply

    sk = keyset.lwe_key
    signs = np.array([1, -1, -1, 1])
    mus = (signs * (1 << 29)).astype(np.int32)
    ct = lwe.lwe_sym_encrypt(jax.random.key(10), jnp.asarray(mus),
                             P.in_out_params.alpha_min, sk)
    N, Nx2 = P.N, 2 * P.N
    barb = mod_switch_from_torus32(ct.b, Nx2)
    bara = mod_switch_from_torus32(ct.a, Nx2)
    mu = jnp.int32(gates.MU_BOOL)
    testvect = jnp.broadcast_to(mu, ct.b.shape + (N,)).astype(jnp.int32)
    rot = rotate.mul_by_xai(testvect, (Nx2 - barb) % Nx2, impl="gather")
    acc0 = tlwe_noiseless_trivial(rot, P.k).a

    bk_c = pallas_blindrot.prepare_compact_bk(keyset.cloud.bk.bk)
    acc = pallas_blindrot.blind_rotate_pallas(acc0, jnp.moveaxis(bara, -1, 0),
                                              bk_c, P, chunk=32, interpret=True)
    tl_ct = TLweCiphertext(a=acc, current_variance=jnp.zeros(ct.b.shape, jnp.float32))
    u = tlwe_extract_lwe_sample(tl_ct)
    out = keyswitch_apply(u, keyset.cloud.bk.ks, t=P.ks.t, basebit=P.ks.basebit)
    phases = np.asarray(lwe.lwe_phase(out, sk)).astype(np.int64)
    want = signs * gates.MU_BOOL
    err = ((phases - want + 2**31) % 2**32) - 2**31
    assert np.abs(err).max() < 2**27


def test_pallas_blindrot_mosaic_compile():
    """Real Mosaic compile path (TPU-legal shapes: N=1024, C=128, B=8).

    Runs the compiled kernel (interpret=False) when a TPU is attached and
    checks bit-exactness vs the XLA scan path; skipped elsewhere.
    """
    if jax.default_backend() != "tpu":
        pytest.skip("needs a TPU for the Mosaic compile path")
    Pm = make_test_params(N=1024, n=6, l=2, Bgbit=8)
    ks = keys.new_random_gate_bootstrapping_secret_keyset(jax.random.key(12), Pm)
    B, N, n = 8, Pm.N, Pm.n
    rng = np.random.default_rng(3)
    acc0 = rng.integers(-(2**31), 2**31, (B, Pm.k + 1, N),
                        dtype=np.int64).astype(np.int32)
    bara = rng.integers(0, 2 * N, (n, B)).astype(np.int32)
    want = np.asarray(bootstrap.blind_rotate(
        jnp.asarray(acc0), jnp.asarray(bara.T), ks.cloud.bk.bk, Pm,
        rotation_impl="gather"))
    bk_c = pallas_blindrot.prepare_compact_bk(ks.cloud.bk.bk)
    got = np.asarray(pallas_blindrot.blind_rotate_pallas(
        jnp.asarray(acc0), jnp.asarray(bara), bk_c, Pm, interpret=False))
    np.testing.assert_array_equal(got, want)


def test_pallas_blindrot_fast_rounded_key(keyset):
    """limbs=3 fast form == exact blind rotation against the *rounded* key.

    The rounded-key path is not an approximation of the kernel — it is the
    exact mod-2^32 computation with a key whose coefficients were rounded
    to multiples of 2^8 (noise analysis in prepare_compact_bk's docstring).
    """
    B, N, n = 4, P.N, P.n
    rng = np.random.default_rng(7)
    acc0 = rng.integers(-(2**31), 2**31, (B, P.k + 1, N),
                        dtype=np.int64).astype(np.int32)
    bara = rng.integers(0, 2 * N, (B, n)).astype(np.int32)

    bk = keyset.cloud.bk.bk
    bk_rounded = (bk.astype(jnp.int32) + jnp.int32(128)) & jnp.int32(-256)
    want = np.asarray(bootstrap.blind_rotate(
        jnp.asarray(acc0), jnp.asarray(bara), bk_rounded, P,
        rotation_impl="gather"))

    bk_c = pallas_blindrot.prepare_compact_bk(bk, limbs=3)
    got = np.asarray(pallas_blindrot.blind_rotate_pallas(
        jnp.asarray(acc0), jnp.asarray(bara.T), bk_c, P, chunk=32,
        interpret=True))
    np.testing.assert_array_equal(got, want)
