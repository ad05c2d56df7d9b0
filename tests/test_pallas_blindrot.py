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


def test_chunked_bk_layout():
    rng = np.random.default_rng(0)
    n, J, U, N = 3, P.tgsw_params.kpl, P.k + 1, P.N
    bk = rng.integers(-(2**31), 2**31, (n, J, U, N), dtype=np.int64).astype(np.int32)
    C = 16
    T = np.asarray(pallas_blindrot.prepare_chunked_bk(jnp.asarray(bk), P, chunk=C))
    Q = N // C
    L = polymul.LIMBS
    assert T.shape == (n, Q, J * C, U * L * 2 * C)
    limbs = np.asarray(polymul.decompose_signed_limbs(jnp.asarray(bk)))  # (n,J,U,N,L)
    i, q, j, u, l = 1, 2, 3, 1, 2
    for r in [0, 5, C - 1]:
        for c in [0, 1, r, r + 3, C, 2 * C - 1]:
            want = 0
            if 0 <= c - r < C:
                want = limbs[i, j, u, q * C + (c - r), l]
            got = T[i, q, j * C + r, (u * L + l) * 2 * C + c]
            assert got == want, (r, c, got, want)


@pytest.mark.parametrize("chunk", [64, 32, 16])
def test_pallas_blindrot_matches_scan(keyset, chunk):
    B, N, n = 4, P.N, P.n
    rng = np.random.default_rng(1)
    acc0 = rng.integers(-(2**31), 2**31, (B, P.k + 1, N), dtype=np.int64).astype(np.int32)
    bara = rng.integers(0, 2 * N, (B, n)).astype(np.int32)

    want = np.asarray(bootstrap.blind_rotate(
        jnp.asarray(acc0), jnp.asarray(bara), keyset.cloud.bk.bk, P,
        rotation_impl="gather"))

    bk_ch = pallas_blindrot.prepare_chunked_bk(keyset.cloud.bk.bk, P, chunk=chunk)
    got = np.asarray(pallas_blindrot.blind_rotate_pallas(
        jnp.asarray(acc0), jnp.asarray(bara.T), bk_ch, P, chunk=chunk,
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

    bk_ch = pallas_blindrot.prepare_chunked_bk(keyset.cloud.bk.bk, P, chunk=32)
    acc = pallas_blindrot.blind_rotate_pallas(acc0, jnp.moveaxis(bara, -1, 0),
                                              bk_ch, P, chunk=32, interpret=True)
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
    bk_ch = pallas_blindrot.prepare_chunked_bk(ks.cloud.bk.bk, Pm)
    got = np.asarray(pallas_blindrot.blind_rotate_pallas(
        jnp.asarray(acc0), jnp.asarray(bara), bk_ch, Pm, interpret=False))
    np.testing.assert_array_equal(got, want)
