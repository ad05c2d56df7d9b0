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


# ---------------------------------------------------------------------------
# v4 rounded-key plan (VERDICT r3 item 1): key rounded to its top 32-rb bits
# so a 2-limb split meets the CRT bound — the reference's own f64-FFT noise
# trade (/root/reference/build.sh:54-57).  The NTT stays exact on the rounded
# key, so kernel and scan paths remain bit-exact against each other.
# ---------------------------------------------------------------------------

def test_rounded_plan_selection():
    """Plan selection under the r5 COHERENT rounding-noise model: the
    capacity chooser still finds the sub-exact splits (2x12b rb=8 at
    128-bit), but the noise-gated selector now DEMOTES them — rounded=True
    resolves to the exact plans at both production sets (the r4 2-limb
    plan measured ~10x its accounted sigma on chip; ROOFLINE.md
    "rounded plan retraction")."""
    from eoc_tfhe_tpu.ops import pallas_ntt_blindrot2 as pnb2
    p128 = params_mod.default_128bit_params()
    # capacity-only: the (demoted) 2-limb plan needs rb=8
    assert ntt.choose_round_bits(p128.tgsw_params.kpl, 1024,
                                 p128.tgsw_params.halfBg,
                                 pnb2.KERNEL_PRIMES, limbs=2) == 8
    ctx = pnb2.kernel_context_for_params(p128, rounded=True)
    assert (ctx.key_limbs, ctx.key_limb_bits, ctx.key_round_bits) == (3, 11, 0)
    p80 = params_mod.default_80bit_params()
    ctx80 = ntt.context_for_params(p80, rounded=True)
    assert ctx80.key_round_bits == 0
    # and the coherent model's reason: the demoted plan's rounding noise
    # dwarfs the inherent term
    inherent = bootstrap.predicted_bootstrap_variance(
        p128, with_keyswitch=False)
    with_round = bootstrap.predicted_bootstrap_variance(
        p128, with_keyswitch=False, key_round_bits=8)
    assert with_round - inherent > 2.0 * inherent


def _forced_rounded_scan_ek(keyset, p, primes=None, limbs=2):
    """Rounded-plan eval key built EXPLICITLY (the automatic selector now
    demotes rounded plans, r5): capacity-only rb, scan form."""
    primes = primes or ntt.DEFAULT_PRIMES
    tg = p.tgsw_params
    rb = ntt.choose_round_bits(tg.kpl, tg.tlwe_params.N, tg.halfBg, primes,
                               limbs=limbs)
    assert rb > 0
    ctx = ntt.make_context(N=tg.tlwe_params.N, J=tg.kpl, halfBg=tg.halfBg,
                           primes=primes, key_round_bits=rb)
    ek = bootstrap.prepare_eval_key(keyset.cloud)
    ek.bk_ntt = ntt.prepare_key_ntt_np(np.asarray(ek.bk_rows), ctx,
                                       variance=float(ek.bk_variance))
    ek.ntt_ctx = ctx
    ek.form = "ntt_scan"
    return ek


def test_rounded_kernel_bit_exact_vs_scan(keyset):
    """The rounded-plan KERNEL math stays bit-exact vs the scan path
    (forced context — the plan itself is demoted from automatic selection
    but the arithmetic is still exercised)."""
    p = toy_params()
    tl = p.tgsw_params.tlwe_params
    N, k, n, B = tl.N, tl.k, p.n, 8
    ek = _forced_rounded_scan_ek(keyset, p)
    ctx = ek.ntt_ctx
    assert ctx.key_round_bits > 0 and ctx.key_limbs == 2

    r = np.random.default_rng(5)
    acc0 = jnp.asarray(r.integers(-2**31, 2**31, (B, k + 1, N),
                                  dtype=np.int64).astype(np.int32))
    bara = jnp.asarray(r.integers(0, 2 * N, (n, B), dtype=np.int64)
                       .astype(np.int32))
    ref = np.asarray(ntt.blind_rotate_ntt(acc0, bara, ek.bk_ntt, p, ctx))
    T8k = pnb.prepare_kernel_key(ek.bk_ntt, ctx)
    out = np.asarray(pnb.blind_rotate_ntt_pallas(acc0, bara, T8k, ctx, p,
                                                 block_b=B, interpret=True))
    np.testing.assert_array_equal(ref, out)


def test_rounded_external_product_matches_rounded_key_convolution(keyset):
    """The rounded-plan NTT external product equals the *direct* negacyclic
    convolution of the digits with the ROUNDED key mod 2^32 — i.e. the only
    approximation is the key rounding itself, which the variance bookkeeping
    accounts for (bootstrap_woKS)."""
    p = toy_params()
    tg = p.tgsw_params
    rb = ntt.choose_round_bits(tg.kpl, tg.tlwe_params.N, tg.halfBg,
                               ntt.DEFAULT_PRIMES, limbs=2)
    ctx = ntt.make_context(N=tg.tlwe_params.N, J=tg.kpl, halfBg=tg.halfBg,
                           key_round_bits=rb)
    r = np.random.default_rng(7)
    J, U, N = tg.kpl, tg.tlwe_params.k + 1, tg.tlwe_params.N
    bk = r.integers(-2**31, 2**31, (1, J, U, N), dtype=np.int64).astype(np.int32)
    key = ntt.prepare_key_ntt_np(bk, ctx)
    digits = r.integers(-tg.halfBg, tg.halfBg, (3, J, N),
                        dtype=np.int64).astype(np.int32)
    out = np.asarray(ntt.external_product_ntt(jnp.asarray(digits),
                                              key.T8[0], ctx))

    bk_rounded = np.asarray(ntt.round_key(bk.astype(np.int64), rb)) << rb
    ref = np.zeros((3, U, N), np.int64)
    idx = np.arange(N)
    for b in range(3):
        for u in range(U):
            for j in range(J):
                for i in range(N):
                    contrib = digits[b, j, i] * bk_rounded[0, j, u]
                    wrapped = np.roll(contrib, i)
                    wrapped[:i] *= -1
                    ref[b, u] += wrapped
    np.testing.assert_array_equal(ref.astype(np.int32), out)


def test_rounded_gate_decrypts_correctly(keyset):
    p = toy_params()
    B = 16
    r = np.random.default_rng(9)
    a = jnp.asarray(r.integers(0, 2, B).astype(bool))
    b = jnp.asarray(r.integers(0, 2, B).astype(bool))
    ca = gates.encrypt_bit(jax.random.key(3), a, keyset.lwe_key, p)
    cb = gates.encrypt_bit(jax.random.key(4), b, keyset.lwe_key, p)
    ek = _forced_rounded_scan_ek(keyset, p)
    out = gates.nand(ca, cb, ek, p)
    got = gates.decrypt_bit(out, keyset.lwe_key)
    np.testing.assert_array_equal(np.asarray(got),
                                  ~(np.asarray(a) & np.asarray(b)))
    # tracked variance includes the key-rounding term
    base = bootstrap.prepare_eval_key_ntt(keyset.cloud, p, kernel=False)
    out0 = gates.nand(ca, cb, base, p)
    assert float(out.current_variance[0]) > float(out0.current_variance[0])


def test_kernel_key_to_scan_roundtrip(keyset):
    """kernel_key_to_scan inverts prepare_kernel_key + pad_kernel_key."""
    from eoc_tfhe_tpu.ops import pallas_ntt_blindrot2 as pnb2
    p = toy_params()
    ek = bootstrap.prepare_eval_key_ntt(keyset.cloud, p, kernel=False)
    T8k = pnb2.pad_kernel_key(pnb.prepare_kernel_key(ek.bk_ntt, ek.ntt_ctx))
    back = pnb.kernel_key_to_scan(T8k, ek.ntt_ctx, U=2)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(ek.bk_ntt.T8))


def test_small_batch_cutover(keyset):
    """B < SMALL_BATCH_CUTOVER routes through the scan path when the
    kernel-form key carries the derived scan form — same bits either way."""
    p = toy_params()
    ek = bootstrap.prepare_eval_key_ntt(keyset.cloud, p, kernel=True,
                                        small_batch=True)
    assert ek.bk_ntt_kernel is not None and ek.bk_ntt is not None
    ek_scan = bootstrap.prepare_eval_key_ntt(keyset.cloud, p, kernel=False)
    r = np.random.default_rng(13)
    B = 2
    assert B < bootstrap.SMALL_BATCH_CUTOVER
    a = jnp.asarray(r.integers(0, 2, B).astype(bool))
    b = jnp.asarray(r.integers(0, 2, B).astype(bool))
    ca = gates.encrypt_bit(jax.random.key(7), a, keyset.lwe_key, p)
    cb = gates.encrypt_bit(jax.random.key(8), b, keyset.lwe_key, p)
    out = gates.nand(ca, cb, ek, p)
    ref = gates.nand(ca, cb, ek_scan, p)
    np.testing.assert_array_equal(np.asarray(out.a), np.asarray(ref.a))
    np.testing.assert_array_equal(np.asarray(out.b), np.asarray(ref.b))


def test_wide_gadget_base_kernel_digit_split():
    """80-bit-style parameters (Bg=2^10: |digit| <= 512 exceeds int8) run
    the fused kernel via its 2-limb digit split (r5; the r4 kernel silently
    truncated these digits and decrypted WRONG, then was locked out).
    Kernel and scan paths must agree BIT-EXACTLY on the accumulator and the
    gate output despite using different prime plans (both exact mod 2^32)."""
    from eoc_tfhe_tpu.ops import pallas_ntt_blindrot2 as p2
    p = params_mod.test_params(n=8, N=64, k=1, l=2, Bgbit=10)
    assert p.tgsw_params.halfBg == 512
    ks = keys.new_random_gate_bootstrapping_secret_keyset(jax.random.key(1), p)
    ek_k = bootstrap.prepare_eval_key_ntt(ks.cloud, p, kernel=True)
    assert ek_k.form == "ntt_kernel" and ek_k.bk_ntt_kernel is not None
    ek_s = bootstrap.prepare_eval_key_ntt(ks.cloud, p, kernel=False)

    tl = p.tgsw_params.tlwe_params
    r = np.random.default_rng(3)
    B = 8
    acc0 = jnp.asarray(r.integers(-2**31, 2**31, (B, tl.k + 1, tl.N),
                                  dtype=np.int64).astype(np.int32))
    bara = jnp.asarray(r.integers(0, 2 * tl.N, (p.n, B), dtype=np.int64)
                       .astype(np.int32))
    ref = np.asarray(ntt.blind_rotate_ntt(acc0, bara, ek_s.bk_ntt, p,
                                          ek_s.ntt_ctx))
    out = np.asarray(p2.blind_rotate_ntt_pallas2(
        acc0, bara, ek_k.bk_ntt_kernel, ek_k.ntt_ctx, p, block_b=B,
        interpret=True, expanded=False))
    np.testing.assert_array_equal(ref, out)

    # gate level through the kernel path decrypts correctly
    a = jnp.asarray(r.integers(0, 2, B).astype(bool))
    b = jnp.asarray(r.integers(0, 2, B).astype(bool))
    ca = gates.encrypt_bit(jax.random.key(2), a, ks.lwe_key, p)
    cb = gates.encrypt_bit(jax.random.key(3), b, ks.lwe_key, p)
    out_k = gates.nand(ca, cb, ek_k, p)
    out_s = gates.nand(ca, cb, ek_s, p)
    np.testing.assert_array_equal(np.asarray(out_k.a), np.asarray(out_s.a))
    np.testing.assert_array_equal(np.asarray(out_k.b), np.asarray(out_s.b))
    np.testing.assert_array_equal(
        np.asarray(gates.decrypt_bit(out_k, ks.lwe_key)),
        ~(np.asarray(a) & np.asarray(b)))


def test_expanded_kernel_key_bit_exact(keyset):
    """The 2-limb plans store the expanded [A; 256A mod p] kernel key
    (pointwise runs over 2K rows, no quadrant lanes); results stay bit-exact
    vs the scan path, and the derived scan form still works (its row slice
    is the A block)."""
    from eoc_tfhe_tpu.ops import pallas_ntt_blindrot2 as p2
    p = toy_params()
    tg = p.tgsw_params
    tl = tg.tlwe_params
    # forced 2-limb rounded KERNEL context (the expand path only exists for
    # 2-limb plans, which the automatic selector now demotes — r5)
    rb = ntt.choose_round_bits(tg.kpl, tl.N, tg.halfBg, p2.KERNEL_PRIMES,
                               limbs=2)
    ctx = p2.kernel_context(N=tl.N, J=tg.kpl, halfBg=tg.halfBg,
                            key_round_bits=rb)
    assert ctx.key_limbs == 2
    bk_rows = np.asarray(keyset.cloud.bk.bk)
    scan_key = ntt.prepare_key_ntt_np(bk_rows, ctx)
    T8k = p2.pad_kernel_key(pnb.prepare_kernel_key(scan_key, ctx))
    T8x = np.asarray(p2.expand_kernel_key_256(jnp.asarray(T8k), ctx, p))
    K = ctx.J * ctx.R
    assert T8x.shape[3] == 2 * K                  # expanded rows [A; B]

    r = np.random.default_rng(17)
    B = 8
    acc0 = jnp.asarray(r.integers(-2**31, 2**31, (B, tl.k + 1, tl.N),
                                  dtype=np.int64).astype(np.int32))
    bara = jnp.asarray(r.integers(0, 2 * tl.N, (p.n, B), dtype=np.int64)
                       .astype(np.int32))
    ref = np.asarray(ntt.blind_rotate_ntt(acc0, bara, scan_key, p, ctx))
    out = np.asarray(p2.blind_rotate_ntt_pallas2(
        acc0, bara, jnp.asarray(T8x), ctx, p, block_b=B, interpret=True,
        expanded=True))
    np.testing.assert_array_equal(ref, out)
    # the A block of the expanded key is the original rows, so the derived
    # scan form keeps working
    back = pnb.kernel_key_to_scan(jnp.asarray(T8x), ctx, U=tl.k + 1)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(scan_key.T8))
