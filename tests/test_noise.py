"""Noise accounting: predicted vs empirical phase variance (VERDICT r2 #6).

The reference carries ``current_variance`` per sample but its FFT path keeps
it only loosely; this framework's bookkeeping (``bootstrap_woKS`` blind-rotate
recurrence + per-nonzero-digit keyswitch counting) is checked here against
measured phase error over >= 10^4 bootstraps at test parameters, and the
static gate-boundary budget rail is exercised both ways.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eoc_tfhe_tpu.core import bootstrap, gates, keys
from eoc_tfhe_tpu.core import params as params_mod
from eoc_tfhe_tpu.core.lwe import lwe_phase
from eoc_tfhe_tpu.core.numeric import t32_to_double


def _params():
    # Default toy noise: tracked terms (~2e-5 phase stdev) sit far above the
    # Torus32 quantization floor (2^-32), far below the gate budget rail.
    return params_mod.test_params(n=16, N=64, k=1, l=3, Bgbit=7)


@pytest.fixture(scope="module")
def setup():
    p = _params()
    ks = keys.new_random_gate_bootstrapping_secret_keyset(jax.random.key(0), p)
    ek = bootstrap.prepare_eval_key(ks.cloud)
    return p, ks, ek


def test_empirical_vs_predicted_bootstrap_variance(setup):
    """>= 10^4 full gate bootstraps; the measured phase variance must match
    the prediction within [1/4, 4] (per-key noise realizations + worst-case
    vs average-case slack)."""
    p, ks, ek = setup
    B = 10_240
    rng = np.random.default_rng(3)
    bits_a = jnp.asarray(rng.integers(0, 2, B).astype(bool))
    bits_b = jnp.asarray(rng.integers(0, 2, B).astype(bool))
    ca = gates.encrypt_bit(jax.random.key(1), bits_a, ks.lwe_key, p)
    cb = gates.encrypt_bit(jax.random.key(2), bits_b, ks.lwe_key, p)
    out = gates.nand(ca, cb, ek, p)

    # Exact phase error: phase - mu, as centered double on the torus.
    want_mu = np.where(~(np.asarray(bits_a) & np.asarray(bits_b)),
                       gates.MU_BOOL, -gates.MU_BOOL).astype(np.int32)
    phase = np.asarray(lwe_phase(out, ks.lwe_key))
    err = t32_to_double((phase - want_mu).astype(np.int32))
    measured = float(np.mean(err ** 2))

    predicted = bootstrap.predicted_bootstrap_variance(p)
    tracked = float(np.asarray(out.current_variance)[0])
    assert measured == pytest.approx(predicted, rel=3.0), (measured, predicted)
    assert 0.25 * predicted <= measured <= 4.0 * predicted
    # The per-sample tracked variance stays within the same factor of truth.
    assert 0.2 * measured <= tracked <= 5.0 * measured


def test_keyswitch_variance_counts_nonzero_digits(setup):
    p, ks, ek = setup
    B = 64
    rng = np.random.default_rng(4)
    bits = jnp.asarray(rng.integers(0, 2, B).astype(bool))
    ca = gates.encrypt_bit(jax.random.key(5), bits, ks.lwe_key, p)
    cb = gates.encrypt_bit(jax.random.key(6), bits, ks.lwe_key, p)
    out = gates.nand(ca, cb, ek, p)
    n_in = p.N * p.k
    var = np.asarray(out.current_variance)
    woks = bootstrap.predicted_bootstrap_variance(p, with_keyswitch=False)
    ks_var = float(p.in_out_params.alpha_min) ** 2
    round_var = n_in * 2.0 ** (-2 * p.ks.t * p.ks.basebit) / 24.0
    # nnz <= n_in * t, and the digits are essentially uniform so well over 0.
    upper = woks + round_var + n_in * p.ks.t * ks_var * (1 + 1e-6)
    assert np.all(var <= upper)
    assert np.all(var >= woks + round_var + 0.3 * n_in * p.ks.t * ks_var)
    # the full prediction uses the nnz = n_in*t worst case
    assert bootstrap.predicted_bootstrap_variance(p) >= float(var.max())


def test_gate_budget_rail_raises_on_bad_params():
    bad = params_mod.test_params(n=16, N=64, k=1, l=3, Bgbit=7,
                                 ks_stdev=0.02, bk_stdev=1e-9)
    with pytest.raises(ValueError, match="noise budget"):
        gates.check_noise_budget(bad, 2, 2)


def test_gate_budget_rail_passes_default_sets():
    for p in (params_mod.default_128bit_params(),
              params_mod.default_80bit_params()):
        # All shipped gate coefficient pairs, including XOR's (2, 2).
        for sa, sb in ((1, 1), (1, -1), (2, 2)):
            gates.check_noise_budget(p, sa, sb)


def test_rounded_key_noise_accounted(setup):
    """Empirical validation of the COHERENT rounding-noise model (r5): a
    FORCED rounded-key plan's measured phase error stays within the
    predicted budget.  (The automatic plan selection now rejects rounded
    plans everywhere the coherent model says they are unsafe — including
    these toy params — so the test builds the rounded context explicitly.)"""
    import jax.numpy as _jnp
    from eoc_tfhe_tpu.ops import ntt as ntt_mod
    p, ks, _ = setup
    tg = p.tgsw_params
    rb = ntt_mod.choose_round_bits(tg.kpl, tg.tlwe_params.N, tg.halfBg,
                                   ntt_mod.DEFAULT_PRIMES, limbs=2)
    assert rb > 0
    ctx = ntt_mod.make_context(N=tg.tlwe_params.N, J=tg.kpl,
                               halfBg=tg.halfBg, key_round_bits=rb)
    ek = bootstrap.prepare_eval_key(ks.cloud)
    key_np = ntt_mod.prepare_key_ntt_np(np.asarray(ek.bk_rows), ctx,
                                        variance=float(ek.bk_variance))
    ek.bk_ntt = key_np
    ek.ntt_ctx = ctx
    ek.form = "ntt_scan"
    B = 10_240
    rng = np.random.default_rng(11)
    bits_a = jnp.asarray(rng.integers(0, 2, B).astype(bool))
    bits_b = jnp.asarray(rng.integers(0, 2, B).astype(bool))
    ca = gates.encrypt_bit(jax.random.key(5), bits_a, ks.lwe_key, p)
    cb = gates.encrypt_bit(jax.random.key(6), bits_b, ks.lwe_key, p)
    out = gates.nand(ca, cb, ek, p)

    want_mu = np.where(~(np.asarray(bits_a) & np.asarray(bits_b)),
                       gates.MU_BOOL, -gates.MU_BOOL).astype(np.int32)
    phase = np.asarray(lwe_phase(out, ks.lwe_key))
    err = t32_to_double((phase - want_mu).astype(np.int32))
    measured = float(np.mean(err ** 2))

    predicted = bootstrap.predicted_bootstrap_variance(p, key_round_bits=rb)
    assert measured <= 4.0 * predicted, (measured, predicted)
    # the rounding term is real noise: prediction without it must not
    # overshoot the measurement the same way (sanity that the term matters
    # at these parameters, where it's chosen comparable to inherent noise)
    assert predicted > bootstrap.predicted_bootstrap_variance(p)

    # production 128-bit set: rounded=True now auto-falls-back to the
    # EXACT plan (coherent model, r5) and keeps >= 10 sigma of 1/16 margin
    p128 = params_mod.default_128bit_params()
    from eoc_tfhe_tpu.ops import pallas_ntt_blindrot2 as pnb2
    ctx128 = pnb2.kernel_context_for_params(p128, rounded=True)
    assert ctx128.key_round_bits == 0
    var128 = bootstrap.predicted_bootstrap_variance(p128)
    assert (1.0 / 16.0) / var128 ** 0.5 >= 10.0


def test_kernel_plan_sigma_margins_both_sets():
    """Plan selection under the COHERENT rounding-noise model (r5 on-chip
    finding, ROOFLINE.md "rounded plan retraction"): at BOTH production
    sets every sub-exact plan is rejected — the fixed-per-key rounding
    error accumulates ~coherently over the n steps (measured 128-bit:
    output std 2.98e-2 for the old rb=8 plan vs 3.3e-3 exact; circuits
    flipped bits at ~3e-3/gate) — and the automatic EXACT plans keep
    >= 10 sigma of the 1/16 gate margin."""
    import math
    from eoc_tfhe_tpu.ops import ntt
    from eoc_tfhe_tpu.ops.pallas_ntt_blindrot2 import KERNEL_PRIMES
    for p in (params_mod.default_128bit_params(),
              params_mod.default_80bit_params()):
        tg = p.tgsw_params
        rb = ntt.choose_rounded_plan(
            tg.kpl, tg.tlwe_params.N, tg.halfBg, n_steps=p.n,
            bk_variance=float(tg.tlwe_params.alpha_min) ** 2,
            primes=KERNEL_PRIMES)
        assert rb == 0, (p, rb)   # coherent model demotes every rounded plan
        var = bootstrap.predicted_bootstrap_variance(p)
        sigma = (1.0 / 16.0) / math.sqrt(var)
        assert sigma >= 10.0, (p, sigma)
    # and the coherent model itself predicts the old 128-bit rb=8 plan's
    # flakiness: its sigma margin collapses far below 10
    p128 = params_mod.default_128bit_params()
    var_r = bootstrap.predicted_bootstrap_variance(p128, key_round_bits=8)
    assert (1.0 / 16.0) / math.sqrt(var_r) < 3.0
