"""On-chip noise validation at PRODUCTION parameters (TPU-only).

The r5 retraction (ROOFLINE.md "ROUND-5 RETRACTION") was caught by exactly
this measurement: the rounded plan's real output-phase error on the chip was
~10x its accounted sigma — invisible to the CPU suite, which runs toy
parameters where the coherent accumulation factor is small, and invisible to
the bench's decrypt check, which tolerates anything under the margin.  This
test pins the model-vs-chip agreement permanently at the production set.

Skipped off-TPU (the CPU farm would need hours at 128-bit batch sizes); the
suite conftest forces the CPU farm, so run with
``EOC_TESTS_TPU=1 python -m pytest tests/test_tpu_noise.py -q``
(r5 on-chip run: 2 passed in 111 s).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eoc_tfhe_tpu.core import bootstrap, gates, keys
from eoc_tfhe_tpu.core.lwe import lwe_phase
from eoc_tfhe_tpu.core.numeric import t32_to_double
from eoc_tfhe_tpu.core.params import default_128bit_params

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="on-chip noise validation needs the real TPU (production params)")


def _keyset(params):
    cache = os.environ.get("EOC_KEY_CACHE", "/root/.eoc_key_cache")
    path = os.path.join(cache, "keyset-128-seed0.bin")
    if os.path.exists(path):
        from eoc_tfhe_tpu.io import tfhe_io
        with open(path, "rb") as f:
            ks, _ = tfhe_io.import_secret_keyset(f.read())
        return ks
    return keys.new_random_gate_bootstrapping_secret_keyset(
        jax.random.key(0), params)


def test_output_phase_error_within_model_128bit():
    """Measured NAND output-phase variance at the 128-bit set stays within
    [predicted/16, 4x predicted] of the worst-case model — an on-chip seal
    against BOTH under-accounting (the retraction class: realized noise
    above the model breaks circuits silently) and gross over-accounting
    (a model drifting conservative by >16x in variance would start
    demoting safe plans)."""
    params = default_128bit_params()
    ks = _keyset(params)
    ek = bootstrap.prepare_eval_key_ntt(ks.cloud, params)
    assert ek.ntt_ctx.key_round_bits == 0   # exact plan is the default
    B = 4096
    rng = np.random.default_rng(0)
    a = rng.integers(0, 2, B).astype(bool)
    b = rng.integers(0, 2, B).astype(bool)
    ca = gates.encrypt_bit(jax.random.key(1), jnp.asarray(a), ks.lwe_key,
                           params)
    cb = gates.encrypt_bit(jax.random.key(2), jnp.asarray(b), ks.lwe_key,
                           params)
    out = jax.jit(lambda x, y, e: gates.nand(x, y, e, params))(ca, cb, ek)
    want = ~(a & b)
    mu = np.where(want, gates.MU_BOOL, -gates.MU_BOOL).astype(np.int32)
    phase = np.asarray(lwe_phase(out, ks.lwe_key))
    err = t32_to_double((phase - mu).astype(np.int32))
    measured = float(np.mean(err ** 2))
    predicted = bootstrap.predicted_bootstrap_variance(params)
    assert measured <= 4.0 * predicted, (measured, predicted)
    assert measured >= predicted / 16.0, (measured, predicted)
    # and every bit decrypts (margin >= 10 sigma at the exact plan)
    np.testing.assert_array_equal(
        np.asarray(gates.decrypt_bit(out, ks.lwe_key)), want)


@pytest.mark.parametrize("mode", ["fast", "classic"])
def test_circuit_chain_correct_on_chip(mode):
    """Gates consuming BOOTSTRAP OUTPUTS (the pattern that broke under the
    retracted plan: xor-on-mux carry chains; since r5 also the default
    MAJ-chain fast adder) decrypt correctly at scale on the real chip."""
    params = default_128bit_params()
    ks = _keyset(params)
    ek = bootstrap.prepare_eval_key_ntt(ks.cloud, params)
    from eoc_tfhe_tpu.circuits import adder
    B = 256
    rng = np.random.default_rng(3)
    va = rng.integers(0, 256, B)
    vb = rng.integers(0, 256, B)
    bits_a = np.stack([(va >> i) & 1 for i in range(8)]).astype(bool)
    bits_b = np.stack([(vb >> i) & 1 for i in range(8)]).astype(bool)
    ca = gates.encrypt_bit(jax.random.key(4), jnp.asarray(bits_a),
                           ks.lwe_key, params)
    cb = gates.encrypt_bit(jax.random.key(5), jnp.asarray(bits_b),
                           ks.lwe_key, params)
    s, _ = jax.jit(lambda x, y, e: adder.ripple_carry_add(
        x, y, e, params, mode=mode))(ca, cb, ek)
    bits = np.asarray(gates.decrypt_bit(s, ks.lwe_key))
    got = np.array([sum(int(bits[i, j]) << i for i in range(8))
                    for j in range(B)])
    np.testing.assert_array_equal(got, (va + vb) % 256)


def test_multiplier_correct_on_chip():
    """The bootstrapped 8x8 multiplier at production params on the real
    chip: deep MAJ-chain + per-row refresh composition (the deepest
    circuit in the repo) decrypts exactly."""
    params = default_128bit_params()
    ks = _keyset(params)
    ek = bootstrap.prepare_eval_key_ntt(ks.cloud, params)
    from eoc_tfhe_tpu.circuits.adder import ripple_mul
    B = 64
    rng = np.random.default_rng(9)
    va = rng.integers(0, 256, B)
    vb = rng.integers(0, 256, B)
    bits = lambda v: jnp.asarray(
        ((v[None, :] >> np.arange(8)[:, None]) & 1).astype(bool))
    ca = gates.encrypt_bit(jax.random.key(8), bits(va), ks.lwe_key, params)
    cb = gates.encrypt_bit(jax.random.key(9), bits(vb), ks.lwe_key, params)
    p, _ = jax.jit(lambda x, y, e: ripple_mul(x, y, e, params))(ca, cb, ek)
    got = (np.asarray(gates.decrypt_bit(p, ks.lwe_key))
           * (1 << np.arange(8))[:, None]).sum(0)
    np.testing.assert_array_equal(got, (va * vb) % 256)
