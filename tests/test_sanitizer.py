"""Sanitizer analog: jax_debug_nans over the framework's float paths.

The reference relies on single-threadedness instead of sanitizers (SURVEY.md
§5 — its wrapper has real memory bugs, e.g. the leak at
/root/reference/ao-tfhe/eoc-tfhe-run.cpp:322/328, that ASan would catch; the
JAX rewrite removes that class by construction).  The analog failure mode
here is NaN/Inf creeping into the *float* tiers: noise-variance tracking,
the f64 oracle, and the Llama model.  These tests run representative paths
under ``jax_debug_nans`` so any NaN raises instead of propagating.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eoc_tfhe_tpu.core import bootstrap, gates, keys
from eoc_tfhe_tpu.core.params import test_params


@pytest.fixture
def debug_nans():
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", False)


def test_gate_bootstrap_variance_path_nan_free(debug_nans):
    """Full NAND bootstrap (variance bookkeeping is the float path)."""
    p = test_params()
    ks = keys.new_random_gate_bootstrapping_secret_keyset(jax.random.key(0), p)
    ek = bootstrap.prepare_eval_key(ks.cloud)
    bits = jnp.asarray(np.array([True, False]))
    ca = gates.encrypt_bit(jax.random.key(1), bits, ks.lwe_key, p)
    cb = gates.encrypt_bit(jax.random.key(2), bits, ks.lwe_key, p)
    out = gates.nand(ca, cb, ek, p)
    v = np.asarray(out.current_variance)
    assert np.isfinite(v).all() and (v > 0).all()


def test_llama_forward_nan_free(debug_nans):
    from eoc_tfhe_tpu.models import llama

    cfg = llama.LlamaConfig(dim=16, n_layers=2, n_heads=2, n_kv_heads=2,
                            vocab_size=32, hidden_dim=32, max_seq_len=8)
    params = llama.init_params(jax.random.key(0), cfg)
    tokens = jnp.asarray(np.arange(6)[None, :] % cfg.vocab_size)
    logits = llama.forward(params, tokens, cfg)
    assert np.isfinite(np.asarray(logits, np.float32)).all()
