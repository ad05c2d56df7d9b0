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
from eoc_tfhe_tpu.core.params import test_params as make_test_params


@pytest.fixture
def debug_nans():
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", False)


def test_gate_bootstrap_variance_path_nan_free(debug_nans):
    """Full NAND bootstrap (variance bookkeeping is the float path)."""
    p = make_test_params()
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


def test_oracle_fft_path_nan_free(debug_nans):
    """The independent f64 FFT oracle under jax_debug_nans + numpy strict."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    import oracle
    p = make_test_params()
    rng = np.random.default_rng(0)
    N = p.N
    a = rng.integers(-2**31, 2**31, N, dtype=np.int64).astype(np.int32)
    b = rng.integers(-64, 64, N).astype(np.int32)
    with np.errstate(all="raise"):
        out = oracle.LagrangeFFT(N).poly_mul(b, a)
    assert np.issubdtype(out.dtype, np.signedinteger)


def test_keyswitch_bf16_path_exact_and_finite(debug_nans):
    """The bf16 MXU keyswitch contraction is exact: compare against an int64
    numpy reference on the same digits/table (guards the bf16 exactness
    audit in ops/keyswitch.prepare_keyswitch_matmul)."""
    from eoc_tfhe_tpu.core.lwe import LweCiphertext
    from eoc_tfhe_tpu.ops import keyswitch as kw
    from eoc_tfhe_tpu.ops import polymul
    p = make_test_params()
    ks = keys.new_random_gate_bootstrapping_secret_keyset(jax.random.key(3), p)
    n_in = p.N * p.k
    rng = np.random.default_rng(1)
    B = 8
    a = rng.integers(-2**31, 2**31, (B, n_in), dtype=np.int64).astype(np.int32)
    b = rng.integers(-2**31, 2**31, B, dtype=np.int64).astype(np.int32)
    u = LweCiphertext(a=jnp.asarray(a), b=jnp.asarray(b),
                      current_variance=jnp.zeros(B, jnp.float32))
    prepared = kw.prepare_keyswitch_matmul(ks.cloud.bk.ks)
    out = kw.keyswitch_apply(u, ks.cloud.bk.ks, t=p.ks.t,
                             basebit=p.ks.basebit, prepared=prepared)
    # int64 reference: subtract the selected table rows per nonzero digit
    table = np.asarray(ks.cloud.bk.ks.ks)          # (n_in, t, base, n_out+1)
    digs = np.asarray(kw.keyswitch_digits(jnp.asarray(a), p.ks.t,
                                          p.ks.basebit))
    ref_a = np.zeros((B, p.n), np.int64)
    ref_b = b.astype(np.int64)
    for s in range(B):
        for i in range(n_in):
            for j in range(p.ks.t):
                d = int(digs[s, i, j])
                if d:
                    ref_a[s] -= table[i, j, d, :-1]
                    ref_b[s] -= table[i, j, d, -1]
    np.testing.assert_array_equal(np.asarray(out.a),
                                  (ref_a & 0xFFFFFFFF).astype(np.uint32)
                                  .astype(np.int32))
    np.testing.assert_array_equal(np.asarray(out.b),
                                  (ref_b & 0xFFFFFFFF).astype(np.uint32)
                                  .astype(np.int32))
