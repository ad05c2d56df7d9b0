"""Batching gate server: aggregation, correctness, flush policy, errors."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eoc_tfhe_tpu.core import bootstrap, gates, keys
from eoc_tfhe_tpu.core.params import test_params as make_test_params
from eoc_tfhe_tpu.serving import GateServer

P = make_test_params()


@pytest.fixture(scope="module")
def setup():
    ks = keys.new_random_gate_bootstrapping_secret_keyset(jax.random.key(3), P)
    ek = bootstrap.prepare_eval_key(ks.cloud)
    return ks, ek


def _enc(ks, bits, seed):
    return gates.encrypt_bit(jax.random.key(seed), jnp.asarray(bits),
                             ks.lwe_key, P)


def test_batched_correctness_and_aggregation(setup):
    ks, ek = setup
    rng = np.random.default_rng(0)
    n_req = 12
    a = rng.integers(0, 2, n_req).astype(bool)
    b = rng.integers(0, 2, n_req).astype(bool)
    ca = _enc(ks, a, 1)
    cb = _enc(ks, b, 2)

    with GateServer(ek, P, max_batch=16, max_delay_s=0.2) as srv:
        futs = [srv.submit("nand", jax.tree.map(lambda x: x[i], ca),
                           jax.tree.map(lambda x: x[i], cb))
                for i in range(n_req)]
        srv.flush()
        outs = [f.result(timeout=120) for f in futs]
    got = np.asarray([bool(gates.decrypt_bit(o, ks.lwe_key)) for o in outs])
    np.testing.assert_array_equal(got, ~(a & b))
    # aggregation actually happened: far fewer flushes than requests
    assert srv.stats["gates"] == n_req
    assert srv.stats["flushes"] <= 2


def test_mixed_kinds_and_delay_flush(setup):
    ks, ek = setup
    a = np.array([0, 1], bool)
    b = np.array([1, 1], bool)
    ca, cb = _enc(ks, a, 4), _enc(ks, b, 5)
    srv = GateServer(ek, P, max_batch=8, max_delay_s=0.01).start()
    try:
        f1 = srv.submit("xor_", jax.tree.map(lambda x: x[0], ca),
                        jax.tree.map(lambda x: x[0], cb))
        f2 = srv.submit("and_", jax.tree.map(lambda x: x[1], ca),
                        jax.tree.map(lambda x: x[1], cb))
        # delay-based flush (no explicit flush call): worker must drain both
        r1 = f1.result(timeout=180)
        r2 = f2.result(timeout=180)
    finally:
        srv.stop()
    assert bool(gates.decrypt_bit(r1, ks.lwe_key)) == (a[0] ^ b[0])
    assert bool(gates.decrypt_bit(r2, ks.lwe_key)) == (a[1] & b[1])


def test_seeded_requests_match_plain(setup):
    """Seeded (mask-compressed) uploads decrypt to the same gate outputs as
    plain ones, and expansion reproduces the encryption-time mask exactly."""
    from eoc_tfhe_tpu.core.lwe import SeededLweCiphertext, lwe_seeded_expand
    ks, ek = setup
    rng = np.random.default_rng(7)
    n_req = 6
    a = rng.integers(0, 2, n_req).astype(bool)
    b = rng.integers(0, 2, n_req).astype(bool)
    sca = gates.encrypt_bit_seeded(jax.random.key(11), jnp.asarray(a),
                                   ks.lwe_key, P)
    scb = gates.encrypt_bit_seeded(jax.random.key(12), jnp.asarray(b),
                                   ks.lwe_key, P)
    # expansion is bit-exact and decrypts correctly (the seed IS the mask)
    exp = lwe_seeded_expand(sca, P.n)
    np.testing.assert_array_equal(np.asarray(gates.decrypt_bit(exp, ks.lwe_key)), a)

    def row(ct, i):
        return SeededLweCiphertext(
            seed=np.asarray(ct.seed)[i], b=np.asarray(ct.b)[i],
            current_variance=np.asarray(ct.current_variance)[i])

    with GateServer(ek, P, max_batch=8, max_delay_s=0.2,
                    pipeline_chunk=4) as srv:   # exercise >1 chunk
        futs = [srv.submit("nand", row(sca, i), row(scb, i))
                for i in range(n_req)]
        srv.flush()
        outs = [f.result(timeout=120) for f in futs]
    got = np.asarray([bool(gates.decrypt_bit(o, ks.lwe_key)) for o in outs])
    np.testing.assert_array_equal(got, ~(a & b))
    # mixed representations in one submit are rejected
    ca = _enc(ks, a, 13)
    srv2 = GateServer(ek, P)
    with pytest.raises(ValueError, match="seeded"):
        srv2.submit("nand", row(sca, 0), jax.tree.map(lambda x: x[0], ca))
    srv2.stop()


def test_mux_three_operand_serving(setup):
    """bootsMUX through the server: submit("mux", c, a, b) — selector
    first — batches like the 2-input kinds and decrypts c ? a : b."""
    ks, ek = setup
    c = np.array([0, 1, 0, 1], bool)
    a = np.array([1, 1, 0, 0], bool)
    b = np.array([0, 0, 1, 1], bool)
    cc, ca, cb = _enc(ks, c, 21), _enc(ks, a, 22), _enc(ks, b, 23)

    def row(ct, i):
        return jax.tree.map(lambda x: x[i], ct)

    with GateServer(ek, P, max_batch=8, max_delay_s=0.2) as srv:
        futs = [srv.submit("mux", row(cc, i), row(ca, i), row(cb, i))
                for i in range(4)]
        srv.flush()
        outs = [f.result(timeout=180) for f in futs]
    got = np.asarray([bool(gates.decrypt_bit(o, ks.lwe_key)) for o in outs])
    np.testing.assert_array_equal(got, np.where(c, a, b))
    # arity validation
    srv2 = GateServer(ek, P)
    with pytest.raises(ValueError, match="three operands"):
        srv2.submit("mux", row(cc, 0), row(ca, 0))
    with pytest.raises(ValueError, match="two operands"):
        srv2.submit("nand", row(cc, 0), row(ca, 0), row(cb, 0))
    srv2.stop()


def test_uint8_circuit_serving(setup):
    """Whole bootstrapped 8-bit ops through the server: requests batch
    across clients and one flush runs the ripple circuit once for the
    stacked batch; seeded and plain uploads both work."""
    from eoc_tfhe_tpu.core.lwe import SeededLweCiphertext
    ks, ek = setup
    vals_a = [50, 200, 7]
    vals_b = [8, 57, 9]

    def enc_u8(v, seed, seeded=False):
        bits = np.array([(v >> i) & 1 for i in range(8)], bool)
        fn = gates.encrypt_bit_seeded if seeded else gates.encrypt_bit
        return fn(jax.random.key(seed), jnp.asarray(bits), ks.lwe_key, P)

    with GateServer(ek, P, max_batch=8, max_delay_s=0.3) as srv:
        futs = [srv.submit_uint8("add", enc_u8(a, 60 + i), enc_u8(b, 70 + i))
                for i, (a, b) in enumerate(zip(vals_a, vals_b))]
        futs += [srv.submit_uint8("sub", enc_u8(a, 80 + i, True),
                                  enc_u8(b, 90 + i, True))
                 for i, (a, b) in enumerate(zip(vals_a, vals_b))]
        futs += [srv.submit_uint8("mul", enc_u8(a, 110 + i), enc_u8(b, 120 + i))
                 for i, (a, b) in enumerate(zip(vals_a, vals_b))]
        srv.flush()
        outs = [f.result(timeout=300) for f in futs]

    def dec_u8(ct):
        bits = np.asarray(gates.decrypt_bit(ct, ks.lwe_key))
        return int(sum(int(b) << i for i, b in enumerate(bits)))

    got = [dec_u8(o) for o in outs]
    want = [(a + b) % 256 for a, b in zip(vals_a, vals_b)] + \
           [(a - b) % 256 for a, b in zip(vals_a, vals_b)] + \
           [(a * b) % 256 for a, b in zip(vals_a, vals_b)]
    assert got == want, (got, want)
    # cross-client batching actually happened: one flush per kind/rep
    assert srv.stats["flushes"] <= 3
    # shape validation
    srv2 = GateServer(ek, P)
    with pytest.raises(ValueError, match=r"\(8,\)-batch"):
        srv2.submit_uint8("add", jax.tree.map(lambda x: x[0], enc_u8(1, 99)),
                          jax.tree.map(lambda x: x[0], enc_u8(2, 98)))
    with pytest.raises(ValueError, match="unknown uint8 op"):
        srv2.submit_uint8("div", enc_u8(1, 97), enc_u8(2, 96))
    srv2.stop()


def test_errors_and_validation(setup):
    ks, ek = setup
    ca = _enc(ks, np.array([1], bool), 6)
    srv = GateServer(ek, P)
    with pytest.raises(ValueError, match="unknown gate kind"):
        srv.submit("nandy", jax.tree.map(lambda x: x[0], ca),
                   jax.tree.map(lambda x: x[0], ca))
    with pytest.raises(ValueError, match="single"):
        srv.submit("nand", ca, ca)       # batched input rejected
    srv.stop()
    with pytest.raises(RuntimeError, match="stopped"):
        srv.submit("nand", jax.tree.map(lambda x: x[0], ca),
                   jax.tree.map(lambda x: x[0], ca))
