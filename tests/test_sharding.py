"""Multi-device sharding tests on the 8-device virtual CPU mesh
(SURVEY.md §4: the TPU analog of the reference's fake AO environment)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eoc_tfhe_tpu.core import gates, keys, bootstrap
from eoc_tfhe_tpu.core.params import test_params as make_test_params
from eoc_tfhe_tpu.parallel.mesh import make_mesh, shard_lwe_batch, replicate
from eoc_tfhe_tpu.parallel.sharded import make_sharded_nand

P = make_test_params()

# Under EOC_TESTS_TPU=1 the suite runs on the single attached TPU chip;
# these tests need the 8-device virtual CPU farm.
pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs >= 8 devices (virtual CPU farm)")


@pytest.fixture(scope="module")
def keyset():
    return keys.new_random_gate_bootstrapping_secret_keyset(jax.random.key(3), P)


@pytest.fixture(scope="module")
def ek(keyset):
    return bootstrap.prepare_eval_key(keyset.cloud)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_dp_sharded_nand_matches_unsharded(keyset, ek):
    mesh = make_mesh(dp=4, tp=2)
    a = np.tile(np.array([0, 0, 1, 1], bool), 2)
    b = np.tile(np.array([0, 1, 0, 1], bool), 2)
    ca = gates.encrypt_bit(jax.random.key(31), jnp.asarray(a), keyset.lwe_key, P)
    cb = gates.encrypt_bit(jax.random.key(32), jnp.asarray(b), keyset.lwe_key, P)

    fn = make_sharded_nand(mesh, P)
    out_a, out_b, out_var = fn(ca.a, ca.b, ca.current_variance,
                               cb.a, cb.b, cb.current_variance,
                               ek.bk_rows, ek.bk_variance, ek.ks_prepared,
                               jnp.float32(keyset.cloud.bk.ks.variance))
    from eoc_tfhe_tpu.core.lwe import LweCiphertext
    out = LweCiphertext(a=out_a, b=out_b, current_variance=out_var)
    got = gates.decrypt_bit(out, keyset.lwe_key)
    np.testing.assert_array_equal(got, ~(a & b))

    # must agree (exactly, both paths are exact integer math) with unsharded
    ref = gates.nand(ca, cb, ek, P)
    np.testing.assert_array_equal(np.asarray(out.a), np.asarray(ref.a))
    np.testing.assert_array_equal(np.asarray(out.b), np.asarray(ref.b))
    # variance parity (VERDICT r3 item 8): bit-equal tracked variance
    np.testing.assert_array_equal(np.asarray(out_var),
                                  np.asarray(ref.current_variance))


def test_dp_only_mesh(keyset, ek):
    mesh = make_mesh(dp=8, tp=1)
    a = np.zeros(8, bool); a[::2] = True
    b = np.ones(8, bool)
    ca = gates.encrypt_bit(jax.random.key(33), jnp.asarray(a), keyset.lwe_key, P)
    cb = gates.encrypt_bit(jax.random.key(34), jnp.asarray(b), keyset.lwe_key, P)
    fn = make_sharded_nand(mesh, P)
    out_a, out_b, out_var = fn(ca.a, ca.b, ca.current_variance,
                               cb.a, cb.b, cb.current_variance,
                               ek.bk_rows, ek.bk_variance, ek.ks_prepared,
                               jnp.float32(keyset.cloud.bk.ks.variance))
    from eoc_tfhe_tpu.core.lwe import LweCiphertext
    out = LweCiphertext(a=out_a, b=out_b, current_variance=out_var)
    np.testing.assert_array_equal(gates.decrypt_bit(out, keyset.lwe_key), ~(a & b))


def test_auto_sharding_jit(keyset, ek):
    """Idiomatic path: jit + NamedSharding inputs, XLA auto-partitions."""
    mesh = make_mesh(dp=8, tp=1)
    a = np.ones(16, bool)
    b = np.ones(16, bool)
    ca = gates.encrypt_bit(jax.random.key(35), jnp.asarray(a), keyset.lwe_key, P)
    cb = gates.encrypt_bit(jax.random.key(36), jnp.asarray(b), keyset.lwe_key, P)
    ca = shard_lwe_batch(ca, mesh)
    cb = shard_lwe_batch(cb, mesh)
    ek_r = replicate(ek, mesh)
    out = jax.jit(lambda x, y, e: gates.and_(x, y, e, P))(ca, cb, ek_r)
    np.testing.assert_array_equal(gates.decrypt_bit(out, keyset.lwe_key), a & b)


def test_tp_external_product_matches_replicated(keyset):
    """TGSW-row-split blind rotation (key-partitioned mode) is bit-identical
    to the replicated CRT-NTT path (VERDICT r1 item 7)."""
    from eoc_tfhe_tpu.ops import ntt
    from eoc_tfhe_tpu.parallel.sharded import (blind_rotate_ntt_tp,
                                               shard_ntt_key_rows)

    ek = bootstrap.prepare_eval_key_ntt(keyset.cloud, P)
    ctx = ek.ntt_ctx
    tl = P.tgsw_params.tlwe_params
    B, N, k = 8, tl.N, tl.k
    rng = np.random.default_rng(7)
    acc0 = jnp.asarray(rng.integers(-2**31, 2**31, (B, k + 1, N),
                                    dtype=np.int64).astype(np.int32))
    bara = jnp.asarray(rng.integers(0, 2 * N, (P_n := P.n, B),
                                    dtype=np.int64).astype(np.int32))

    ref = np.asarray(ntt.blind_rotate_ntt(acc0, bara, ek.bk_ntt, P, ctx))

    mesh = make_mesh(dp=4, tp=2)
    T8s = shard_ntt_key_rows(ek.bk_ntt.T8, mesh)
    out = np.asarray(blind_rotate_ntt_tp(acc0, bara, T8s, P, ctx, mesh))
    np.testing.assert_array_equal(out, ref)


def test_hybrid_mesh_single_host_fallback():
    from eoc_tfhe_tpu.parallel.distributed import make_hybrid_mesh, initialize
    assert initialize() is False  # single-process: no-op
    mesh = make_hybrid_mesh(tp=2)
    assert mesh.axis_names == ("dp", "tp")
    assert mesh.shape["tp"] == 2 and mesh.shape["dp"] == 4


def test_freq_split_all_to_all_matches_replicated(keyset):
    """Frequency-split external product (all_to_all mode) is bit-identical
    to the replicated CRT-NTT path (round-2 VERDICT item 5 — the north-star
    limb-split small-batch latency path)."""
    from eoc_tfhe_tpu.ops import ntt
    from eoc_tfhe_tpu.parallel.sharded import (blind_rotate_ntt_freq_tp,
                                               shard_ntt_key_freq)

    ek = bootstrap.prepare_eval_key_ntt(keyset.cloud, P)
    ctx = ek.ntt_ctx
    tl = P.tgsw_params.tlwe_params
    B, N, k = 8, tl.N, tl.k
    rng = np.random.default_rng(8)
    acc0 = jnp.asarray(rng.integers(-2**31, 2**31, (B, k + 1, N),
                                    dtype=np.int64).astype(np.int32))
    bara = jnp.asarray(rng.integers(0, 2 * N, (P.n, B),
                                    dtype=np.int64).astype(np.int32))

    ref = np.asarray(ntt.blind_rotate_ntt(acc0, bara, ek.bk_ntt, P, ctx))

    for tp in (2, 4):
        mesh = make_mesh(dp=8 // tp, tp=tp)
        T8s = shard_ntt_key_freq(ek.bk_ntt.T8, mesh)
        out = np.asarray(blind_rotate_ntt_freq_tp(acc0, bara, T8s, P, ctx,
                                                  mesh))
        np.testing.assert_array_equal(out, ref)


def test_scaling_report_harness(keyset, ek):
    """The scaling harness (BASELINE >=85%-at->=2-hosts methodology) runs on
    the virtual farm: it times single-device vs mesh throughput and reports
    per-chip efficiency.  Virtual CPU devices share one core, so no
    efficiency threshold is asserted here — the harness itself (mesh
    construction, batch scaling, report shape) is what's under test; real
    numbers need a pod."""
    from eoc_tfhe_tpu.parallel.distributed import scaling_report
    from eoc_tfhe_tpu.parallel.sharded import make_sharded_nand
    mesh = make_mesh(dp=4, tp=2)
    a = np.array([0, 1] * 4, bool)
    b = np.array([1, 1] * 4, bool)

    def run_fn(m, B):
        reps = -(-B // 8)
        ca = gates.encrypt_bit(jax.random.key(41),
                               jnp.asarray(np.tile(a, reps)[:B]),
                               keyset.lwe_key, P)
        cb = gates.encrypt_bit(jax.random.key(42),
                               jnp.asarray(np.tile(b, reps)[:B]),
                               keyset.lwe_key, P)
        ks_var = jnp.float32(keyset.cloud.bk.ks.variance)
        if m is None:
            def step():
                out = gates.nand(ca, cb, ek, P)
                jax.block_until_ready(out.b)
            return step
        fn = make_sharded_nand(m, P)
        args = (ca.a, ca.b, ca.current_variance, cb.a, cb.b,
                cb.current_variance, ek.bk_rows, ek.bk_variance,
                ek.ks_prepared, ks_var)

        def step():
            jax.block_until_ready(fn(*args)[1])
        return step

    rep = scaling_report(run_fn, batch_sizes=[8], mesh=mesh, iters=2)
    assert rep["devices"] == 8
    (pt,) = rep["points"]
    assert pt["single_dev_per_s"] > 0 and pt["mesh_per_s"] > 0
    assert pt["per_chip_per_s"] == pytest.approx(pt["mesh_per_s"] / 8)
    assert 0 < pt["scaling_efficiency"]


def test_gate_level_freq_split_nand(keyset):
    """Gate-level frequency-split NAND (r4 VERDICT item 7): the full gate —
    linear part, modswitch, all_to_all blind rotation, extract, tp-psum
    keyswitch — through make_sharded_gate_freq is bit-identical (ciphertext
    AND variance rail) to the unsharded gate."""
    from eoc_tfhe_tpu.core.lwe import LweCiphertext
    from eoc_tfhe_tpu.parallel.sharded import (make_sharded_nand_freq,
                                               shard_ntt_key_freq)

    ek = bootstrap.prepare_eval_key_ntt(keyset.cloud, P)
    ctx = ek.ntt_ctx
    a = np.tile(np.array([0, 0, 1, 1], bool), 2)
    b = np.tile(np.array([0, 1, 0, 1], bool), 2)
    ca = gates.encrypt_bit(jax.random.key(41), jnp.asarray(a), keyset.lwe_key, P)
    cb = gates.encrypt_bit(jax.random.key(42), jnp.asarray(b), keyset.lwe_key, P)
    ref = gates.nand(ca, cb, ek, P)
    ks_var = jnp.float32(keyset.cloud.bk.ks.variance)

    for tp in (2, 4):
        mesh = make_mesh(dp=8 // tp, tp=tp)
        T8s = shard_ntt_key_freq(ek.bk_ntt.T8, mesh)
        fn = make_sharded_nand_freq(mesh, P, ctx)
        out_a, out_b, out_var = fn(ca.a, ca.b, ca.current_variance,
                                   cb.a, cb.b, cb.current_variance,
                                   T8s, ek.bk_variance, ek.ks_prepared,
                                   ks_var)
        out = LweCiphertext(a=out_a, b=out_b, current_variance=out_var)
        np.testing.assert_array_equal(
            np.asarray(gates.decrypt_bit(out, keyset.lwe_key)), ~(a & b))
        np.testing.assert_array_equal(np.asarray(out_a), np.asarray(ref.a))
        np.testing.assert_array_equal(np.asarray(out_b), np.asarray(ref.b))
        np.testing.assert_array_equal(np.asarray(out_var),
                                      np.asarray(ref.current_variance))


def test_dp_sharded_ripple_mul_matches_unsharded(keyset, ek):
    """The circuit layer shards like the gate layer: a jitted 8-bit
    bootstrapped multiply with its TRAILING batch axis dp-sharded over the
    mesh is bit-identical (samples, b, variance rail) to the unsharded run
    — circuits are just chained gates, so dp scaling carries through
    (SURVEY §2.4 applied at the circuit level)."""
    from jax.sharding import NamedSharding, PartitionSpec as Ps
    from eoc_tfhe_tpu.circuits.adder import ripple_mul
    from eoc_tfhe_tpu.core.lwe import LweCiphertext
    mesh = make_mesh(dp=8, tp=1)
    B = 8
    rng = np.random.default_rng(17)
    va, vb = rng.integers(0, 256, B), rng.integers(0, 256, B)
    bits = lambda v: jnp.asarray(
        ((v[None, :] >> np.arange(8)[:, None]) & 1).astype(bool))
    ca = gates.encrypt_bit(jax.random.key(41), bits(va), keyset.lwe_key, P)
    cb = gates.encrypt_bit(jax.random.key(42), bits(vb), keyset.lwe_key, P)

    ref, _ = ripple_mul(ca, cb, ek, P)

    sh = NamedSharding(mesh, Ps(None, "dp"))      # (8 bits, B) — shard B
    shard = lambda ct: LweCiphertext(
        a=jax.device_put(ct.a, NamedSharding(mesh, Ps(None, "dp", None))),
        b=jax.device_put(ct.b, sh),
        current_variance=jax.device_put(ct.current_variance, sh))
    f = jax.jit(lambda x, y, e: ripple_mul(x, y, e, P)[0])
    out = f(shard(ca), shard(cb), ek)
    np.testing.assert_array_equal(np.asarray(out.a), np.asarray(ref.a))
    np.testing.assert_array_equal(np.asarray(out.b), np.asarray(ref.b))
    np.testing.assert_array_equal(np.asarray(out.current_variance),
                                  np.asarray(ref.current_variance))
    got = (np.asarray(gates.decrypt_bit(out, keyset.lwe_key))
           * (1 << np.arange(8))[:, None]).sum(0)
    np.testing.assert_array_equal(got, (va * vb) % 256)
