"""Sharded native key checkpoint: save/load round trip on the virtual farm
(SURVEY.md §5 checkpoint row; VERDICT r1 item 10)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eoc_tfhe_tpu.core import bootstrap, keys
from eoc_tfhe_tpu.core.params import test_params as make_test_params
from eoc_tfhe_tpu.io import native_keys
from eoc_tfhe_tpu.parallel.mesh import make_mesh
from eoc_tfhe_tpu.parallel.sharded import shard_ntt_key_rows

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs >= 8 devices (virtual CPU farm)")

P = make_test_params()


@pytest.fixture(scope="module")
def keyset():
    return keys.new_random_gate_bootstrapping_secret_keyset(jax.random.key(8), P)


def test_replicated_pytree_roundtrip(tmp_path, keyset):
    ek = bootstrap.prepare_eval_key(keyset.cloud)
    tree = {"bk_rows": ek.bk_rows, "ks_prepared": ek.ks_prepared}
    native_keys.save_pytree(str(tmp_path), tree)
    got = native_keys.load_pytree(str(tmp_path), tree)
    for k in tree:
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(tree[k]))


def test_sharded_ntt_key_roundtrip(tmp_path, keyset):
    """NttKey T8 sharded over tp: shard files written per tp slice, loaded
    back onto the same mesh with identical contents and sharding."""
    ek = bootstrap.prepare_eval_key_ntt(keyset.cloud, P)
    mesh = make_mesh(dp=4, tp=2)
    T8s = shard_ntt_key_rows(ek.bk_ntt.T8, mesh)
    tree = {"T8": T8s, "variance": ek.bk_ntt.variance}
    native_keys.save_pytree(str(tmp_path), tree, mesh=mesh)

    manifest = __import__("json").load(open(tmp_path / "MANIFEST.json"))
    assert manifest["tensors"]["t0"]["shards"] == 2  # tp=2 row shards

    got = native_keys.load_pytree(str(tmp_path), tree, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(got["T8"]), np.asarray(T8s))
    s = got["T8"].sharding
    assert s.spec[5] is not None            # JR axis still tp-sharded
    np.testing.assert_array_equal(np.asarray(got["variance"]),
                                  np.asarray(ek.bk_ntt.variance))


def test_dp_sharded_batch_roundtrip(tmp_path):
    mesh = make_mesh(dp=8, tp=1)
    x = jnp.arange(8 * 5, dtype=jnp.int32).reshape(8, 5)
    from jax.sharding import NamedSharding, PartitionSpec
    xs = jax.device_put(x, NamedSharding(mesh, PartitionSpec("dp")))
    native_keys.save_pytree(str(tmp_path), [xs], mesh=mesh)
    (got,) = native_keys.load_pytree(str(tmp_path), [xs], mesh=mesh)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(x))
