"""Failure detection / elastic recovery (SURVEY.md §5).

The reference's recovery model is the AO replay property: a process is a
deterministic function of its message log, so any node can re-derive state
(SURVEY.md §5 — why keygen is deterministic).  The TPU-native equivalents
tested here:

  * fault injection mid-conversation: the "host" dies after arbitrary
    prefixes of the log; a fresh process replays and continues identically;
  * checkpoint/restart through the serialization layer: state round-trips
    through the tfhe_io keyset blob, and a restarted "cluster" re-shards the
    evaluation key on a DIFFERENT mesh decomposition with bit-identical
    gate outputs (multi-host restart re-sharding, SURVEY §5);
  * corrupted-checkpoint detection: truncated or bit-flipped blobs raise
    instead of silently loading.
"""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eoc_tfhe_tpu.core import bootstrap, gates, keys
from eoc_tfhe_tpu.core.params import test_params as make_test_params
from eoc_tfhe_tpu.io import tfhe_io
from eoc_tfhe_tpu.process import Process

P = make_test_params()
ENV = json.dumps({"Process": {"Id": "AOS", "Owner": "FOOBAR", "Module": "M1"}})


def _msg(action, data="", **tags):
    t = [{"name": "Action", "value": action}]
    t += [{"name": k, "value": str(v)} for k, v in tags.items()]
    return json.dumps({"Tags": t, "Data": data, "Block-Height": 100})


def test_fault_injection_replay_at_every_prefix():
    """Kill the process after each message; the replacement must converge to
    the same state and produce identical continuations."""
    p = Process(params=P)
    msgs = [_msg("GenerateSecretKey", Token="h.p"),
            _msg("EncryptInteger", Value=7),
            _msg("EncryptInteger", Value=35)]
    outs = [json.loads(p.handle(m, ENV)) for m in msgs]
    cts = [o["Output"]["data"]["output"] for o in outs[1:]]

    for cut in range(1, len(msgs) + 1):
        replaced = Process.from_log(p.log[:cut], params=P)
        # continuation: decrypt whatever already exists
        if cut >= 2:
            got = json.loads(replaced.handle(
                _msg("DecryptInteger", data=cts[0], Token="h.p"), ENV))
            assert got["Output"]["data"]["output"] == "7"
        # and the replayed process can keep encrypting deterministically:
        a = json.loads(replaced.handle(_msg("EncryptInteger", Value=1), ENV))
        b = json.loads(Process.from_log(p.log[:cut], params=P).handle(
            _msg("EncryptInteger", Value=1), ENV))
        assert a == b


def test_checkpoint_restart_resharded_mesh():
    """Serialize the keyset (the checkpoint), restart on a different mesh
    decomposition, and verify bit-identical gate outputs — the multi-host
    restart path."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual farm")
    from eoc_tfhe_tpu.parallel.mesh import make_mesh
    from eoc_tfhe_tpu.parallel.sharded import make_sharded_nand

    ks = keys.new_random_gate_bootstrapping_secret_keyset(jax.random.key(9), P)
    blob = tfhe_io.export_secret_keyset(ks, P)          # checkpoint

    a = np.array([0, 1, 0, 1, 1, 1, 0, 0], bool)
    b = np.array([0, 0, 1, 1, 1, 0, 1, 0], bool)
    ca = gates.encrypt_bit(jax.random.key(91), jnp.asarray(a), ks.lwe_key, P)
    cb = gates.encrypt_bit(jax.random.key(92), jnp.asarray(b), ks.lwe_key, P)

    results = []
    for dp, tp in ((4, 2), (8, 1), (2, 4)):
        ks2, _ = tfhe_io.import_secret_keyset(blob)     # fresh "host" restart
        ek2 = bootstrap.prepare_eval_key(ks2.cloud)
        mesh = make_mesh(dp=dp, tp=tp)
        fn = make_sharded_nand(mesh, P)
        oa, ob, _ = fn(ca.a, ca.b, ca.current_variance,
                       cb.a, cb.b, cb.current_variance,
                       ek2.bk_rows, ek2.bk_variance, ek2.ks_prepared,
                       jnp.float32(ks2.cloud.bk.ks.variance))
        results.append((np.asarray(oa), np.asarray(ob)))
        np.testing.assert_array_equal(results[0][0], results[-1][0])
        np.testing.assert_array_equal(results[0][1], results[-1][1])
    from eoc_tfhe_tpu.core.lwe import LweCiphertext
    out = LweCiphertext(a=jnp.asarray(results[0][0]),
                        b=jnp.asarray(results[0][1]),
                        current_variance=jnp.zeros(a.shape, jnp.float32))
    np.testing.assert_array_equal(gates.decrypt_bit(out, ks.lwe_key), ~(a & b))


def test_corrupted_checkpoint_detected():
    ks = keys.new_random_gate_bootstrapping_secret_keyset(jax.random.key(10), P)
    blob = tfhe_io.export_secret_keyset(ks, P)
    with pytest.raises(Exception):
        tfhe_io.import_secret_keyset(blob[: len(blob) // 2])    # truncated
    bad = bytearray(blob)
    # flip a byte inside the keyswitch record UID
    idx = blob.index(b"-----END LWEKSPARAMS-----\n") + len(
        b"-----END LWEKSPARAMS-----\n")
    bad[idx] ^= 0xFF
    with pytest.raises(Exception):
        tfhe_io.import_secret_keyset(bytes(bad))
