"""Real multi-process ``jax.distributed`` execution (VERDICT r3 item 5).

Spawns two localhost CPU processes that join one JAX process group
(coordinator on 127.0.0.1), build the hybrid DCN/ICI mesh
(``parallel.distributed.make_hybrid_mesh`` — the branch that is dead code
in single-process runs), run the sharded NAND across both processes, and
check the decrypted outputs plus bit-identity with the single-process
result computed in this (parent) process.

Skippable with EOC_SKIP_MULTIPROCESS=1 (e.g. on CI runners that forbid
localhost sockets).
"""

import json
import os
import socket
import subprocess
import sys
import tempfile

import numpy as np
import pytest

_WORKER = r"""
import json, os, sys
sys.path.insert(0, os.environ["EOC_REPO"])
import jax
import jax.numpy as jnp
import numpy as np
from eoc_tfhe_tpu.core import bootstrap, gates, keys
from eoc_tfhe_tpu.core.params import test_params
from eoc_tfhe_tpu.parallel import distributed
from eoc_tfhe_tpu.parallel.sharded import make_sharded_nand

pid = int(sys.argv[1])
coord = sys.argv[2]
outdir = sys.argv[3]

joined = distributed.initialize(coordinator_address=coord, num_processes=2,
                                process_id=pid)
assert joined, "process group did not form"
assert jax.process_count() == 2, jax.process_count()
devices = jax.devices()
assert len(devices) == 4, devices            # 2 local CPU devices per process
n_hosts = len({d.process_index for d in devices})
assert n_hosts == 2

# Hybrid mesh: dp crosses processes (DCN analog), tp stays process-local.
mesh = distributed.make_hybrid_mesh(tp=2)
assert mesh.shape == {"dp": 2, "tp": 2}, mesh.shape

params = test_params()
# Deterministic keys: threefry is identical in every process.
keyset = keys.new_random_gate_bootstrapping_secret_keyset(jax.random.key(0), params)
ek = bootstrap.prepare_eval_key(keyset.cloud)

B = 4
a = np.array([0, 0, 1, 1], bool)
b = np.array([0, 1, 0, 1], bool)
ca = gates.encrypt_bit(jax.random.key(1), jnp.asarray(a), keyset.lwe_key, params)
cb = gates.encrypt_bit(jax.random.key(2), jnp.asarray(b), keyset.lwe_key, params)

# Globally-replicated host values -> global arrays on the mesh: every input
# is identical in both processes (deterministic construction), so
# make_array_from_callback with the target sharding is well-defined.
from jax.sharding import NamedSharding, PartitionSpec as P


def globalize(x, spec):
    x = np.asarray(x)
    sh = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])


args = (
    globalize(ca.a, P("dp")), globalize(ca.b, P("dp")),
    globalize(ca.current_variance, P("dp")),
    globalize(cb.a, P("dp")), globalize(cb.b, P("dp")),
    globalize(cb.current_variance, P("dp")),
    globalize(ek.bk_rows, P()), globalize(ek.bk_variance, P()),
    globalize(ek.ks_prepared, P("tp")),
    globalize(np.float32(keyset.cloud.bk.ks.variance), P()),
)
fn = make_sharded_nand(mesh, params)
out_a, out_b, out_var = fn(*args)

# Gather the global result to every host for the check.
ga = np.asarray(jax.device_get(
    jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))(out_a)))
gb = np.asarray(jax.device_get(
    jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))(out_b)))
gv = np.asarray(jax.device_get(
    jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))(out_var)))

from eoc_tfhe_tpu.core.lwe import LweCiphertext
out = LweCiphertext(a=jnp.asarray(ga), b=jnp.asarray(gb),
                    current_variance=jnp.asarray(gv))
dec = np.asarray(gates.decrypt_bit(out, keyset.lwe_key))
assert np.array_equal(dec, ~(a & b)), dec

# Gate-level frequency-split NAND over the same hybrid mesh (r5): the
# all_to_all blind rotation + tp-psum keyswitch crossing real process
# boundaries, decrypt-checked and dumped for the parent's bit-identity diff.
from eoc_tfhe_tpu.parallel.sharded import make_sharded_nand_freq
ek_ntt = bootstrap.prepare_eval_key_ntt(keyset.cloud, params)
args_f = (
    globalize(ca.a, P("dp")), globalize(ca.b, P("dp")),
    globalize(ca.current_variance, P("dp")),
    globalize(cb.a, P("dp")), globalize(cb.b, P("dp")),
    globalize(cb.current_variance, P("dp")),
    globalize(np.asarray(ek_ntt.bk_ntt.T8),
              P(None, None, None, None, "tp", None, None)),
    globalize(np.float32(ek_ntt.bk_variance), P()),
    globalize(np.asarray(ek_ntt.ks_prepared), P("tp")),
    globalize(np.float32(keyset.cloud.bk.ks.variance), P()),
)
fnf = make_sharded_nand_freq(mesh, params, ek_ntt.ntt_ctx)
fa_, fb_, fv_ = fnf(*args_f)
gfa = np.asarray(jax.device_get(
    jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))(fa_)))
gfb = np.asarray(jax.device_get(
    jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))(fb_)))
outf = LweCiphertext(a=jnp.asarray(gfa), b=jnp.asarray(gfb),
                     current_variance=jnp.zeros(gfb.shape, jnp.float32))
decf = np.asarray(gates.decrypt_bit(outf, keyset.lwe_key))
assert np.array_equal(decf, ~(a & b)), decf

with open(os.path.join(outdir, f"out_{pid}.json"), "w") as f:
    json.dump({"a": ga.tolist(), "b": gb.tolist(), "var": gv.tolist(),
               "fa": gfa.tolist(), "fb": gfb.tolist(),
               "process_count": jax.process_count()}, f)
print("WORKER_OK", pid)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.skipif(os.environ.get("EOC_SKIP_MULTIPROCESS") == "1",
                    reason="multi-process test disabled by env")
def test_two_process_distributed_nand(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = f"127.0.0.1:{_free_port()}"
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)

    env = dict(os.environ)
    env.update({
        "EOC_REPO": repo,
        "JAX_PLATFORMS": "cpu",
        "PALLAS_AXON_POOL_IPS": "",          # skip the axon TPU claim
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
    })
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), coord, str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process workers timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        assert f"WORKER_OK {i}" in out

    # Both processes saw the same global result...
    r0 = json.loads((tmp_path / "out_0.json").read_text())
    r1 = json.loads((tmp_path / "out_1.json").read_text())
    assert r0 == r1
    assert r0["process_count"] == 2

    # ...and it is bit-identical to the single-process (this process) run.
    import jax
    import jax.numpy as jnp
    from eoc_tfhe_tpu.core import bootstrap, gates, keys
    from eoc_tfhe_tpu.core.params import test_params
    params = test_params()
    keyset = keys.new_random_gate_bootstrapping_secret_keyset(
        jax.random.key(0), params)
    ek = bootstrap.prepare_eval_key(keyset.cloud)
    a = np.array([0, 0, 1, 1], bool)
    b = np.array([0, 1, 0, 1], bool)
    ca = gates.encrypt_bit(jax.random.key(1), jnp.asarray(a),
                           keyset.lwe_key, params)
    cb = gates.encrypt_bit(jax.random.key(2), jnp.asarray(b),
                           keyset.lwe_key, params)
    ref = gates.nand(ca, cb, ek, params)
    np.testing.assert_array_equal(np.asarray(ref.a),
                                  np.asarray(r0["a"], np.int32))
    np.testing.assert_array_equal(np.asarray(ref.b),
                                  np.asarray(r0["b"], np.int32))
    np.testing.assert_array_equal(
        np.asarray(ref.current_variance, np.float32),
        np.asarray(r0["var"], np.float32))

    # The freq-split gate-level leg is bit-identical to the single-process
    # NTT-path NAND too (same scan plan; different collective schedule).
    ek_ntt = bootstrap.prepare_eval_key_ntt(keyset.cloud, params)
    ref_f = gates.nand(ca, cb, ek_ntt, params)
    np.testing.assert_array_equal(np.asarray(ref_f.a),
                                  np.asarray(r0["fa"], np.int32))
    np.testing.assert_array_equal(np.asarray(ref_f.b),
                                  np.asarray(r0["fb"], np.int32))
