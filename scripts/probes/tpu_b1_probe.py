"""B=1 NAND latency options on the real chip (VERDICT r3 item 6).

The fused Pallas kernel pays a ~26 ms relay dispatch floor per call
(scripts/probes/tpu_probe5.py) plus a full 128-lane tile; the XLA scan
path (ntt.blind_rotate_ntt) pays only ~0.1 ms dispatch.  This probe times
a full B=1 NAND through (a) the kernel-form eval key, (b) the scan-form
eval key, (c) scan with batch padded to 8.

Run: python scripts/probes/tpu_b1_probe.py
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from eoc_tfhe_tpu.core import bootstrap, gates, keys
from eoc_tfhe_tpu.core.params import default_128bit_params
from eoc_tfhe_tpu.io import tfhe_io

params = default_128bit_params()
cache = os.path.join(os.environ.get("EOC_KEY_CACHE", "/root/.eoc_key_cache"),
                     "keyset-128-seed0.bin")
with open(cache, "rb") as f:
    keyset, _ = tfhe_io.import_secret_keyset(f.read())
print("keyset loaded", flush=True)

a = np.array([1], bool)
b = np.array([0], bool)
ca = gates.encrypt_bit(jax.random.key(1), jnp.asarray(a), keyset.lwe_key, params)
cb = gates.encrypt_bit(jax.random.key(2), jnp.asarray(b), keyset.lwe_key, params)


def timeit(name, fn, *args):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    tc = time.time() - t0
    best = 1e9
    for _ in range(5):
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        best = min(best, time.time() - t0)
    print(f"{name}: {best*1e3:.2f} ms (compile+first {tc:.0f}s)", flush=True)
    return out


@jax.jit
def nand_step(ca, cb, ek):
    out = gates.nand(ca, cb, ek, params)
    return out.a, out.b


t0 = time.time()
ek_k = bootstrap.prepare_eval_key_ntt(keyset.cloud, params, rounded=True)
jax.block_until_ready(ek_k.bk_ntt_kernel)
print(f"kernel ek {time.time()-t0:.1f}s", flush=True)
out_k = timeit("B=1 kernel-form", nand_step, ca, cb, ek_k)

t0 = time.time()
ek_s = bootstrap.prepare_eval_key_ntt(keyset.cloud, params, kernel=False,
                                      rounded=True)
jax.block_until_ready(ek_s.bk_ntt.T8)
print(f"scan ek {time.time()-t0:.1f}s", flush=True)
out_s = timeit("B=1 scan-form", nand_step, ca, cb, ek_s)

# batch-8 scan (amortized small-batch shape)
a8 = np.resize(a, 8); b8 = np.resize(b, 8)
ca8 = gates.encrypt_bit(jax.random.key(1), jnp.asarray(a8), keyset.lwe_key, params)
cb8 = gates.encrypt_bit(jax.random.key(2), jnp.asarray(b8), keyset.lwe_key, params)
timeit("B=8 scan-form", nand_step, ca8, cb8, ek_s)
timeit("B=8 kernel-form", nand_step, ca8, cb8, ek_k)

from eoc_tfhe_tpu.core.lwe import LweCiphertext
for name, o in (("kernel", out_k), ("scan", out_s)):
    ct = LweCiphertext(a=o[0], b=o[1],
                       current_variance=jnp.zeros_like(o[1], jnp.float32))
    got = np.asarray(gates.decrypt_bit(ct, keyset.lwe_key))
    print(f"{name} correct:", bool(np.array_equal(got, ~(a & b))), flush=True)
