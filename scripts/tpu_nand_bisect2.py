"""Progressive bisect of the REAL bootstrapped-NAND pipeline on TPU.

All big tensors are jit ARGUMENTS (closing over the 743 MB kernel key bakes
it into the HLO and the relay rejects the compile request with HTTP 413).
Each prefix returns a tiny slice so result-transfer effects don't pollute
the timing; full-output variants quantify that effect separately.

Run: python scripts/tpu_nand_bisect2.py [B]
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
from eoc_tfhe_tpu.core.lwe import (LweCiphertext, lwe_add_mul,
                                   lwe_noiseless_trivial)
from eoc_tfhe_tpu.core.numeric import mod_switch_from_torus32
from eoc_tfhe_tpu.core.params import default_128bit_params
from eoc_tfhe_tpu.core.tlwe import TLweCiphertext, tlwe_noiseless_trivial, \
    tlwe_extract_lwe_sample
from eoc_tfhe_tpu.ops import rotate
from eoc_tfhe_tpu.ops.keyswitch import keyswitch_apply
from eoc_tfhe_tpu.io import tfhe_io

params = default_128bit_params()
B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048

cache = os.path.join(os.environ.get("EOC_KEY_CACHE", "/root/.eoc_key_cache"),
                     "keyset-128-seed0.bin")
t0 = time.time()
with open(cache, "rb") as f:
    keyset, _ = tfhe_io.import_secret_keyset(f.read())
print(f"keyset loaded {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
ek = bootstrap.prepare_eval_key_ntt(keyset.cloud, params)
jax.block_until_ready(ek.bk_ntt_kernel)
print(f"eval key built on device {time.time()-t0:.1f}s", flush=True)

rng = np.random.default_rng(0)
a = rng.integers(0, 2, B).astype(bool)
b = rng.integers(0, 2, B).astype(bool)
ca = gates.encrypt_bit(jax.random.key(1), jnp.asarray(a), keyset.lwe_key, params)
cb = gates.encrypt_bit(jax.random.key(2), jnp.asarray(b), keyset.lwe_key, params)
jax.block_until_ready((ca.a, cb.a))

tl = params.tgsw_params.tlwe_params
N, k, Nx2 = tl.N, tl.k, 2 * tl.N
off = jnp.int32(gates._t32(1, 8))
mu = jnp.int32(gates._1S8)
T8k = ek.bk_ntt_kernel
KSP = ek.ks_prepared
ctx = ek.ntt_ctx


def linear(ca_a, ca_b, cb_a, cb_b, T8k_, ksp_):
    ca_ = LweCiphertext(a=ca_a, b=ca_b,
                        current_variance=jnp.zeros_like(ca_b, jnp.float32))
    cb_ = LweCiphertext(a=cb_a, b=cb_b,
                        current_variance=jnp.zeros_like(cb_b, jnp.float32))
    temp = lwe_noiseless_trivial(jnp.broadcast_to(off, ca_b.shape), ca_.n)
    temp = lwe_add_mul(temp, -1, ca_)
    temp = lwe_add_mul(temp, -1, cb_)
    return temp


def upto_acc0(*args):
    temp = linear(*args)
    barb = mod_switch_from_torus32(temp.b, Nx2)
    bara = mod_switch_from_torus32(temp.a, Nx2)
    tv = jnp.broadcast_to(mu[..., None], temp.b.shape + (N,)).astype(jnp.int32)
    rot = rotate.mul_by_xai(tv, (Nx2 - barb) % Nx2)
    acc0 = tlwe_noiseless_trivial(rot, k).a
    return acc0, bara


def upto_blind(*args):
    from eoc_tfhe_tpu.ops import pallas_ntt_blindrot2
    T8k_ = args[4]
    acc0, bara = upto_acc0(*args)
    bara_f = jnp.moveaxis(bara.reshape((B, params.n)), -1, 0)
    return pallas_ntt_blindrot2.blind_rotate_ntt_pallas2(
        acc0.reshape(B, k + 1, N), bara_f, T8k_, ctx, params)


def upto_extract(*args):
    acc = upto_blind(*args)
    ct = TLweCiphertext(a=acc,
                        current_variance=jnp.zeros(acc.shape[0], jnp.float32))
    out = tlwe_extract_lwe_sample(ct)
    return out.a, out.b


def full(*args):
    ksp_ = args[5]
    a_, b_ = upto_extract(*args)
    u = LweCiphertext(a=a_, b=b_,
                      current_variance=jnp.zeros_like(b_, jnp.float32))
    out = keyswitch_apply(u, ek.ks, t=params.ks.t, basebit=params.ks.basebit,
                          prepared=ksp_)
    return out.a, out.b


def tiny(fn):
    def g(*args):
        r = fn(*args)
        leaf = jax.tree_util.tree_leaves(r)[0]
        return jnp.ravel(leaf)[:1]
    return g


def timed(label, fn, reps=4):
    f = jax.jit(fn)
    args = (ca.a, ca.b, cb.a, cb.b, T8k, KSP)
    try:
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        tc = time.perf_counter() - t0
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*args))
            best = min(best, time.perf_counter() - t0)
        print(f"{label}: {best*1e3:8.1f} ms  (compile+first {tc:.0f}s)",
              flush=True)
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[0][:110]}", flush=True)


timed("linear   [tiny out]", tiny(linear))
timed("acc0     [tiny out]", tiny(upto_acc0))
timed("blind    [tiny out]", tiny(upto_blind))
timed("extract  [tiny out]", tiny(upto_extract))
timed("full     [tiny out]", tiny(full))
timed("full     [full out]", full)
timed("linear   [full out]", linear)
