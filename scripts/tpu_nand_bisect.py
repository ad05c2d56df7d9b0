"""Bisect the non-blind-rotate parts of the NAND pipeline on the real TPU.

The v3 kernel runs at ~15.5 us/step (156 ms at B=2048) but the full NAND
costs ~610 ms — this times each surrounding stage separately on synthetic
device-resident data.  Every timing is (t(big) - t(small)) to cancel the
per-dispatch overhead where possible; otherwise raw per-call.

Run: python scripts/tpu_nand_bisect.py [B]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from eoc_tfhe_tpu.core import params as params_mod
from eoc_tfhe_tpu.core.lwe import LweCiphertext
from eoc_tfhe_tpu.core.tlwe import TLweCiphertext, tlwe_extract_lwe_sample
from eoc_tfhe_tpu.core.numeric import mod_switch_from_torus32
from eoc_tfhe_tpu.ops import rotate
from eoc_tfhe_tpu.ops.keyswitch import keyswitch_apply, keyswitch_digits
from eoc_tfhe_tpu.core.keys import KeySwitchKey
from eoc_tfhe_tpu.ops import polymul

p = params_mod.default_128bit_params()
tl = p.tgsw_params.tlwe_params
N, k, n = tl.N, tl.k, p.n
B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048

key = jax.random.key(0)
acc = jax.random.randint(key, (B, k + 1, N), -2**31, 2**31 - 1, jnp.int32)
u_a = jax.random.randint(key, (B, k * N), -2**31, 2**31 - 1, jnp.int32)
u_b = jax.random.randint(key, (B,), -2**31, 2**31 - 1, jnp.int32)
ct_a = jax.random.randint(key, (B, n), -2**31, 2**31 - 1, jnp.int32)
ks_prep = jax.random.randint(key, (k * N * p.ks.t * (1 << p.ks.basebit),
                                   (n + 1) * polymul.LIMBS),
                             -128, 128, jnp.int32).astype(jnp.int8)
ks_packed = jax.random.randint(key, (k * N, p.ks.t, 1 << p.ks.basebit, n + 1),
                               -2**31, 2**31 - 1, jnp.int32)
ks_obj = KeySwitchKey(ks=ks_packed, variance=jnp.float32(1e-10))
jax.block_until_ready((acc, u_a, u_b, ct_a, ks_prep))


def timed(label, fn, *args):
    f = jax.jit(fn)
    try:
        r = f(*args)
        jax.block_until_ready(r)
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*args))
            best = min(best, time.perf_counter() - t0)
        print(f"{label}: {best*1e3:8.2f} ms", flush=True)
        return best
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[0][:120]}", flush=True)
        return None


# no-op baseline (pure dispatch overhead)
timed("dispatch baseline (x+1)    ", lambda x: x[:1, :1] + 1, acc)

# testvector rotation (barrel) on (B, N)
tv = jax.random.randint(key, (B, N), -2**31, 2**31 - 1, jnp.int32)
amt = jax.random.randint(key, (B,), 0, 2 * N, jnp.int32)
timed("testvect barrel rotate     ", lambda t, a: rotate.mul_by_xai(t, a), tv, amt)

# mod switch of (B, n+1)
timed("mod_switch (B, n+1)        ",
      lambda x: mod_switch_from_torus32(x, 2 * N), ct_a)

# sample extract from (B, k+1, N)
def extract(a):
    ct = TLweCiphertext(a=a, current_variance=jnp.zeros(a.shape[0], jnp.float32))
    out = tlwe_extract_lwe_sample(ct)
    return out.a, out.b
timed("tlwe_extract_lwe_sample    ", extract, acc)

# keyswitch digit extraction + onehot build only
def ks_onehot(a):
    d = keyswitch_digits(a, p.ks.t, p.ks.basebit)
    uvals = jnp.arange(1 << p.ks.basebit, dtype=jnp.int32)
    oh = (d[..., None] == uvals).astype(jnp.int8)
    return oh.sum(axis=(1, 2, 3))
timed("keyswitch onehot build     ", ks_onehot, u_a)

# full keyswitch
def ks_full(a, b):
    u = LweCiphertext(a=a, b=b, current_variance=jnp.zeros_like(b, jnp.float32))
    out = keyswitch_apply(u, ks_obj, t=p.ks.t, basebit=p.ks.basebit,
                          prepared=ks_prep)
    return out.a, out.b
timed("keyswitch full             ", ks_full, u_a, u_b)

# acc layout transposes (to_perm/from_perm equivalents)
def perms(a):
    x4 = a.reshape(B, k + 1, 128, 8)
    y = jnp.transpose(x4, (2, 1, 3, 0))
    z = jnp.transpose(y, (3, 1, 0, 2))
    return z.reshape(B, k + 1, N)[:1, :1, :1]
timed("to_perm+from_perm          ", perms, acc)
