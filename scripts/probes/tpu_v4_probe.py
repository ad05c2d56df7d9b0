"""Round-4 probe: v4 rounded-key kernel variants on the real chip.

Two-length methodology (t[2n]-t[n] cancels the ~27 ms relay dispatch and
any per-call fixed work).  Variants:
  * exact ctx (3x11 limbs)      — r3 baseline formulation
  * rounded ctx (2x12, rb=8)    — v4 plan
  * rounded + Bt=256            — wider lane tiles
  * rounded + i16 transients    — EOC_NTT_I16=1 (kernel env toggle)

Run: python scripts/probes/tpu_v4_probe.py [variant ...]
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

from eoc_tfhe_tpu.core import params as params_mod
from eoc_tfhe_tpu.ops import ntt, pallas_ntt_blindrot2 as p2

p = params_mod.default_128bit_params()
tg = p.tgsw_params
N, k = tg.tlwe_params.N, tg.tlwe_params.k
B = 128

acc0 = jax.random.randint(jax.random.key(0), (B, k + 1, N),
                          -2**31, 2**31 - 1, dtype=jnp.int32)


def run(name, rb, block_b=128):
    ctx = ntt.make_context(N=N, J=tg.kpl, halfBg=tg.halfBg,
                           primes=p2.KERNEL_PRIMES, key_round_bits=rb)
    F, R = ctx.F, ctx.R
    K = -(-(tg.kpl * R) // 32) * 32
    if ctx.key_limbs == 2:
        K = 2 * tg.kpl * R      # expanded [A; B] key (expand_kernel_key_256)
    M = -(-(ctx.key_limbs * (k + 1) * R) // 64) * 64
    Bx = max(B, block_b)
    acc = acc0 if Bx == B else jnp.tile(acc0, (Bx // B, 1, 1))
    ts = {}
    for n in (630, 1260):
        T8k = jax.lax.bitcast_convert_type(
            jax.random.bits(jax.random.key(1), (n, 2, F, K, 2 * M),
                            dtype=jnp.uint8), jnp.int8)
        bara = jax.random.randint(jax.random.key(2), (n, Bx), 0, 2 * N,
                                  dtype=jnp.int32)
        jax.block_until_ready((T8k, bara))
        f = jax.jit(lambda b_, a_, t_: p2.blind_rotate_ntt_pallas2(
            a_, b_, t_, ctx, p, block_b=block_b)[0, 0, :1])
        t0 = time.perf_counter()
        np.asarray(f(bara, acc, T8k))
        tc = time.perf_counter() - t0
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(f(bara, acc, T8k))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
        print(f"  {name} n={n}: {best*1e3:.1f} ms (compile+first {tc:.0f}s)",
              flush=True)
    dt = (ts[1260] - ts[630]) / 630 / (Bx // 128)
    rate = 128 / (dt * 630)
    print(f"{name}: {dt*1e6:.2f} us/step/128-tile -> {rate:,.0f} "
          f"blind-rotates/s/chip (asymptotic)", flush=True)


variants = sys.argv[1:] or ["exact", "rounded"]
for v in variants:
    if v == "exact":
        run("exact 3x11", rb=0)
    elif v == "rounded":
        run("rounded 2x12 rb8", rb=8)
    elif v == "bt256":
        run("rounded Bt=256", rb=8, block_b=256)
    elif v == "i16":
        os.environ["EOC_NTT_I16"] = "1"
        run("rounded i16", rb=8)
        os.environ.pop("EOC_NTT_I16")
    else:
        print(f"unknown variant {v}")
