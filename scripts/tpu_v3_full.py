"""Clean per-step timing of the full v3 kernel: n=630 vs 2x630, reps=5.

All large arrays are generated ON DEVICE (jax.random) — the axon relay
moves host data at ~6 MB/s, so shipping a test key from the host would take
minutes (measured round 3; see scripts/probes/README.md).  The ~27 ms fixed
per-dispatch overhead cancels in (t[2n] - t[n]) / n.

Run: python scripts/tpu_v3_full.py [R ...]
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
from eoc_tfhe_tpu.ops import ntt, pallas_ntt_blindrot2 as p2

p = params_mod.default_128bit_params()
tg = p.tgsw_params
N, k = tg.tlwe_params.N, tg.tlwe_params.k
B = 128

acc0 = jax.random.randint(jax.random.key(0), (B, k + 1, N),
                          -2**31, 2**31 - 1, dtype=jnp.int32)


def run(R):
    ctx = ntt.make_context(N=N, J=tg.kpl, halfBg=tg.halfBg, R=R,
                           primes=p2.KERNEL_PRIMES)
    F = ctx.F
    K = -(-(tg.kpl * R) // 32) * 32                       # padded Kp
    M = -(-(ctx.key_limbs * (k + 1) * R) // 64) * 64      # padded Mp
    ts = {}
    for n in (630, 1260):
        T8k = jax.random.randint(jax.random.key(1), (n, 2, F, K, 2 * M),
                                 -128, 128, dtype=jnp.int32).astype(jnp.int8)
        bara = jax.random.randint(jax.random.key(2), (n, B), 0, 2 * N,
                                  dtype=jnp.int32)
        jax.block_until_ready((T8k, bara))
        f = jax.jit(lambda b_, a_, t_: p2.blind_rotate_ntt_pallas2(
            a_, b_, t_, ctx, p)[0, 0, :1])
        t0 = time.perf_counter()
        np.asarray(f(bara, acc0, T8k))
        tc = time.perf_counter() - t0
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(f(bara, acc0, T8k))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
        print(f"  R={R} n={n}: {best*1e3:.1f} ms (compile+first {tc:.0f}s)",
              flush=True)
    dt = (ts[1260] - ts[630]) / 630
    rate = B / (dt * 630)
    print(f"R={R}: {dt*1e6:.1f} us/step -> {rate:,.0f} blind-rotates/s/chip "
          f"(asymptotic, Bt=128)", flush=True)


for R in ([int(x) for x in sys.argv[1:]] or [8, 16]):
    run(R)
