"""Clean per-step timing of the full v3 kernel: n=630 vs 2x630, reps=5.

The ~27 ms fixed per-dispatch overhead (axon relay) cancels in
(t[2n] - t[n]) / n.  Run: python scripts/tpu_v3_full.py [R ...]
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
r = np.random.default_rng(0)

acc0 = jnp.asarray(r.integers(-2**31, 2**31, (B, k + 1, N), dtype=np.int64)
                   .astype(np.int32))


def run(R):
    ctx = ntt.make_context(N=N, J=tg.kpl, halfBg=tg.halfBg, R=R,
                           primes=p2.KERNEL_PRIMES)
    F = ctx.F
    K = tg.kpl * R
    M = ctx.key_limbs * (k + 1) * R
    ts = {}
    for n in (630, 1260):
        T8k = jnp.asarray(
            r.integers(-128, 128, (n, 2, F, K, 2 * M), dtype=np.int64)
            .astype(np.int8))
        bara = jnp.asarray(r.integers(0, 2 * N, (n, B), dtype=np.int64)
                           .astype(np.int32))
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
        print(f"  R={R} n={n}: {best*1e3:.1f} ms (compile {tc:.0f}s)",
              flush=True)
    dt = (ts[1260] - ts[630]) / 630
    rate = 1.0 / (dt * 630) * B  # bootstraps/s at B=128, overhead-free
    print(f"R={R}: {dt*1e6:.1f} us/step -> {rate:,.0f} blind-rotates/s/chip "
          f"(asymptotic, Bt=128)", flush=True)


for R in ([int(x) for x in sys.argv[1:]] or [8, 16]):
    run(R)
