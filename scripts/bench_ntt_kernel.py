"""Compile + bench the fused Pallas NTT blind-rotate kernel on the real TPU.

Run: python scripts/bench_ntt_kernel.py [n] [B] [block_b]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import os

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from eoc_tfhe_tpu.core import params as params_mod
from eoc_tfhe_tpu.ops import ntt, pallas_ntt_blindrot as pnb

n = int(sys.argv[1]) if len(sys.argv) > 1 else 630
B = int(sys.argv[2]) if len(sys.argv) > 2 else 256
block_b = int(sys.argv[3]) if len(sys.argv) > 3 else 128

p = params_mod.default_128bit_params()
tg = p.tgsw_params
tl = tg.tlwe_params
N, k = tl.N, tl.k
ctx = ntt.make_context(N=N, J=tg.kpl, halfBg=tg.halfBg)
print(f"N={N} n={n} B={B} block_b={block_b} R={ctx.R} F={ctx.F} "
      f"limbs={ctx.key_limbs} J={tg.kpl}", flush=True)

r = np.random.default_rng(0)
# Random fake key rows (perf only; correctness is covered by interpret test)
bk_rows = jnp.asarray(
    r.integers(-2**31, 2**31, (n, tg.kpl, k + 1, N), dtype=np.int64)
    .astype(np.int32))
t0 = time.perf_counter()
cache = f"/tmp/t8k-{n}.npy"
if os.path.exists(cache):
    T8k = jnp.asarray(np.load(cache))
else:
    key = ntt.prepare_key_ntt_np(np.asarray(bk_rows), ctx)
    T8k = jax.block_until_ready(pnb.prepare_kernel_key(key, ctx))
    np.save(cache, np.asarray(T8k))
print(f"key prep: {time.perf_counter()-t0:.1f}s  T8k {T8k.shape} "
      f"{T8k.size/2**20:.0f} MiB", flush=True)

acc0 = jnp.asarray(r.integers(-2**31, 2**31, (B, k + 1, N), dtype=np.int64)
                   .astype(np.int32))
bara = jnp.asarray(r.integers(0, 2 * N, (n, B), dtype=np.int64)
                   .astype(np.int32))

fn = jax.jit(lambda a, b, t8: pnb.blind_rotate_ntt_pallas(
    a, b, t8, ctx, p, block_b=block_b, interpret=False)[:, 0, :1])
t0 = time.perf_counter()
out = np.asarray(fn(acc0, bara, T8k))
# NB: jax.block_until_ready DOES wait for device completion (verified round
# 3, scripts/probes/README.md); the host transfer here is kept as a simple
# additional barrier.  The jitted fn returns only a [:, 0, :1] slice, so the
# checksum below covers that slice only — not comparable to full-output
# checksums from earlier revisions of this script.
print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)

iters = 5
times = []
for _ in range(iters):
    t0 = time.perf_counter()
    out = np.asarray(fn(acc0, bara, T8k))
    times.append(time.perf_counter() - t0)
dt = min(times)
print(f"steady: {dt*1e3:.1f} ms/call -> {B/dt:,.0f} blind-rotates/s", flush=True)
print("checksum:", int(out.sum(dtype=np.int64) & 0xFFFFFFFF))
