"""Measure the v3 kernel's traffic-floor components on the real chip.

Three kernels with identical grid/buffers, timed at n=630 and n=1260 so the
per-dispatch overhead cancels in the slope:

  dots   — only the four MXU dots (fwd x1 batched, pointwise x2, inverse x1)
           with a trivial combine: the dot-output-traffic + MXU floor.
  barrel — only the 11-stage rotation barrel + acc update.
  full   — the real kernel (imported, same code path as production).

Backs the speed-of-light claim in /root/repo/ROOFLINE.md.
Run: python scripts/probes/tpu_v3_floor.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eoc_tfhe_tpu.core import params as params_mod
from eoc_tfhe_tpu.ops import ntt, pallas_ntt_blindrot2 as p2

_I32, _I8 = jnp.int32, jnp.int8

p = params_mod.default_128bit_params()
tg = p.tgsw_params
N, k = tg.tlwe_params.N, tg.tlwe_params.k
ctx = ntt.make_context(N=N, J=tg.kpl, halfBg=tg.halfBg, primes=p2.KERNEL_PRIMES)
B = Bt = 128
R = S = ctx.R
F = ctx.F
K = tg.kpl * R
M = ctx.key_limbs * (k + 1) * R
Kp, Mp = 64, 64
P = 2
U = k + 1
sb, fb = 3, 7

acc0 = jax.random.randint(jax.random.key(0), (B, k + 1, N), -2**31, 2**31 - 1,
                          dtype=jnp.int32)
WfT = jnp.asarray(p2._wt_cat_i8(ctx))
Wi = jnp.asarray(p2._winv_cat_i8(ctx))


def make_fn(n, mode):
    T8k = jax.random.randint(jax.random.key(1), (n, P, F, Kp, 2 * Mp),
                             -128, 128, dtype=jnp.int32).astype(jnp.int8)
    bara = jax.random.randint(jax.random.key(2), (n, B), 0, 2 * N,
                              dtype=jnp.int32)
    if mode == "full":
        f = jax.jit(lambda b_, a_, t_: p2.blind_rotate_ntt_pallas2(
            a_, b_, t_, ctx, p)[0, 0, :1])
        return f, (bara, acc0, T8k)

    def kernel(bara_ref, acc0_ref, T_ref, wf_ref, wi_ref, out_ref, acc):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc[:] = acc0_ref[:]

        a = acc[:]
        bara_i = bara_ref[:]

        def bit(kk):
            return (((bara_i >> kk) & 1) > 0).reshape(1, 1, 1, Bt)

        if mode == "barrel":
            x = a
            siota = jax.lax.broadcasted_iota(_I32, (1, 1, S, 1), 2)
            fiota = jax.lax.broadcasted_iota(_I32, (F, 1, 1, 1), 0)
            for kk in range(sb):
                sh = 1 << kk
                r1 = pltpu.roll(x, sh, 2)
                rz = pltpu.roll(r1, 1, 0)
                rz = jnp.where(fiota < 1, -rz, rz)
                rolled = jnp.where(siota < sh, rz, r1)
                x = jnp.where(bit(kk), rolled, x)
            for kk in range(fb):
                c = 1 << kk
                r1 = pltpu.roll(x, c, 0)
                rolled = jnp.where(fiota < c, -r1, r1)
                x = jnp.where(bit(sb + kk), rolled, x)
            x = jnp.where(bit(sb + fb), -x, x)
            acc[:] = (a + x).astype(_I32)
        elif mode == "dots":
            x8 = a.reshape(F, U * S, Bt).astype(_I8)
            x8 = jnp.concatenate([x8, x8, x8], axis=1)          # (F, K, Bt)
            x8b = jnp.broadcast_to(x8[None], (P,) + x8.shape)
            q = jax.lax.dot_general(wf_ref[:], x8b,
                                    (((2,), (1,)), ((0,), (0,))),
                                    preferred_element_type=_I32)
            d8 = q[:, :F].astype(_I8)
            d8 = jnp.concatenate([d8, d8], axis=3)              # (P,F,K,2Bt)
            d8f = d8.reshape(P * F, K, 2 * Bt)
            T_lo = T_ref[0, :, :, :K, :M].reshape(P * F, K, M)
            T_hi = T_ref[0, :, :, :K, Mp:Mp + M].reshape(P * F, K, M)
            zl = jax.lax.dot_general(T_lo, d8f, (((1,), (1,)), ((0,), (0,))),
                                     preferred_element_type=_I32)
            zh = jax.lax.dot_general(T_hi, d8f, (((1,), (1,)), ((0,), (0,))),
                                     preferred_element_type=_I32)
            c8 = (zl + zh).reshape(P, F, M, 2 * Bt)[..., :Bt].astype(_I8)
            c8 = jnp.concatenate([c8, c8], axis=2)              # (P,F,2M,Bt)
            qv = jax.lax.dot_general(wi_ref[:], c8,
                                     (((2,), (1,)), ((0,), (0,))),
                                     preferred_element_type=_I32)
            upd = qv[:, :F, :U * S].sum(axis=0)                 # (F, US, Bt)
            acc[:] = (a + upd.reshape(F, U, S, Bt)).astype(_I32)

        @pl.when(i == n - 1)
        def _():
            out_ref[:] = acc[:]

    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((F, U, S, B), jnp.int32),
        grid=(n, 1),
        in_specs=[
            pl.BlockSpec((1, 1, Bt), lambda i, bt: (i, 0, bt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, U, S, Bt), lambda i, bt: (0, 0, 0, bt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, F, Kp, 2 * Mp), lambda i, bt: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, 2 * F, F), lambda i, bt: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, 2 * F, F), lambda i, bt: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((F, U, S, Bt), lambda i, bt: (0, 0, 0, bt),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((F, U, S, Bt), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=False,
    )
    f = jax.jit(lambda b_, a4_, t_: fn(b_[:, None, :], a4_, t_, WfT, Wi)[0, 0, :1])
    acc0p = jnp.transpose(acc0.reshape(B, U, F, S), (2, 1, 3, 0))
    return f, (bara, acc0p, T8k)


def run(mode):
    ts = {}
    for n in (630, 1260):
        f, args = make_fn(n, mode)
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        tc = time.perf_counter() - t0
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*args))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
        print(f"  {mode} n={n}: {best*1e3:7.1f} ms (compile+first {tc:.0f}s)",
              flush=True)
    print(f"{mode}: slope {(ts[1260]-ts[630])/630*1e6:6.1f} us/step", flush=True)


for mode in ("dots", "barrel", "full"):
    run(mode)
