"""Stage ablation of the v4 rounded kernel (two-length methodology).

Variants cut the per-step work progressively to attribute time:
  barrel      rotation barrel + acc update only (no NTT pipeline)
  decomp      + gadget decomposition (digits produced, dropped)
  fwd         + forward NTT dot + combine/reduce/split
  pw          + pointwise dots + combine/reduce/split
  full        everything (= production kernel math)

Run: python scripts/probes/tpu_v4_stages.py [variant ...]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import functools

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
B = 128
ctx = ntt.make_context(N=N, J=tg.kpl, halfBg=tg.halfBg,
                       primes=p2.KERNEL_PRIMES, key_round_bits=8)
F, R, L = ctx.F, ctx.R, ctx.key_limbs
S, U = R, k + 1
J = tg.kpl
K = J * R
M = L * U * R
Kp = -(-K // 32) * 32
Mp = -(-M // 64) * 64
P = len(ctx.primes)
Bt = 128
sb = (R - 1).bit_length()
fb = (F - 1).bit_length()
p1, p2_ = ctx.primes
c16 = [int(ntt._balanced_np(np.int64(1 << 16), q)) for q in ctx.primes]
crt_inv = int(ntt._balanced_np(np.int64(pow(p1, p2_ - 2, p2_)), p2_))

WfT = jnp.asarray(p2._wt_cat_i8(ctx))
Wi = jnp.asarray(p2._winv_cat_i8(ctx))


def make_fn(stage, n):
    def kernel(bara_ref, acc0_ref, T_ref, wf_ref, wi_ref, out_ref, acc):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc[:] = acc0_ref[:]

        bara_i = bara_ref[:]

        def bit(kk):
            return (((bara_i >> kk) & 1) > 0).reshape(1, 1, 1, Bt)

        a = acc[:]
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
        d = (x - a).astype(_I32)

        if stage == "barrel":
            acc[:] = (a + d).astype(_I32)
        else:
            du = d.astype(jnp.uint32) + jnp.uint32(tg.offset)
            pieces = []
            for u in range(U):
                for li in range(tg.l):
                    dig = ((du[:, u] >> jnp.uint32(32 - (li + 1) * tg.Bgbit))
                           & jnp.uint32(tg.maskMod)).astype(_I32) \
                        - jnp.int32(tg.halfBg)
                    pieces.append(dig)
            x8 = jnp.concatenate(pieces, axis=1).astype(_I8)   # (F, K, Bt)

            if stage == "decomp":
                acc[:] = (a + x8[:, :U * S].astype(_I32)
                          .reshape(F, U, S, Bt)).astype(_I32)
            else:
                pidx = jax.lax.broadcasted_iota(_I32, (P, 1, 1, 1), 0)
                first = pidx == 0
                pvi = jnp.where(first, jnp.int32(p1), jnp.int32(p2_))
                pvf = jnp.where(first, np.float32(1.0 / p1),
                                np.float32(1.0 / p2_))
                halfv = (pvi - 1) // 2
                c16v = jnp.where(first, jnp.int32(c16[0]), jnp.int32(c16[1]))

                def balv(z, strict=True):
                    zf = z.astype(jnp.float32)
                    qq = jnp.round(zf * pvf).astype(_I32)
                    r = z - qq * pvi
                    if strict:
                        r = r - pvi * (r > halfv).astype(_I32)
                        r = r + pvi * (r < -halfv).astype(_I32)
                    return r

                q = jax.lax.dot_general(
                    wf_ref[:].reshape(P * 2 * F, F), x8,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=_I32).reshape(P, 2 * F, K, Bt)
                dhat = balv(q[:, :F] + (q[:, F:] << 8),
                            strict=False).astype(jnp.int16)
                lo, hi = p2._split8(dhat)
                d8 = jnp.concatenate([lo, hi], axis=3)

                if stage == "fwd":
                    acc[:] = (a + d8[:, :, :U * S, :Bt].astype(_I32)
                              .sum(axis=0).reshape(F, U, S, Bt)).astype(_I32)
                else:
                    d8f = d8.reshape(P * F, K, 2 * Bt)
                    T_lo = T_ref[0, :, :, :K, :M].reshape(P * F, K, M)
                    T_hi = T_ref[0, :, :, :K, Mp:Mp + M].reshape(P * F, K, M)
                    zz_lo = jax.lax.dot_general(
                        T_lo, d8f, (((1,), (1,)), ((0,), (0,))),
                        preferred_element_type=_I32).reshape(P, F, M, 2 * Bt)
                    zz_hi = jax.lax.dot_general(
                        T_hi, d8f, (((1,), (1,)), ((0,), (0,))),
                        preferred_element_type=_I32).reshape(P, F, M, 2 * Bt)
                    chat = balv(zz_lo[..., :Bt]
                                + ((zz_hi[..., :Bt] + zz_lo[..., Bt:]) << 8)
                                + zz_hi[..., Bt:] * c16v,
                                strict=False).astype(jnp.int16)
                    clo, chi = p2._split8(chat)
                    c8 = jnp.concatenate([clo, chi], axis=2)

                    if stage == "pw":
                        acc[:] = (a + c8[:, :, :U * S, :Bt].astype(_I32)
                                  .sum(axis=0).reshape(F, U, S, Bt)
                                  ).astype(_I32)
                    else:
                        qv = jax.lax.dot_general(
                            wi_ref[:], c8, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=_I32)
                        vpv = balv(qv[:, :F, :M]
                                   + ((qv[:, :F, M:] + qv[:, F:, :M]) << 8)
                                   + balv(qv[:, F:, M:], strict=False) * c16v,
                                   strict=False)
                        vp0 = vpv[0].astype(_I32)
                        vp1 = vpv[1].astype(_I32)
                        zf = ((vp1 - vp0) * jnp.int32(crt_inv)).astype(
                            jnp.float32)
                        qq = jnp.round(zf * np.float32(1.0 / p2_)).astype(_I32)
                        t = (vp1 - vp0) * jnp.int32(crt_inv) - qq * jnp.int32(p2_)
                        V = (vp0 + t * jnp.int32(p1)).astype(_I32)
                        US = U * S
                        out_t = V[:, :US, :]
                        for li in range(1, L):
                            out_t = (out_t + (V[:, li * US:(li + 1) * US, :]
                                              << jnp.int32(ctx.key_limb_bits * li))
                                     ).astype(_I32)
                        out_t = (out_t << jnp.int32(ctx.key_round_bits)).astype(_I32)
                        acc[:] = (a + out_t.reshape(F, U, S, Bt)).astype(_I32)

        @pl.when(i == n - 1)
        def _():
            out_ref[:] = acc[:]

    def fn(bara3, acc0p, T8k):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((F, U, S, Bt), jnp.int32),
            grid=(n,),
            in_specs=[
                pl.BlockSpec((1, 1, Bt), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((F, U, S, Bt), lambda i: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, P, F, Kp, 2 * Mp), lambda i: (i, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((P, 2 * F, F), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((P, 2 * F, F), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((F, U, S, Bt), lambda i: (0, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((F, U, S, Bt), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
            interpret=False,
        )(bara3, acc0p, T8k, WfT, Wi)

    return jax.jit(lambda b_, a_, t_: fn(b_, a_, t_)[0, 0, :1])


acc0 = jax.random.randint(jax.random.key(0), (F, U, S, Bt),
                          -2**31, 2**31 - 1, dtype=jnp.int32)

for stage in (sys.argv[1:] or ["barrel", "decomp", "fwd", "pw", "full"]):
    ts = {}
    for n in (630, 1260):
        T8k = jax.random.randint(jax.random.key(1), (n, P, F, Kp, 2 * Mp),
                                 -128, 128, dtype=jnp.int32).astype(jnp.int8)
        bara = jax.random.randint(jax.random.key(2), (n, 1, Bt), 0, 2 * N,
                                  dtype=jnp.int32)
        jax.block_until_ready((T8k, bara))
        f = make_fn(stage, n)
        t0 = time.perf_counter()
        np.asarray(f(bara, acc0, T8k))
        tc = time.perf_counter() - t0
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(f(bara, acc0, T8k))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
        print(f"  {stage} n={n}: {best*1e3:.1f} ms (compile {tc:.0f}s)",
              flush=True)
    dt = (ts[1260] - ts[630]) / 630
    print(f"{stage}: {dt*1e6:.2f} us/step/128-tile", flush=True)
