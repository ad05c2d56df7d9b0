"""Bisect the (rewritten, all-4D) fused NTT blind-rotate kernel: enable
stages 1..7 cumulatively and measure per-step cost on the real TPU.

Run: python scripts/tpu_bisect_kernel.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eoc_tfhe_tpu.core import params as params_mod
from eoc_tfhe_tpu.ops import ntt, pallas_ntt_blindrot as pnb

_I32, _I8 = jnp.int32, jnp.int8

p = params_mod.default_128bit_params()
tg = p.tgsw_params
tl = tg.tlwe_params
N, k = tl.N, tl.k
ctx = ntt.make_context(N=N, J=tg.kpl, halfBg=tg.halfBg)
n = 128
B = Bt = 128
R = S = ctx.R
F = ctx.F
L = ctx.key_limbs
J = tg.kpl
U = k + 1
US = U * S
M = L * U * R
K = J * R
P = len(ctx.primes)
nbits = (2 * N - 1).bit_length()
sbits = (R - 1).bit_length()
primes = ctx.primes
c16 = [int(ntt._balanced_np(np.int64(1 << 16), pp)) for pp in primes]
p1, p2 = primes
crt_inv = int(ntt._balanced_np(np.int64(pow(p1, p2 - 2, p2)), p2))
kbits = ctx.key_limb_bits

r = np.random.default_rng(0)
T8k = jnp.asarray(r.integers(-128, 128, (n, P, F, K, 2 * M), dtype=np.int64)
                  .astype(np.int8))
acc0p = jnp.asarray(r.integers(-2**31, 2**31, (U, S, B, F), dtype=np.int64)
                    .astype(np.int32))
bara = jnp.asarray(r.integers(0, 2 * N, (n, B), dtype=np.int64).astype(np.int32))
bits_in = ((bara[:, :, None] >> jnp.arange(nbits, dtype=jnp.int32))
           & jnp.int32(1))
Wf = jnp.asarray(pnb._wf_cat_i8(ctx))
Wi = jnp.asarray(pnb._winv_cat_i8(ctx))

_bal = pnb._bal
_split8 = pnb._split8


def make(stage, tstages=True, sstages=True):
    def kernel(bits_ref, acc0_ref, T_ref, wf_ref, wi_ref, out_ref,
               acc, digits):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc[:] = acc0_ref[:]

        bits = bits_ref[0]
        a = acc[:]
        inject = None

        if stage == 0:
            acc[:] = (acc[:] + 1).astype(_I32)

        if stage >= 1:
            ext = jnp.concatenate([a, -a], axis=-1)
            srow = jax.lax.broadcasted_iota(_I32, (1, S, 1, 1), 1)
            for kk in range(nbits):
                take = bits[:, kk:kk + 1].reshape(1, 1, Bt, 1)
                if kk < sbits:
                    if not sstages:
                        continue
                    sh = 1 << kk
                    r1 = jnp.roll(ext, sh, axis=1)
                    r2 = jnp.roll(r1, 1, axis=-1)
                    rolled = jnp.where(srow < sh, r2, r1)
                else:
                    if not tstages:
                        continue
                    rolled = jnp.roll(ext, 1 << (kk - sbits), axis=-1)
                ext = ext + take * (rolled - ext)
            d = ext[..., :F] - a
            inject = d

        if stage >= 2:
            du = d.astype(jnp.uint32) + jnp.uint32(tg.offset)
            for u in range(U):
                for li in range(tg.l):
                    dig = ((du[u] >> jnp.uint32(32 - (li + 1) * tg.Bgbit))
                           & jnp.uint32(tg.maskMod)).astype(_I32) - jnp.int32(tg.halfBg)
                    digits[u * tg.l + li] = dig.astype(_I8)
            x8 = digits[:].reshape(J * S * Bt, F)
            inject = x8.astype(_I32).reshape(J, S, Bt, F)[:U]

        if stage >= 3:
            dhats = []
            for pi in range(P):
                z = jax.lax.dot_general(x8, wf_ref[pi], (((1,), (0,)), ((), ())),
                                        preferred_element_type=_I32)
                dhats.append(_bal(z[:, :F] + (z[:, F:] << 8), primes[pi]))
            inject = dhats[0].reshape(J, S, Bt, F)[:U]

        if stage >= 4:
            d8s = []
            for pi in range(P):
                dh = dhats[pi].T.reshape(F, K, Bt)
                lo, hi = _split8(dh)
                d8s.append(jnp.concatenate([lo, hi], axis=2))
            inject = d8s[0].astype(_I32)[:, :US, :Bt].transpose(1, 2, 0)\
                .reshape(U, S, Bt, F)

        if stage >= 5:
            chats = []
            for pi in range(P):
                zz = jax.lax.dot_general(T_ref[0, pi], d8s[pi],
                                         (((1,), (1,)), ((0,), (0,))),
                                         preferred_element_type=_I32)
                pp = primes[pi]
                chats.append(_bal(zz[:, :M, :Bt]
                                  + (_bal(zz[:, M:, :Bt] + zz[:, :M, Bt:], pp) << 8)
                                  + _bal(zz[:, M:, Bt:], pp) * jnp.int32(c16[pi]), pp))
            inject = chats[0][:, :US, :].transpose(1, 2, 0).reshape(U, S, Bt, F)

        if stage >= 6:
            vp = []
            for pi in range(P):
                clo, chi = _split8(chats[pi])
                c8 = jnp.concatenate([clo, chi], axis=1)
                q = jax.lax.dot_general(wi_ref[pi], c8, (((1,), (0,)), ((), ())),
                                        preferred_element_type=_I32)
                pp = primes[pi]
                vp.append(_bal(q[:F, :M] + (_bal(q[:F, M:] + q[F:, :M], pp) << 8)
                               + _bal(q[F:, M:], pp) * jnp.int32(c16[pi]), pp))
            inject = vp[0][:, :US, :].transpose(1, 2, 0).reshape(U, S, Bt, F)

        if stage >= 7:
            t = _bal((vp[1] - vp[0]) * jnp.int32(crt_inv), p2)
            V = (vp[0] + t * jnp.int32(p1)).astype(_I32)
            out_t = V[:, :US, :]
            for li in range(1, L):
                out_t = (out_t + (V[:, li * US:(li + 1) * US, :]
                                  << jnp.int32(kbits * li))).astype(_I32)
            upd = jnp.transpose(out_t, (1, 2, 0))
            acc[:] = (acc[:] + upd.reshape(U, S, Bt, F)).astype(_I32)
        elif inject is not None:
            acc[:] = (acc[:] + inject.astype(_I32)).astype(_I32)

        @pl.when(i == n - 1)
        def _():
            out_ref[:] = acc[:]

    return kernel


def run(stage, label=None, **kw):
    kernel = make(stage, **kw)
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((U, S, B, F), jnp.int32),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, Bt, nbits), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((U, S, Bt, F), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, F, K, 2 * M), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, F, 2 * F), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, 2 * F, F), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((U, S, Bt, F), lambda i: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((U, S, Bt, F), jnp.int32),
            pltpu.VMEM((J, S, Bt, F), jnp.int8),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=False,
    )
    f = jax.jit(lambda b_, a_, t_: fn(b_, a_, t_, Wf, Wi))
    name = label or f"stage<={stage}"
    try:
        jax.block_until_ready(f(bits_in, acc0p, T8k))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(bits_in, acc0p, T8k))
            ts.append(time.perf_counter() - t0)
        dt = min(ts) / n
        print(f"{name}: {dt*1e6:9.1f} us/step", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[0][:140]}", flush=True)


run(0, label="stage0 baseline")
run(1, label="barrel t-only", sstages=False)
run(1, label="barrel s-only", tstages=False)
run(1)
run(7)
