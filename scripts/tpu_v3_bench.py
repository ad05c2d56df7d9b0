"""Stage-wise perf of the v3 fused NTT blind-rotate kernel on the real TPU.

Measures per-step cost with the fixed per-dispatch overhead (the ~25 ms
axon-tunnel launch cost discovered by tpu_probe5.py) subtracted: each
variant is timed at two grid lengths (n and 2n) and the per-step cost is
(t2 - t1) / n — overhead cancels.

Variants: cumulative stages 0..4 of the v3 kernel at R=8, the full kernel
at R=16 (F=64 — legal in v3 because lanes are Bt, not F), and a pipelined
full run (4 dispatches in flight) to see whether dispatch overhead hides.

Run: python scripts/tpu_v3_bench.py [n] [stages...]
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
from eoc_tfhe_tpu.ops import ntt, pallas_ntt_blindrot2 as p2

_I32, _I8 = jnp.int32, jnp.int8

p = params_mod.default_128bit_params()
tg = p.tgsw_params
N, k = tg.tlwe_params.N, tg.tlwe_params.k
n0 = int(sys.argv[1]) if len(sys.argv) > 1 else 128
B = Bt = 128
U = k + 1

r = np.random.default_rng(0)


def build(ctx, n, stage):
    R = S = ctx.R
    F = ctx.F
    L = ctx.key_limbs
    J = tg.kpl
    K = J * R
    M = L * U * R
    US = U * S
    sb = (R - 1).bit_length()
    fb = (F - 1).bit_length()
    primes = ctx.primes
    p1, p2_ = primes
    c16 = [int(ntt._balanced_np(np.int64(1 << 16), pp)) for pp in primes]
    pw_single = [K * 128 * 128 * (513 + abs(c)) < 2 ** 30.4 for c in c16]
    inv_single = [F * 128 * 128 * 513 + abs(c16[i]) * ((primes[i] - 1) // 2 + 92)
                  < 2 ** 31 - 2 ** 28 for i in range(2)]
    crt_inv = int(ntt._balanced_np(np.int64(pow(p1, p2_ - 2, p2_)), p2_))
    kbits = ctx.key_limb_bits
    _bal, _split8 = p2._bal, p2._split8

    T8k = jnp.asarray(r.integers(-128, 128, (n, 2, F, K, 2 * M), dtype=np.int64)
                      .astype(np.int8))
    acc0p = jnp.asarray(r.integers(-2**31, 2**31, (F, U, S, B), dtype=np.int64)
                        .astype(np.int32))
    bara3 = jnp.asarray(r.integers(0, 2 * N, (n, 1, B), dtype=np.int64)
                        .astype(np.int32))
    WfT = jnp.asarray(p2._wt_cat_i8(ctx))
    Wi = jnp.asarray(p2._winv_cat_i8(ctx))

    def kernel(bara_ref, acc0_ref, T_ref, wf_ref, wi_ref, out_ref, acc):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc[:] = acc0_ref[:]

        bara_i = bara_ref[:]

        def bit(kk):
            return (((bara_i >> kk) & 1) > 0).reshape(1, 1, 1, Bt)

        a = acc[:]
        inject = None

        if stage >= 1:  # rotation barrel
            x = a
            siota = jax.lax.broadcasted_iota(_I32, (1, 1, S, 1), 2)
            fiota = jax.lax.broadcasted_iota(_I32, (F, 1, 1, 1), 0)
            for kk in range(sb):
                sh = 1 << kk
                r1 = jnp.roll(x, sh, axis=2)
                rz = jnp.roll(r1, 1, axis=0)
                rz = jnp.where(fiota < 1, -rz, rz)
                rolled = jnp.where(siota < sh, rz, r1)
                x = jnp.where(bit(kk), rolled, x)
            for kk in range(fb):
                c = 1 << kk
                r1 = jnp.roll(x, c, axis=0)
                rolled = jnp.where(fiota < c, -r1, r1)
                x = jnp.where(bit(sb + kk), rolled, x)
            x = jnp.where(bit(sb + fb), -x, x)
            d = (x - a).astype(_I32)
            inject = d

        if stage >= 2:  # decompose + fwd NTT
            du = d.astype(jnp.uint32) + jnp.uint32(tg.offset)
            pieces = []
            for u in range(U):
                for li in range(tg.l):
                    dig = ((du[:, u] >> jnp.uint32(32 - (li + 1) * tg.Bgbit))
                           & jnp.uint32(tg.maskMod)).astype(_I32) - jnp.int32(tg.halfBg)
                    pieces.append(dig)
            x8 = jnp.concatenate(pieces, axis=1).astype(_I8)
            dhats = []
            for pi in range(2):
                q = jax.lax.dot_general(wf_ref[pi], x8, (((1,), (0,)), ((), ())),
                                        preferred_element_type=_I32)
                dhats.append(_bal(q[:F] + (q[F:] << 8), primes[pi]))
            inject = dhats[0][:, :US, :].reshape(F, U, S, Bt)

        if stage >= 3:  # pointwise
            chats = []
            for pi in range(2):
                lo, hi = _split8(dhats[pi])
                d8 = jnp.concatenate([lo, hi], axis=2)
                zz = jax.lax.dot_general(T_ref[0, pi], d8,
                                         (((1,), (1,)), ((0,), (0,))),
                                         preferred_element_type=_I32)
                pp = primes[pi]
                P00 = zz[:, :M, :Bt]; P01 = zz[:, M:, :Bt]
                P10 = zz[:, :M, Bt:]; P11 = zz[:, M:, Bt:]
                if pw_single[pi]:
                    chats.append(_bal(P00 + ((P01 + P10) << 8)
                                      + P11 * jnp.int32(c16[pi]), pp))
                else:
                    chats.append(_bal(P00 + (_bal(P01 + P10, pp) << 8)
                                      + _bal(P11, pp) * jnp.int32(c16[pi]), pp))
            inject = chats[0][:, :US, :].reshape(F, U, S, Bt)

        if stage >= 4:  # inverse
            vp = []
            for pi in range(2):
                clo, chi = _split8(chats[pi])
                c8 = jnp.concatenate([clo, chi], axis=1)
                qv = jax.lax.dot_general(wi_ref[pi], c8, (((1,), (0,)), ((), ())),
                                         preferred_element_type=_I32)
                pp = primes[pi]
                Q00 = qv[:F, :M]; Q01 = qv[:F, M:]
                Q10 = qv[F:, :M]; Q11 = qv[F:, M:]
                if inv_single[pi]:
                    vp.append(_bal(Q00 + ((Q01 + Q10) << 8)
                                   + _bal(Q11, pp, strict=False)
                                   * jnp.int32(c16[pi]), pp))
                else:
                    vp.append(_bal(Q00 + (_bal(Q01 + Q10, pp) << 8)
                                   + _bal(Q11, pp) * jnp.int32(c16[pi]), pp))
            inject = vp[0][:, :US, :].reshape(F, U, S, Bt)

        if stage >= 5:  # CRT + recombine + acc
            t = _bal((vp[1] - vp[0]) * jnp.int32(crt_inv), p2_)
            V = (vp[0] + t * jnp.int32(p1)).astype(_I32)
            out_t = V[:, :US, :]
            for li in range(1, L):
                out_t = (out_t + (V[:, li * US:(li + 1) * US, :]
                                  << jnp.int32(kbits * li))).astype(_I32)
            acc[:] = (acc[:] + out_t.reshape(F, U, S, Bt)).astype(_I32)
        elif inject is not None:
            acc[:] = (acc[:] + inject).astype(_I32)
        else:
            acc[:] = (acc[:] + 1).astype(_I32)

        @pl.when(i == n - 1)
        def _():
            out_ref[:] = acc[:]

    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((F, U, S, B), jnp.int32),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 1, Bt), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((F, U, S, Bt), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, F, K, 2 * M), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 2 * F, F), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 2 * F, F), lambda i: (0, 0, 0),
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
    )
    f = jax.jit(lambda b_, a_, t_: fn(b_, a_, t_, WfT, Wi)[0, 0, :1, :1])
    return f, (bara3, acc0p, T8k)


def timed(f, args, reps=3):
    np.asarray(f(*args))  # compile+warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def run(ctx, stage, label):
    try:
        f1, a1 = build(ctx, n0, stage)
        f2, a2 = build(ctx, 2 * n0, stage)
        t1 = timed(f1, a1)
        t2 = timed(f2, a2)
        dt = (t2 - t1) / n0
        print(f"{label}: {dt*1e6:8.1f} us/step  (t[n]={t1*1e3:.1f}ms "
              f"t[2n]={t2*1e3:.1f}ms)", flush=True)
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[0][:160]}", flush=True)


ctx8 = ntt.make_context(N=N, J=tg.kpl, halfBg=tg.halfBg, R=8,
                        primes=p2.KERNEL_PRIMES)
stages = [int(x) for x in sys.argv[2:]] or [0, 1, 2, 3, 4, 5]
for s in stages:
    run(ctx8, s, f"R=8  stage<={s}")

ctx16 = ntt.make_context(N=N, J=tg.kpl, halfBg=tg.halfBg, R=16,
                         primes=p2.KERNEL_PRIMES)
run(ctx16, 5, "R=16 full    ")

# pipelined dispatch: 4 in-flight full runs at n0
f1, a1 = build(ctx8, n0, 5)
np.asarray(f1(*a1))
t0 = time.perf_counter()
outs = [f1(*a1) for _ in range(8)]
for o in outs:
    o.block_until_ready()
np.asarray(outs[-1])
tp = (time.perf_counter() - t0) / 8
print(f"pipelined full (8 calls): {tp*1e3:.1f} ms/call "
      f"({tp/n0*1e6:.1f} us/step incl. overhead)", flush=True)
