"""Probe 2: layout plumbing between forward NTT and the f-batched pointwise
contraction for the fused NTT blind-rotate kernel.

Candidates measured in-kernel on the real chip.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, K, F, M = 128, 48, 128, 96
REP = 40


def bench(name, fn, *args, iters=3):
    try:
        jax.block_until_ready(fn(*args))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            ts.append(time.perf_counter() - t0)
        print(f"{name:52s} {min(ts)/REP*1e6:9.2f} us/rep")
        return min(ts) / REP
    except Exception as e:
        msg = str(e).split("\n")[0][:110]
        print(f"{name:52s} FAILED: {type(e).__name__}: {msg}")
        return None


def pcall(body, out_shape, *arrs):
    @jax.jit
    def run(*a):
        def kernel(*refs):
            in_refs, o_ref = refs[:-1], refs[-1]
            def loop(i, carry):
                return body(in_refs, carry, i)
            o_ref[:] = jax.lax.fori_loop(0, REP, loop,
                                         jnp.zeros(out_shape.shape, out_shape.dtype))
        return pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(arrs),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(*a)
    return run


def main():
    rng = np.random.default_rng(0)
    print("devices:", jax.devices())
    i32, i8 = jnp.int32, jnp.int8

    x_bkf8 = jnp.asarray(rng.integers(-64, 64, (B, K, F)).astype(np.int8))
    t_kmf8 = jnp.asarray(rng.integers(-128, 128, (K, M, F)).astype(np.int8))
    x_fkb8 = jnp.asarray(rng.integers(-64, 64, (F, K, B)).astype(np.int8))
    t_fkm8 = jnp.asarray(rng.integers(-128, 128, (F, K, M)).astype(np.int8))
    x_bk_f = jnp.asarray(rng.integers(-2**14, 2**14, (B * K, F)).astype(np.int32))
    x_f_bk = jnp.asarray(rng.integers(-2**14, 2**14, (F, B * K)).astype(np.int32))
    x8_bk_f = jnp.asarray(rng.integers(-64, 64, (B * K, F)).astype(np.int8))
    eye8 = jnp.asarray(np.eye(F, dtype=np.int8))

    # P1: batch on MINOR axis: 'bkf,kmf->bmf'
    def p1(refs, carry, i):
        z = jax.lax.dot_general(refs[0][:], refs[1][:],
                                (((1,), (0,)), ((2,), (2,))),
                                preferred_element_type=i32)
        # out (F?, B, M) order: batch dims lead -> (F, B, M)
        return (carry + z).astype(i32)
    bench("P1 dot 'bkf,kmf->(f)bm' minor-batch",
          pcall(p1, jax.ShapeDtypeStruct((F, B, M), i32), x_bkf8, t_kmf8),
          x_bkf8, t_kmf8)

    # P2: batch leading, lhs contraction on middle (sublane) dim
    def p2(refs, carry, i):
        z = jax.lax.dot_general(refs[0][:], refs[1][:],
                                (((1,), (1,)), ((0,), (0,))),
                                preferred_element_type=i32)
        return (carry + z).astype(i32)
    bench("P2 dot (F,K,B)x(F,K,M)->(F,B,M) sublane-contract",
          pcall(p2, jax.ShapeDtypeStruct((F, B, M), i32), x_fkb8, t_fkm8),
          x_fkb8, t_fkm8)

    # P3: full permute (B*K, F) treated as (B,K,F) -> (F,B,K), i32
    def p3(refs, carry, i):
        x3 = refs[0][:].reshape(B, K, F)
        t = jnp.transpose(x3, (2, 0, 1))
        return (carry + t).astype(i32)
    bench("P3 permute i32 (B,K,F)->(F,B,K)",
          pcall(p3, jax.ShapeDtypeStruct((F, B, K), i32), x_bk_f),
          x_bk_f)

    # P4: 2D transpose then reshape (F, B*K)->(F,B,K)
    def p4(refs, carry, i):
        t = refs[0][:].T                        # (F, B*K)
        t3 = t.reshape(F, B, K)
        return (carry + t3).astype(i32)
    bench("P4 2D-T + reshape ->(F,B,K) i32",
          pcall(p4, jax.ShapeDtypeStruct((F, B, K), i32), x_bk_f),
          x_bk_f)

    # P5: MXU transpose of int8 limb via identity
    def p5(refs, carry, i):
        z = jax.lax.dot_general(refs[1][:], refs[0][:],
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=i32)  # (F, B*K)
        return (carry + z).astype(i32)
    bench("P5 MXU-transpose i8 (6144,128)->(128,6144)",
          pcall(p5, jax.ShapeDtypeStruct((F, B * K), i32), x8_bk_f, eye8),
          x8_bk_f, eye8)

    # P6: reshape (F, B*K) -> (F, B, K) alone
    def p6(refs, carry, i):
        t3 = refs[0][:].reshape(F, B, K)
        return (carry + t3).astype(i32)
    bench("P6 reshape (F,6144)->(F,128,48) i32",
          pcall(p6, jax.ShapeDtypeStruct((F, B, K), i32), x_f_bk),
          x_f_bk)

    # P7: reshape k-major (F, K*B) -> (F, K, B)
    def p7(refs, carry, i):
        t3 = refs[0][:].reshape(F, K, B)
        return (carry + t3).astype(i32)
    bench("P7 reshape (F,6144)->(F,48,128) i32",
          pcall(p7, jax.ShapeDtypeStruct((F, K, B), i32), x_f_bk),
          x_f_bk)

    # P8: end-to-end candidate A: 2D-T (i32) -> reshape -> split8 -> P2-style dot
    t_fkm8b = jnp.asarray(rng.integers(-128, 128, (F, K, 2 * M)).astype(np.int8))

    def p8(refs, carry, i):
        xt = refs[0][:].T.reshape(F, K, B)      # k-major transpose+reshape
        lo = (((xt + 128) & 255) - 128)
        hi = (xt - lo) >> 8
        d8 = jnp.concatenate([lo.astype(i8), hi.astype(i8)], axis=2)  # (F,K,2B)
        z = jax.lax.dot_general(d8, refs[1][:],
                                (((1,), (1,)), ((0,), (0,))),
                                preferred_element_type=i32)  # (F, 2B, 2M)
        return (carry + z).astype(i32)
    x_kb_f = jnp.asarray(rng.integers(-2**14, 2**14, (K * B, F)).astype(np.int32))
    bench("P8 e2e: T+reshape+split+dot -> (F,2B,2M)",
          pcall(p8, jax.ShapeDtypeStruct((F, 2 * B, 2 * M), i32), x_kb_f, t_fkm8b),
          x_kb_f, t_fkm8b)


if __name__ == "__main__":
    main()
