"""Probe 4: remaining Mosaic ops needed by the fused NTT blind-rotate kernel."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F, M, Bt, US = 128, 48, 128, 16
REP = 40
i32, i8 = jnp.int32, jnp.int8


def bench(name, fn, *args, iters=3):
    try:
        jax.block_until_ready(fn(*args))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            ts.append(time.perf_counter() - t0)
        print(f"{name:56s} {min(ts)/REP*1e6:9.2f} us/rep")
        return min(ts) / REP
    except Exception as e:
        msg = str(e).split("\n")[0][:100]
        print(f"{name:56s} FAILED: {type(e).__name__}: {msg}")
        return None


def pcall(body, out_shape, n_in, scratch=()):
    @jax.jit
    def run(*a):
        def kernel(*refs):
            in_refs = refs[:n_in]
            o_ref = refs[n_in]
            scr = refs[n_in + 1:]

            def loop(i, carry):
                return body(in_refs, carry, i, scr)

            o_ref[:] = jax.lax.fori_loop(
                0, REP, loop, jnp.zeros(out_shape.shape, out_shape.dtype))
        return pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=list(scratch),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(*a)
    return run


def main():
    rng = np.random.default_rng(0)
    print("devices:", jax.devices())

    # P9: 2D lhs @ 3D rhs leading-contract: (2F,F)@(F,2M,Bt)->(2F,2M,Bt)
    wi = jnp.asarray(rng.integers(-128, 128, (2 * F, F)).astype(np.int8))
    c3 = jnp.asarray(rng.integers(-64, 64, (F, 2 * M, Bt)).astype(np.int8))

    def p9(refs, carry, i, scr):
        pert = carry[0, 0, 0] & 1
        x = (refs[1][:].astype(i32) + pert).astype(i8)
        return jax.lax.dot_general(refs[0][:], x, (((1,), (0,)), ((), ())),
                                   preferred_element_type=i32)
    dt = bench("P9 dot 2D@3D (256,128)@(128,96,128)",
               pcall(p9, jax.ShapeDtypeStruct((2 * F, 2 * M, Bt), i32), 2),
               wi, c3)
    if dt:
        print(f"    -> {2*F*F*2*M*Bt/dt/1e12:6.1f} TMAC/s")

    # P10: 4D rolls (U,S,Bt,2F) axis=1 and axis=-1
    v4 = jnp.asarray(rng.integers(-2**30, 2**30, (2, 8, Bt, 2 * F)).astype(np.int32))

    def p10(refs, carry, i, scr):
        x = refs[0][:] + (carry[0, 0, 0, 0] & 1)
        r1 = jnp.roll(x, 2, axis=1)
        r2 = jnp.roll(r1, 1, axis=-1)
        srow = jax.lax.broadcasted_iota(i32, (1, 8, 1, 1), 1)
        return jnp.where(srow < 2, r2, r1).astype(i32)
    bench("P10 4D roll axis1+axis-1+where (2,8,128,256)",
          pcall(p10, jax.ShapeDtypeStruct(v4.shape, i32), 1), v4)

    # P11: indexed scratch write digits[j] = ...
    dsrc = jnp.asarray(rng.integers(-64, 64, (8 * Bt, F)).astype(np.int32))

    def p11(refs, carry, i, scr):
        dig = refs[0][:] + (carry[0, 0, 0, 0] & 1)
        for j in range(6):
            scr[0][j] = (dig.reshape(8, Bt, F) + j).astype(i8)
        return scr[0][:].astype(i32)
    bench("P11 scratch[j]= writes (6,8,128,128) i8",
          pcall(p11, jax.ShapeDtypeStruct((6, 8, Bt, F), i32), 1,
                scratch=[pltpu.VMEM((6, 8, Bt, F), jnp.int8)]), dsrc)

    # P12: permute (F, US, Bt) -> (US, Bt, F) i32
    x3 = jnp.asarray(rng.integers(-2**30, 2**30, (F, US, Bt)).astype(np.int32))

    def p12(refs, carry, i, scr):
        x = refs[0][:] + (carry[0, 0, 0] & 1)
        return jnp.transpose(x, (1, 2, 0))
    bench("P12 permute (128,16,128)->(16,128,128) i32",
          pcall(p12, jax.ShapeDtypeStruct((US, Bt, F), i32), 1), x3)

    # P13: reshape (F, M, Bt)->(F, M*Bt) i32 (fallback flatten)
    x3b = jnp.asarray(rng.integers(-2**14, 2**14, (F, M, Bt)).astype(np.int32))

    def p13(refs, carry, i, scr):
        x = refs[0][:] + (carry[0, 0, 0] & 1)
        return x.reshape(F, M * Bt)
    bench("P13 reshape (128,48,128)->(128,6144) i32",
          pcall(p13, jax.ShapeDtypeStruct((F, M * Bt), i32), 1), x3b)

    # P14: batched pw dot then sublane-slice quadrants then combine
    T3 = jnp.asarray(rng.integers(-128, 128, (F, M, 2 * M)).astype(np.int8))
    d3 = jnp.asarray(rng.integers(-64, 64, (F, M, 2 * Bt)).astype(np.int8))

    def p14(refs, carry, i, scr):
        pert = carry[0, 0, 0] & 1
        d = (refs[1][:].astype(i32) + pert).astype(i8)
        z = jax.lax.dot_general(refs[0][:], d, (((1,), (1,)), ((0,), (0,))),
                                preferred_element_type=i32)  # (F,2M,2Bt)
        p = 40961
        P00 = z[:, :M, :Bt]
        P01 = z[:, M:, :Bt]
        P10 = z[:, :M, Bt:]
        P11 = z[:, M:, Bt:]

        def bal(y):
            q = jnp.round(y.astype(jnp.float32) * np.float32(1.0 / p)).astype(i32)
            r = y - q * jnp.int32(p)
            half = jnp.int32((p - 1) // 2)
            r = r - jnp.int32(p) * (r > half).astype(i32)
            return r + jnp.int32(p) * (r < -half).astype(i32)
        return bal(P00 + (bal(P01 + P10) << 8) + bal(P11) * jnp.int32(-16386))
    bench("P14 pw dot + quadrant combine -> (F,M,Bt)",
          pcall(p14, jax.ShapeDtypeStruct((F, M, Bt), i32), 2), T3, d3)


if __name__ == "__main__":
    main()
