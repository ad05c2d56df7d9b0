"""Probe 3: re-measure the fused-kernel building blocks with a REAL loop
dependency (the dot input is perturbed by the carry each iteration so
nothing can be hoisted)."""

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
i32, i8 = jnp.int32, jnp.int8


def bench(name, fn, *args, iters=3, note=""):
    try:
        jax.block_until_ready(fn(*args))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            ts.append(time.perf_counter() - t0)
        dt = min(ts) / REP
        print(f"{name:56s} {dt*1e6:9.2f} us/rep  {note}")
        return dt
    except Exception as e:
        msg = str(e).split("\n")[0][:100]
        print(f"{name:56s} FAILED: {type(e).__name__}: {msg}")
        return None


def pcall(body, out_shape, n_in):
    @jax.jit
    def run(*a):
        def kernel(*refs):
            in_refs, o_ref = refs[:-1], refs[-1]

            def loop(i, carry):
                return body(in_refs, carry, i)

            o_ref[:] = jax.lax.fori_loop(
                0, REP, loop, jnp.zeros(out_shape.shape, out_shape.dtype))
        return pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(*a)
    return run


def main():
    rng = np.random.default_rng(0)
    print("devices:", jax.devices())

    x_fkb8 = jnp.asarray(rng.integers(-64, 64, (F, K, 2 * B)).astype(np.int8))
    t_fkm8 = jnp.asarray(rng.integers(-128, 128, (F, K, 2 * M)).astype(np.int8))

    # A: pointwise batched dot, serialized: lhs ^= (carry & 1)
    def a_body(refs, carry, i):
        pert = carry[0, 0, 0] & 1
        x = (refs[0][:].astype(i32) + pert).astype(i8)
        z = jax.lax.dot_general(x, refs[1][:],
                                (((1,), (1,)), ((0,), (0,))),
                                preferred_element_type=i32)
        return z
    dt = bench("A pw dot (F,K,2B)x(F,K,2M)->(F,2B,2M) serial",
               pcall(a_body, jax.ShapeDtypeStruct((F, 2 * B, 2 * M), i32), 2),
               x_fkb8, t_fkm8)
    if dt:
        padded = F * 2 * B * 128 * 2 * M
        print(f"    -> {F*2*B*K*2*M/dt/1e12:6.1f} real, {padded/dt/1e12:6.1f} padded TMAC/s")

    # B: flat fwd dot serialized: (6144, 128) @ (128, 256)
    fx = jnp.asarray(rng.integers(-64, 64, (B * K, F)).astype(np.int8))
    fw = jnp.asarray(rng.integers(-128, 128, (F, 256)).astype(np.int8))

    def b_body(refs, carry, i):
        pert = carry[0, 0] & 1
        x = (refs[0][:].astype(i32) + pert).astype(i8)
        return jax.lax.dot_general(x, refs[1][:], (((1,), (0,)), ((), ())),
                                   preferred_element_type=i32)
    dt = bench("B fwd dot (6144,128)@(128,256) serial",
               pcall(b_body, jax.ShapeDtypeStruct((B * K, 256), i32), 2), fx, fw)
    if dt:
        print(f"    -> {B*K*F*256/dt/1e12:6.1f} TMAC/s")

    # C: inverse-style dot (256,128)@(128,12288) serial
    wl = jnp.asarray(rng.integers(-128, 128, (256, F)).astype(np.int8))
    cr = jnp.asarray(rng.integers(-64, 64, (F, 12288)).astype(np.int8))

    def c_body(refs, carry, i):
        pert = carry[0, 0] & 1
        x = (refs[1][:].astype(i32) + pert).astype(i8)
        return jax.lax.dot_general(refs[0][:], x, (((1,), (0,)), ((), ())),
                                   preferred_element_type=i32)
    dt = bench("C inv dot (256,128)@(128,12288) serial",
               pcall(c_body, jax.ShapeDtypeStruct((256, 12288), i32), 2), wl, cr)
    if dt:
        print(f"    -> {256*F*12288/dt/1e12:6.1f} TMAC/s")

    # D: i32 2D transpose serialized
    tx = jnp.asarray(rng.integers(-2**14, 2**14, (B * K, F)).astype(np.int32))

    def d_body(refs, carry, i):
        x = refs[0][:] + (carry[0, 0] & 1)
        return x.T
    dt = bench("D transpose i32 (6144,128)->(128,6144) serial",
               pcall(d_body, jax.ShapeDtypeStruct((F, B * K), i32), 1), tx)
    if dt:
        print(f"    -> {tx.size*4/dt/1e9:6.1f} GB/s")

    # E: permute i32 (B,K,F)->(F,B,K) serialized
    px = jnp.asarray(rng.integers(-2**14, 2**14, (B, K, F)).astype(np.int32))

    def e_body(refs, carry, i):
        x = refs[0][:] + (carry[0, 0, 0] & 1)
        return jnp.transpose(x, (2, 0, 1))
    bench("E permute i32 (B,K,F)->(F,B,K) serial",
          pcall(e_body, jax.ShapeDtypeStruct((F, B, K), i32), 1), px)

    # F: T + reshape k-major (KB rows) -> (F,K,B) serial
    kx = jnp.asarray(rng.integers(-2**14, 2**14, (K * B, F)).astype(np.int32))

    def f_body(refs, carry, i):
        x = refs[0][:] + (carry[0, 0, 0] & 1)
        return x.T.reshape(F, K, B)
    bench("F 2D-T+reshape ->(F,K,B) serial",
          pcall(f_body, jax.ShapeDtypeStruct((F, K, B), i32), 1), kx)

    # G: barrel 11 stages serialized (from probe1, sanity)
    ex = jnp.asarray(rng.integers(-2**30, 2**30, (2 * B, 2048)).astype(np.int32))
    tk = jnp.asarray(rng.integers(0, 2, (2 * B, 1)).astype(np.int32))

    def g_body(refs, carry, i):
        e = refs[0][:] + (carry[0, 0] & 1)
        for k in range(11):
            rolled = jnp.roll(e, 1 << k, axis=-1)
            e = e + refs[1][:] * (rolled - e)
        return e.astype(i32)
    dt = bench("G barrel 11-stage i32 (256,2048) serial",
               pcall(g_body, jax.ShapeDtypeStruct(ex.shape, i32), 2), ex, tk)

    # H: balanced_reduce + int8 split chain on (6144,128) i32, x2 primes
    def h_body(refs, carry, i):
        out = None
        x0 = refs[0][:] + (carry[0, 0] & 1)
        for p in (40961, 61441):
            zf = x0.astype(jnp.float32)
            q = jnp.round(zf * np.float32(1.0 / p)).astype(i32)
            r = x0 - q * jnp.int32(p)
            half = jnp.int32((p - 1) // 2)
            r = r - jnp.int32(p) * (r > half).astype(i32)
            r = r + jnp.int32(p) * (r < -half).astype(i32)
            lo = (((r + 128) & 255) - 128)
            hi = (r - lo) >> 8
            z = lo + hi
            out = z if out is None else out + z
        return out.astype(i32)
    dt = bench("H 2x(balred+split) i32 (6144,128) serial",
               pcall(h_body, jax.ShapeDtypeStruct((B * K, F), i32), 1), tx)

    # I: decompose-style digit extraction (2048,128)->(6144,128) x3 digits
    ax = jnp.asarray(rng.integers(-2**30, 2**30, (2 * B * 8, F)).astype(np.int32))

    def i_body(refs, carry, i):
        du = (refs[0][:] + (carry[0, 0] & 1)).astype(jnp.uint32) + jnp.uint32(1 << 25)
        outs = []
        for l in range(3):
            dig = ((du >> jnp.uint32(32 - (l + 1) * 7)) & jnp.uint32(127)
                   ).astype(i32) - jnp.int32(64)
            outs.append(dig)
        return jnp.concatenate(outs, axis=0).astype(i32)
    bench("I decompose 3 digits (2048,128)->(6144,128) serial",
          pcall(i_body, jax.ShapeDtypeStruct((3 * 2 * B * 8, F), i32), 1), ax)


if __name__ == "__main__":
    main()
