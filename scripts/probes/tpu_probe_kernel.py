"""Probe Mosaic in-kernel capabilities on the real TPU for the fused NTT
blind-rotate kernel design (round 2): batched int8 dot_general, 32-bit
transposes, sublane rolls, fori_loop-sliced small matmuls.

Run: python scripts/tpu_probe_kernel.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 128          # batch tile
F = 64           # NTT length (R=16 plan)
K = 96           # J*R
M = 192          # 2 * L*U*R (Tlo|Thi stacked)
REP = 40         # repeats inside the kernel to amortize dispatch


def bench(name, fn, *args, iters=3):
    try:
        out = jax.block_until_ready(fn(*args))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            ts.append(time.perf_counter() - t0)
        dt = min(ts) / REP
        print(f"{name:44s} {dt*1e6:9.2f} us/rep")
        return dt
    except Exception as e:
        msg = str(e).split("\n")[0][:120]
        print(f"{name:44s} FAILED: {type(e).__name__}: {msg}")
        return None


def make_rep_kernel(body):
    """Kernel that runs `body(i, refs...)` REP times (serialized via +i)."""
    def kernel(x_ref, w_ref, o_ref):
        def loop(i, carry):
            r = body(x_ref, w_ref, carry)
            return r
        o_ref[:] = jax.lax.fori_loop(0, REP, loop, jnp.zeros_like(o_ref))
    return kernel


def main():
    rng = np.random.default_rng(0)
    print("devices:", jax.devices())

    # ---- 1. batched int8 dot_general: (F, 2B, K) @ (F, K, M) ----
    bx = jnp.asarray(rng.integers(-64, 64, (F, 2 * B, K)).astype(np.int8))
    bw = jnp.asarray(rng.integers(-128, 128, (F, K, M)).astype(np.int8))

    def batched_dot_body(x_ref, w_ref, carry):
        z = jax.lax.dot_general(x_ref[:], w_ref[:],
                                (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.int32)
        return (carry + z).astype(jnp.int32)

    @jax.jit
    def run_batched(x, w):
        return pl.pallas_call(
            make_rep_kernel(batched_dot_body),
            out_shape=jax.ShapeDtypeStruct((F, 2 * B, M), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(x, w)

    dt = bench("batched dot i8 (64,256,96)@(64,96,192)", run_batched, bx, bw)
    if dt:
        macs = F * 2 * B * K * M
        print(f"    -> {macs/dt/1e12:7.1f} TMAC/s real, "
              f"{F*2*B*128*256/dt/1e12:7.1f} TMAC/s padded")

    # ---- 2. fori_loop f-sliced 2D dots ----
    def floop_dot_body(x_ref, w_ref, carry):
        def f_iter(f, acc):
            xf = x_ref[f]          # (2B, K)
            wf = w_ref[f]          # (K, M)
            z = jax.lax.dot_general(xf, wf, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return (acc + jnp.sum(z)).astype(jnp.int32)
        s = jax.lax.fori_loop(0, F, f_iter, jnp.int32(0))
        return (carry + s).astype(jnp.int32)

    @jax.jit
    def run_floop(x, w):
        return pl.pallas_call(
            make_rep_kernel(floop_dot_body),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(x, w)

    dt = bench("fori_loop 64x dot i8 (256,96)@(96,192)", run_floop, bx, bw)
    if dt:
        macs = F * 2 * B * K * M
        print(f"    -> {macs/dt/1e12:7.1f} TMAC/s real")

    # ---- 3. 32-bit transpose (B*K, F) -> (F, B*K) ----
    tx = jnp.asarray(rng.integers(-2**30, 2**30, (B * K, F)).astype(np.int32))

    def transpose_body(x_ref, w_ref, carry):
        t = x_ref[:].T
        return (carry + t).astype(jnp.int32)

    @jax.jit
    def run_transpose(x, w):
        return pl.pallas_call(
            make_rep_kernel(transpose_body),
            out_shape=jax.ShapeDtypeStruct((F, B * K), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(x, w)

    dt = bench("transpose i32 (12288,64)->(64,12288)", run_transpose, tx, tx)
    if dt:
        print(f"    -> {tx.size*4/dt/1e9:7.1f} GB/s")

    # ---- 4. sublane roll: (B*2, 128, 128) roll axis=-2 ----
    rx = jnp.asarray(rng.integers(-2**30, 2**30, (B * 2, 128, 128)).astype(np.int32))

    def subroll_body(x_ref, w_ref, carry):
        r = jnp.roll(x_ref[:], 3, axis=-2)
        return (carry + r).astype(jnp.int32)

    @jax.jit
    def run_subroll(x, w):
        return pl.pallas_call(
            make_rep_kernel(subroll_body),
            out_shape=jax.ShapeDtypeStruct(rx.shape, jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(x, x)

    dt = bench("sublane roll i32 (256,128,128) axis=-2", run_subroll, rx, rx)
    if dt:
        print(f"    -> {rx.size*4/dt/1e9:7.1f} GB/s")

    # ---- 5. lane roll (barrel stage): (B*2, 2048) roll + lerp ----
    ex = jnp.asarray(rng.integers(-2**30, 2**30, (B * 2, 2048)).astype(np.int32))
    tk = jnp.asarray(rng.integers(0, 2, (B * 2, 1)).astype(np.int32))

    def barrel_body(x_ref, w_ref, carry):
        e = carry
        for k in range(11):
            rolled = jnp.roll(e, 1 << k, axis=-1)
            e = e + w_ref[:] * (rolled - e)
        return e.astype(jnp.int32)

    @jax.jit
    def run_barrel(x, t):
        return pl.pallas_call(
            make_rep_kernel(barrel_body),
            out_shape=jax.ShapeDtypeStruct(ex.shape, jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(x, t)

    dt = bench("barrel 11-stage i32 (256,2048)", run_barrel, ex, tk)
    if dt:
        print(f"    -> {ex.size*4*11*3/dt/1e9:7.1f} GB/s elementwise-equiv")

    # ---- 6. big flat dot i8 for reference: (12288,128)@(128,256) ----
    fx = jnp.asarray(rng.integers(-64, 64, (B * K, 128)).astype(np.int8))
    fw = jnp.asarray(rng.integers(-128, 128, (128, 256)).astype(np.int8))

    def flat_body(x_ref, w_ref, carry):
        z = jax.lax.dot_general(x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return (carry + z).astype(jnp.int32)

    @jax.jit
    def run_flat(x, w):
        return pl.pallas_call(
            make_rep_kernel(flat_body),
            out_shape=jax.ShapeDtypeStruct((B * K, 256), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(x, w)

    dt = bench("flat dot i8 (12288,128)@(128,256)", run_flat, fx, fw)
    if dt:
        macs = B * K * 128 * 256
        print(f"    -> {macs/dt/1e12:7.1f} TMAC/s")

    # ---- 7. int8 transpose probe (digits relayout option) ----
    dx = jnp.asarray(rng.integers(-64, 64, (B * 48, 128)).astype(np.int8))

    def t8_body(x_ref, w_ref, carry):
        t = x_ref[:].T
        return (carry + t.astype(jnp.int32)).astype(jnp.int32)

    @jax.jit
    def run_t8(x):
        return pl.pallas_call(
            make_rep_kernel(t8_body),
            out_shape=jax.ShapeDtypeStruct((128, B * 48), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(x, x)

    bench("transpose i8 (6144,128)->(128,6144)", run_t8, dx)


if __name__ == "__main__":
    main()
