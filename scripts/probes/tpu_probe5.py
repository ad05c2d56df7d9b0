"""Probe WHY the fused NTT kernel's stage-0 baseline costs ~190 us/step.

Stage 0 does no compute (acc += 1) yet dominates the kernel time, so the
cost must be in the per-step key-tile DMA ((1, P, F, K, 2M) int8 with
non-tile-aligned minor dims 48 x 96), the grid machinery, or the acc
read-modify-write.  Variants:

  A  stage0 as-is: key block (1, P, F, 48, 96) streamed per step
  B  key NOT streamed (constant index_map -> block 0 every step)
  C  key reshaped (n, 9216, 128) int8 — tile-aligned contiguous DMA
  D  key padded (n, P, F, 64, 128) — aligned in dot-ready layout
  E  no key input at all
  F  E + no acc scratch write (pure grid overhead)

Run: python scripts/tpu_probe5.py [n]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_I32, _I8 = jnp.int32, jnp.int8

n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
U, S, Bt, F = 2, 8, 128, 128
P, K, M2 = 2, 48, 96
B = Bt

r = np.random.default_rng(0)
acc0p = jnp.asarray(r.integers(-2**31, 2**31, (U, S, B, F), dtype=np.int64)
                    .astype(np.int32))


def run(label, key_shape, key_block, key_index, use_key=True, write_acc=True):
    kshape = key_shape

    def kernel(acc0_ref, T_ref, out_ref, acc):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc[:] = acc0_ref[:]

        if write_acc:
            if use_key:
                # touch one element so the input can't be elided
                t0 = T_ref[(0,) * (len(kshape))].astype(_I32)
                acc[:] = (acc[:] + 1 + t0 - t0).astype(_I32)
            else:
                acc[:] = (acc[:] + 1).astype(_I32)

        @pl.when(i == n - 1)
        def _():
            out_ref[:] = acc[:]

    in_specs = [pl.BlockSpec((U, S, Bt, F), lambda i: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
    args = [acc0p]
    if key_shape is not None:
        T8k = jnp.asarray(r.integers(-128, 128, key_shape, dtype=np.int64)
                          .astype(np.int8))
        in_specs.append(pl.BlockSpec(key_block, key_index,
                                     memory_space=pltpu.VMEM))
        args.append(T8k)
    else:
        def kernel(acc0_ref, out_ref, acc):  # noqa: F811
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                acc[:] = acc0_ref[:]

            if write_acc:
                acc[:] = (acc[:] + 1).astype(_I32)

            @pl.when(i == n - 1)
            def _():
                out_ref[:] = acc[:]

    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((U, S, B, F), jnp.int32),
        grid=(n,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((U, S, Bt, F), lambda i: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((U, S, Bt, F), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=False,
    )
    f = jax.jit(lambda *a: fn(*a)[0, 0, :1, :1])
    try:
        t0 = time.perf_counter()
        np.asarray(f(*args))
        tc = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(*args))
            ts.append(time.perf_counter() - t0)
        dt = min(ts) / n
        print(f"{label}: {dt*1e6:9.1f} us/step  (compile {tc:.0f}s)", flush=True)
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[0][:140]}", flush=True)


run("A key (1,P,F,48,96) streamed ", (n, P, F, K, M2),
    (1, P, F, K, M2), lambda i: (i, 0, 0, 0, 0))
run("B key (1,P,F,48,96) constant ", (n, P, F, K, M2),
    (1, P, F, K, M2), lambda i: (0, 0, 0, 0, 0))
run("C key (1,9216,128) streamed  ", (n, 9216, 128),
    (1, 9216, 128), lambda i: (i, 0, 0))
run("D key (1,P,F,64,128) streamed", (n, P, F, 64, 128),
    (1, P, F, 64, 128), lambda i: (i, 0, 0, 0, 0))
run("E no key input               ", None, None, None, use_key=False)
run("F no key, no acc write       ", None, None, None, use_key=False,
    write_acc=False)
