"""Microbenchmark: per-stage timings of the NTT external product on TPU.

Times each stage of ops/ntt.external_product_ntt as a separate jitted
function at production shapes (B=512, 128-bit params), plus candidate MXU
patterns (f-batched small matmuls vs flat big matmuls, int8 vs other dtypes)
to inform the fused Pallas kernel design. Run: python scripts/tpu_micro.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from eoc_tfhe_tpu.core.params import default_128bit_params
from eoc_tfhe_tpu.core.tgsw import decompose_h
from eoc_tfhe_tpu.ops import ntt, rotate


LOOP = 64  # amortize the ~23 ms axon relay round-trip per dispatch


def timeit(fn, *args, iters=5, warmup=2):
    """Time fn looped LOOP times inside one jit (relay-overhead amortized).

    The loop perturbs the first argument per iteration (cheap int32 add) so
    XLA cannot hoist or CSE the body; returns seconds per single call.
    """
    @jax.jit
    def looped(*a):
        x0 = a[0]

        def body(i, x):
            out = fn(x, *a[1:])
            leaf = jax.tree.leaves(out)[0]
            # fold a scalar of the output back into the input: serializes
            # iterations without changing shapes
            tw = (leaf.reshape(-1)[0] & 1).astype(x0.dtype)
            return (x0 + tw).astype(x0.dtype)

        x = jax.lax.fori_loop(0, LOOP, body, x0)
        return x

    for _ in range(warmup):
        jax.block_until_ready(looped(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(looped(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) / LOOP


def main():
    params = default_128bit_params()
    tg = params.tgsw_params
    ctx = ntt.context_for_params(params)
    B, J, N, U = 512, tg.kpl, 1024, 2
    R, F, L, P = ctx.R, ctx.F, ctx.key_limbs, len(ctx.primes)
    rng = np.random.default_rng(0)

    acc = jnp.asarray(rng.integers(-2**31, 2**31, (B, U, N)).astype(np.int64).astype(np.int32))
    bara = jnp.asarray(rng.integers(0, 2 * N, (B, 1)).astype(np.int32))
    bk_row = jnp.asarray(rng.integers(-2**31, 2**31, (1, J, U, N)).astype(np.int64).astype(np.int32))
    key = ntt.prepare_key_ntt(bk_row, ctx)
    T8 = key.T8[0]

    # --- stage functions -------------------------------------------------
    @jax.jit
    def s_rot(acc, bara):
        return rotate.mul_by_xai(acc, bara, impl="barrel") - acc

    @jax.jit
    def s_dec(d):
        return decompose_h(d, tg)

    @jax.jit
    def s_fwd(digits):
        sub = ntt.to_subpolys(digits, R)
        return ntt.ntt_forward(sub, ctx, xmax=ctx.halfBg)

    @jax.jit
    def s_outer(dhat, T8):
        dhat = jnp.transpose(dhat, (0, 4, 1, 2, 3)).reshape(P, F, B, J * R)
        dlo, dhi = ntt.split_i8(dhat)

        def outer(d8, W8):
            return jax.lax.dot_general(
                jnp.broadcast_to(d8[:, None], (P, L, F, B, J * R)), W8,
                (((4,), (3,)), ((0, 1, 2), (0, 1, 2))), preferred_element_type=jnp.int32)

        Tlo, Thi = T8[:, :, 0], T8[:, :, 1]
        outs = []
        for pi, p in enumerate(ctx.primes):
            P00 = outer(dlo, Tlo)[pi]
            Pm = ntt.balanced_reduce(outer(dlo, Thi)[pi] + outer(dhi, Tlo)[pi], p)
            P11 = ntt.balanced_reduce(outer(dhi, Thi)[pi], p)
            c16 = int(ntt._balanced_np(np.int64(1 << 16), p))
            outs.append(ntt.balanced_reduce(P00 + (Pm << 8) + P11 * jnp.int32(c16), p))
        return jnp.stack(outs)

    @jax.jit
    def s_inv(chat):
        # chat: (P, L, F, B, U*R) -> inverse along F
        outs = []
        for pi in range(P):
            c = jnp.transpose(chat[pi].reshape(L, F, B, U, R), (0, 2, 3, 4, 1))
            outs.append(ntt.ntt_inverse_prime(c, ctx, pi))
        return jnp.stack(outs)

    @jax.jit
    def s_full(digits, T8):
        return ntt.external_product_ntt(digits, T8, ctx)

    d = s_rot(acc, bara)
    digits = s_dec(d)
    dhat = s_fwd(digits)
    chat = s_outer(dhat, T8)

    print(f"rot      {timeit(s_rot, acc, bara)*1e6:9.1f} us")
    print(f"dec      {timeit(s_dec, d)*1e6:9.1f} us")
    print(f"fwd      {timeit(s_fwd, digits)*1e6:9.1f} us")
    print(f"outer    {timeit(s_outer, dhat, T8)*1e6:9.1f} us")
    print(f"inv      {timeit(s_inv, chat)*1e6:9.1f} us")
    print(f"full     {timeit(s_full, digits, T8)*1e6:9.1f} us")

    # --- raw MXU patterns -------------------------------------------------
    x8 = jnp.asarray(rng.integers(-64, 64, (B * J * R, F)).astype(np.int8))
    W8 = jnp.asarray(rng.integers(-128, 128, (F, F)).astype(np.int8))

    @jax.jit
    def mm_flat(x8, W8):
        return jax.lax.dot_general(x8, W8, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    bx = jnp.asarray(rng.integers(-128, 128, (F * P * L, B, J * R)).astype(np.int8))
    bW = jnp.asarray(rng.integers(-128, 128, (F * P * L, J * R, U * R)).astype(np.int8))

    @jax.jit
    def mm_batched(bx, bW):
        return jax.lax.dot_general(bx, bW, (((2,), (1,)), ((0,), (0,))),
                                   preferred_element_type=jnp.int32)

    t = timeit(mm_flat, x8, W8)
    macs = x8.shape[0] * F * F
    print(f"mxu flat (24576,128)@(128,128) i8: {t*1e6:8.1f} us  {macs/t/1e12:6.1f} TMAC/s")
    t = timeit(mm_batched, bx, bW)
    macs = bx.shape[0] * B * (J * R) * (U * R)
    print(f"mxu batched 768x(512,48)@(48,48) i8: {t*1e6:8.1f} us  {macs/t/1e12:6.1f} TMAC/s")

    # int16 support probe
    x16 = jnp.asarray(rng.integers(-5000, 5000, (B * J * R, F)).astype(np.int16))
    W16 = jnp.asarray(rng.integers(-5000, 5000, (F, F)).astype(np.int16))
    try:
        t = timeit(mm_flat, x16, W16)
        macs = x16.shape[0] * F * F
        print(f"mxu flat int16: {t*1e6:8.1f} us  {macs/t/1e12:6.1f} TMAC/s")
    except Exception as e:  # noqa
        print("int16 matmul unsupported:", type(e).__name__)


if __name__ == "__main__":
    main()
