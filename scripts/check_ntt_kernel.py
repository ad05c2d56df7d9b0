"""Validate the fused Pallas NTT blind-rotate kernel against the XLA scan.

Interpret mode on CPU (any shapes), then optionally compiled on TPU.
Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/check_ntt_kernel.py
"""

import os
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from eoc_tfhe_tpu.core import params as params_mod
from eoc_tfhe_tpu.core import keys, lwe
from eoc_tfhe_tpu.core.bootstrap import prepare_eval_key_ntt
from eoc_tfhe_tpu.ops import ntt, pallas_ntt_blindrot as pnb


def toy_params():
    return params_mod.test_params(n=16, N=64, k=1, l=3, Bgbit=7)


def main():
    p = toy_params()
    tl = p.tgsw_params.tlwe_params
    N, k, n = tl.N, tl.k, p.n
    B = 8
    rng = jax.random.key(0)
    sk = keys.new_random_gate_bootstrapping_secret_keyset(rng, p)
    ek = prepare_eval_key_ntt(sk.cloud, p)
    ctx = ek.ntt_ctx
    print(f"params: N={N} n={n} R={ctx.R} F={ctx.F} limbs={ctx.key_limbs}")

    r = np.random.default_rng(1)
    acc0 = jnp.asarray(r.integers(-2**31, 2**31, (B, k + 1, N), dtype=np.int64)
                       .astype(np.int32))
    bara = jnp.asarray(r.integers(0, 2 * N, (n, B), dtype=np.int64)
                       .astype(np.int32))

    ref = ntt.blind_rotate_ntt(acc0, bara, ek.bk_ntt, p, ctx)
    ref = np.asarray(jax.block_until_ready(ref))

    T8k = pnb.prepare_kernel_key(ek.bk_ntt, ctx)
    out = pnb.blind_rotate_ntt_pallas(acc0, bara, T8k, ctx, p,
                                      block_b=B, interpret=True)
    out = np.asarray(jax.block_until_ready(out))

    match = np.array_equal(ref, out)
    print("bit-exact:", match)
    if not match:
        d = (ref.astype(np.int64) - out.astype(np.int64))
        print("mismatch count:", int((d != 0).sum()), "of", d.size)
        print("max |diff|:", int(np.abs(d).max()))
        idx = np.argwhere(d != 0)[:8]
        for i in idx:
            print(tuple(i), "ref", ref[tuple(i)], "out", out[tuple(i)])
        sys.exit(1)


if __name__ == "__main__":
    main()
