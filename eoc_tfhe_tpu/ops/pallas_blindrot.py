"""Fused Pallas blind-rotation kernel — the speed-of-light path.

Replaces the XLA-composed scan in ``core/bootstrap.py`` with one
``pallas_call`` that keeps the accumulator batch resident in VMEM for all n
iterations and streams the bootstrapping key from HBM (the reference's hot
loop #1, upstream ``tfhe_blindRotate_FFT`` — SURVEY.md §3.5).

Design (see ops/polymul.py for why arithmetic is exact integer):

  * The bootstrapping key is precomputed into **chunked block-Toeplitz matmul
    form** (:func:`prepare_chunked_bk`): for each step i, chunk q, the
    (J*C, U*L*2C) int8 matrix whose (j*C + r, (u*L + l)*2C + c) entry is
    limb l of bk[i, j, u][q*C + (c - r)] for 0 <= c - r < C, else 0.
    ~7.9 GB at the default 128-bit parameters; streamed per (i, q) grid step
    (1.5 MB blocks, double-buffered by the Pallas pipeline).
  * Grid (n, Q), sequential. Per step i at q=0: barrel-shifter rotation
    (log2(2N) uniform rolls + per-row selects — no gathers), gadget
    decomposition to int8 digits. Every q: U*L MXU int8 matmuls
    (B*P, J*C) @ (J*C, 2C), folded (overlap-add with exact limb shifts) into
    a 2N-wide int32 buffer. At q=Q-1: negacyclic fold into acc.
  * Everything exact mod 2^32 (int8 x int8 -> int32; accumulation bounds
    asserted at trace time).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.params import GateBootstrappingParams
from . import polymul

DEFAULT_CHUNK = 128


def chunk_size_for(N: int, chunk: int = DEFAULT_CHUNK) -> int:
    return min(chunk, N)


def prepare_chunked_bk(bk_rows: jax.Array, params: GateBootstrappingParams,
                       chunk: int = DEFAULT_CHUNK) -> jax.Array:
    """(n, kpl, k+1, N) int32 -> (n, Q, J*C, U*L*2C) int8 block-Toeplitz form."""
    n, J, U, N = bk_rows.shape
    C = chunk_size_for(N, chunk)
    Q = N // C
    L = polymul.LIMBS

    def per_step(rows):
        limbs = polymul.decompose_signed_limbs(rows)          # (J, U, N, L)
        limbs = jnp.moveaxis(limbs, -1, -2)                   # (J, U, L, N)
        chunks = limbs.reshape(J, U, L, Q, C)
        ypad = jnp.concatenate([chunks, jnp.zeros_like(chunks)], axis=-1)  # (..., 2C)
        # Tile trick: W[r, m] = ypad[(m - r) mod 2C] for r in [0, C).
        tiled = jnp.broadcast_to(ypad[..., None, :], ypad.shape[:-1] + (C, 2 * C))
        flat = tiled.reshape(ypad.shape[:-1] + (C * 2 * C,))
        W = flat[..., : C * (2 * C - 1)].reshape(ypad.shape[:-1] + (C, 2 * C - 1))
        W = jnp.pad(W, [(0, 0)] * (W.ndim - 1) + [(0, 1)])    # (J,U,L,Q,C,2C)
        W = jnp.transpose(W, (3, 0, 4, 1, 2, 5))              # (Q, J, C, U, L, 2C)
        return W.reshape(Q, J * C, U * L * 2 * C).astype(jnp.int8)

    return jax.lax.map(per_step, bk_rows, batch_size=8)


def _barrel_rotate_2d(ext, bits, nbits):
    """(B, 2N) x (B, nbits) -> negacyclic-extended rotate, pure 2D ops.

    ``ext`` is [p, -p] along the lane axis; rotating it left-pads with the
    negated wraparound, so ``ext[:, :N]`` after the rolls is X^amt * p.
    ``bits`` holds the base-2 digits of the per-row rotation amount; the
    select is arithmetic (int32 lerp) because Mosaic rejects rank-changing
    bool broadcasts.
    """
    for k in range(nbits):
        rolled = jnp.roll(ext, 1 << k, axis=-1)
        take = bits[:, k:k + 1]                               # (B, 1) int32
        ext = ext + take * (rolled - ext)
    return ext


def blind_rotate_pallas(acc0: jax.Array, bara: jax.Array, bk_chunked: jax.Array,
                        params: GateBootstrappingParams,
                        chunk: int = DEFAULT_CHUNK,
                        interpret: bool | None = None) -> jax.Array:
    """Fused blind rotation.

    Args:
      acc0: (B, k+1, N) int32 initial accumulator (trivial testvector TLWE).
      bara: (n, B) int32 rotation amounts in [0, 2N).
      bk_chunked: (n, Q, J*C, U*L*2C) int8 from :func:`prepare_chunked_bk`.
    """
    B, U, N = acc0.shape
    if interpret is None:
        # Mosaic needs lane-aligned tiles: chunk == 128 and >= 8 sublanes.
        mosaic_ok = (chunk_size_for(N, chunk) % 128 == 0 and B % 8 == 0)
        interpret = jax.default_backend() != "tpu" or not mosaic_ok
    n, Q, JC, ULW = bk_chunked.shape
    C = chunk_size_for(N, chunk)
    L = polymul.LIMBS
    J = JC // C
    P = N // C
    assert Q == N // C and ULW == U * L * 2 * C, (bk_chunked.shape, (U, L, C))
    tg = params.tgsw_params
    assert J * C * tg.halfBg * 128 < 2**31, "int32 matmul accumulation overflow"

    nbits = (2 * N - 1).bit_length()

    def kernel(bits_ref, acc0_ref, bk_ref, out_ref, acc, digits, out2n):
        i = pl.program_id(0)
        q = pl.program_id(1)
        tgl = tg.l

        @pl.when((i == 0) & (q == 0))
        def _():
            acc[:] = acc0_ref[:]

        @pl.when(q == 0)
        def _():
            bits = bits_ref[0]                                # (B, nbits) int32
            for u in range(U):
                a_u = acc[:, u, :]                            # (B, N)
                ext = jnp.concatenate([a_u, -a_u], axis=-1)   # (B, 2N)
                d = _barrel_rotate_2d(ext, bits, nbits)[:, :N] - a_u
                du = d.astype(jnp.uint32) + jnp.uint32(tg.offset)
                for l in range(tgl):
                    dig = ((du >> jnp.uint32(32 - (l + 1) * tg.Bgbit))
                           & jnp.uint32(tg.maskMod)
                           ).astype(jnp.int32) - jnp.int32(tg.halfBg)
                    j = u * tgl + l
                    # (B, N) -> (B*P, C): row (b*P + p) is chunk p of poly b.
                    digits[:, j * C:(j + 1) * C] = (
                        dig.reshape(B * P, C).astype(jnp.int8))
            out2n[:] = jnp.zeros_like(out2n)

        x2 = digits[:]                                        # (B*P, J*C)
        Tq = bk_ref[0, 0]                                     # (J*C, U*L*2C)
        for u in range(U):
            head_acc = None
            tail_acc = None
            for l in range(L):
                col0 = (u * L + l) * 2 * C
                z = jax.lax.dot_general(
                    x2, Tq[:, col0:col0 + 2 * C], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)          # (B*P, 2C)
                zs = z << jnp.int32(8 * l)
                head_acc = zs[:, :C] if head_acc is None else head_acc + zs[:, :C]
                tail_acc = zs[:, C:] if tail_acc is None else tail_acc + zs[:, C:]
            head = head_acc.reshape(B, N)      # position within slice: p*C + c
            tail = tail_acc.reshape(B, N)      # p*C + c - C, last col is zero pad
            out2n[:, u, pl.ds(q * C, N)] += head
            out2n[:, u, pl.ds((q + 1) * C, N)] += tail

        @pl.when(q == Q - 1)
        def _():
            acc[:] = acc[:] + out2n[:, :, :N] - out2n[:, :, N:]

        @pl.when((i == n - 1) & (q == Q - 1))
        def _():
            out_ref[:] = acc[:]

    bits = ((bara[:, :, None] >> jnp.arange(nbits, dtype=jnp.int32))
            & jnp.int32(1))                                   # (n, B, nbits)

    flops = 2 * n * Q * B * P * (J * C) * (U * L * 2 * C)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, U, N), jnp.int32),
        grid=(n, Q),
        in_specs=[
            pl.BlockSpec((1, B, nbits), lambda i, q: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, U, N), lambda i, q: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, JC, ULW), lambda i, q: (i, q, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, U, N), lambda i, q: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((B, U, N), jnp.int32),        # acc
            pltpu.VMEM((B * P, J * C), jnp.int8),    # digits (rows = (b, p))
            pltpu.VMEM((B, U, 2 * N), jnp.int32),    # overlap-add buffer
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(flops=flops, bytes_accessed=bk_chunked.size,
                                      transcendentals=0),
        interpret=interpret,
    )(bits, acc0, bk_chunked)
