"""Fused Pallas blind-rotation kernel — the speed-of-light path.

Replaces the XLA-composed scan in ``core/bootstrap.py`` with one
``pallas_call`` that keeps the accumulator batch resident in VMEM for all n
iterations and streams the bootstrapping key from HBM (the reference's hot
loop #1, upstream ``tfhe_blindRotate_FFT`` — SURVEY.md §3.5).

Design (see ops/polymul.py for why arithmetic is exact integer):

  * The bootstrapping key is stored **compact**: per step i a
    ((k+1)*LIMBS*kpl, N) int8 matrix of signed byte limbs
    (:func:`prepare_compact_bk`, ~31 MB total at the 128-bit set — a
    materialized block-Toeplitz form would be 2C x larger, ~8 GB, and
    HBM-bandwidth bound).
  * Grid (n, Q), sequential. Per step i at q=0: barrel-shifter rotation
    (log2(2N) uniform rolls + per-row arithmetic selects — no gathers),
    gadget decomposition to int8 digits laid out as a (B*P, kpl*C) matrix.
  * Every q: for each (output poly u, limb l), the (kpl*C, 2C) Toeplitz
    block of the key chunk is built IN KERNEL from C bytes per row group:
    broadcast each padded chunk row C times, then log2(C) conditional lane
    rolls keyed on the row index (VPU cost ~1/3 of the matmul). The MXU
    int8 matmul (B*P, kpl*C) @ (kpl*C, 2C) then lands in a 2N-wide int32
    overlap-add buffer with exact limb shifts.
  * At q=Q-1: negacyclic fold (head - wrapped tail) into the accumulator.
  * Everything exact mod 2^32 w.r.t. the *stored* key (int8 x int8 -> int32;
    accumulation bounds asserted at trace time). With the default
    ``limbs=LIMBS`` the stored key is the true key; ``limbs<LIMBS`` rounds
    the key to a multiple of 2^(8*drop) (noise analysis in
    :func:`prepare_compact_bk`), and exactness is relative to that rounded
    key.
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


def _padded_rows(J: int) -> int:
    """Row-group stride: pad kpl to a sublane multiple so each (u, limb)
    group starts 8-aligned (Mosaic concat/slice requirement)."""
    return ((J + 7) // 8) * 8


def prepare_compact_bk(bk_rows: jax.Array,
                       limbs: int = polymul.LIMBS) -> jax.Array:
    """(n, kpl, k+1, N) int32 -> (n, (k+1)*limbs*Jp, N) int8 limb rows.

    Row order is (u, limb, j): the kernel slices one (kpl, N) group per
    (output poly, limb) pair; groups are padded to Jp = 8-aligned rows
    (zeros). Limbs are signed base-256 with wrapped top limb (exact mod
    2^32, ``polymul.decompose_signed_limbs``).

    ``limbs < LIMBS`` selects the *fast rounded-key* form: the key is
    rounded to the nearest multiple of 2^(8*(LIMBS-limbs)) (wrapping, i.e.
    mod 2^32 — sound on the torus) and only the surviving high limbs are
    stored; the kernel shifts them back into place. For the default
    128-bit set with limbs=3 the rounding injects per-coefficient error
    uniform in [-128, 128), which after the full blind rotation
    contributes ~2^22.4 absolute torus stdev — 3-4x *below* the inherent
    bootstrap noise (~2^24, n*kpl*N*halfBg^2*bk_var) and far inside the
    1/16 gate margin, while cutting the hot matmul flops by LIMBS/limbs.
    (The reference's f64 FFT likewise trades exactness for speed —
    upstream ``executeDirectTorus32`` rounding; SURVEY.md §2.2.)
    """
    n, J, U, N = bk_rows.shape
    L = polymul.LIMBS
    drop = L - limbs
    assert 0 <= drop < L, limbs
    if drop:
        half = jnp.int32(1 << (8 * drop - 1))
        bk_rows = (bk_rows.astype(jnp.int32) + half) & jnp.int32(-(1 << (8 * drop)))
    Jp = _padded_rows(J)
    all_limbs = polymul.decompose_signed_limbs(bk_rows)   # (n, J, U, N, L)
    all_limbs = all_limbs[..., drop:]                     # low limbs are zero
    x = jnp.transpose(all_limbs, (0, 2, 4, 1, 3))         # (n, U, limbs, J, N)
    x = jnp.pad(x, [(0, 0), (0, 0), (0, 0), (0, Jp - J), (0, 0)])
    return x.reshape(n, U * limbs * Jp, N).astype(jnp.int8)


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


def blind_rotate_pallas(acc0: jax.Array, bara: jax.Array, bk_compact: jax.Array,
                        params: GateBootstrappingParams,
                        chunk: int = DEFAULT_CHUNK,
                        interpret: bool | None = None) -> jax.Array:
    """Fused blind rotation.

    Args:
      acc0: (B, k+1, N) int32 initial accumulator (trivial testvector TLWE).
      bara: (n, B) int32 rotation amounts in [0, 2N).
      bk_compact: (n, (k+1)*LIMBS*kpl, N) int8 from :func:`prepare_compact_bk`.
    """
    B, U, N = acc0.shape
    C = chunk_size_for(N, chunk)
    if interpret is None:
        # Mosaic needs lane-aligned tiles: C a multiple of 128 (digit-matrix
        # lane splits) and >= 8 sublanes.
        mosaic_ok = (C % 128 == 0 and B % 8 == 0)
        interpret = jax.default_backend() != "tpu" or not mosaic_ok
    n, ULJ, N2 = bk_compact.shape
    tg = params.tgsw_params
    J = tg.kpl
    Jp = _padded_rows(J)
    L = ULJ // (U * Jp)             # stored limbs (fast rounded-key form if < LIMBS)
    drop = polymul.LIMBS - L        # kernel restores dropped-limb magnitude via shifts
    P = Q = N // C
    assert ULJ == U * L * Jp and N2 == N, (bk_compact.shape, (U, L, Jp, N))
    assert J * C * tg.halfBg * 128 < 2**31, "int32 matmul accumulation overflow"

    nbits = (2 * N - 1).bit_length()
    cbits = max(1, (C - 1).bit_length())

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
        # Row index r (mod C) of the Toeplitz blocks, for the barrel build.
        rowmod = jax.lax.broadcasted_iota(jnp.int32, (J * C, 2 * C), 0) & (C - 1)
        for u in range(U):
            head_acc = None
            tail_acc = None
            for l in range(L):
                r0 = (u * L + l) * Jp
                y = bk_ref[0, r0:r0 + J, pl.ds(q * C, C)]     # (J, C) int8
                ypad = jnp.concatenate([y, jnp.zeros_like(y)], axis=-1)
                # Toeplitz build: M[(j, r), c] = y_j[(c - r) mod 2C], with the
                # zero upper half realizing the band mask. C-fold row repeat,
                # then log2(C) conditional per-row lane rolls.
                M = jnp.repeat(ypad, C, axis=0)               # (J*C, 2C)
                for kb in range(cbits):
                    rolled = jnp.roll(M, 1 << kb, axis=1)
                    M = jnp.where(((rowmod >> kb) & 1) == 1, rolled, M)
                z = jax.lax.dot_general(
                    x2, M, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)          # (B*P, 2C)
                zh = z[:, :C] << jnp.int32(8 * (l + drop))
                zt = z[:, C:] << jnp.int32(8 * (l + drop))
                head_acc = zh if head_acc is None else head_acc + zh
                tail_acc = zt if tail_acc is None else tail_acc + zt
            head = head_acc.reshape(B, N)      # position within slice: p*C + c
            tail = tail_acc.reshape(B, N)      # p*C + c - C (next chunk)
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
            pl.BlockSpec((1, ULJ, N), lambda i, q: (i, 0, 0),
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
            # Batch-resident accumulators exceed the conservative 16 MiB
            # scoped default at production batch sizes; v5e has 128 MiB VMEM.
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(flops=flops, bytes_accessed=bk_compact.size,
                                      transcendentals=0),
        interpret=interpret,
    )(bits, acc0, bk_compact)
