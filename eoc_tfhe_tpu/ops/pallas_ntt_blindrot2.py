"""Fused Pallas CRT-NTT blind rotation, v3 — relayout-free lane discipline.

Round-3 rework of ``ops/pallas_ntt_blindrot.py`` (v1).  The round-2 bisect
(scripts/tpu_bisect_ntt2.py on a real v5e) showed the v1 step time was NOT
MXU- or DMA-bound: of ~85 us/step/tile, ~50 us was the final stage (CRT +
limb recombine + the (F, US, Bt) -> (US, Bt, F) lane transpose + acc update)
and ~10 us the post-forward (JSB, F) -> (F, K, Bt) transpose — i.e. the two
per-step *relayouts* (lane identity flipping between F and Bt) cost more
than all matmuls combined.

v3 keeps **Bt on the lane axis for every tensor in the loop**, so no
relayout ever happens:

  * acc lives as (F, U, S, Bt) int32 — t-index on the major axis, (S, Bt) =
    (8, 128) exactly one int32 tile.
  * rotation X^a is a barrel of major/sublane rolls: log2(R) s-stages
    (sublane roll + Z-carry), log2(F) t-stages (major roll + sign on wrap),
    and one global negation for the Z^F = -1 bit.  No one-hot matmul, no
    4-limb split of acc (v1 spent ~9 us/step there).
  * gadget digits are a (F, J*S, Bt) int8 value (no scratch), fed straight
    to the forward NTT as  Wt (2F, F) @ digits (F, K, Bt) -> (2F, K, Bt) —
    the same 2D@3D dot form as the inverse (v1 probe P9), output already in
    pointwise orientation.  K = J*S = J*R matches the key tensor's (j, r1)
    contraction axis because the digit subpoly index IS r1.
  * pointwise and inverse stages as in v1 (batched dot on F, contraction on
    sublanes), but the limb-product recombination uses a prime pair chosen
    so that |balanced(2^16 mod p)| is ~2^10 (default 64513, 32257, both
    === 1 mod 256): then  P00 + 256*(P01+P10) + c16*P11  fits int32 *raw*
    and one strict reduce replaces v1's three per stage (audit below).
  * the update arrives as (F, U*S, Bt) — acc's own layout — so the v1 P12
    transpose is gone.

Round-3 refinements on top (each measured on the real chip):

  * **step-major grid** ``(n, n_btiles)`` with the whole (<=2048-sample)
    batch resident in the acc scratch: the 2 MB key tile for step i is
    DMA'd once and reused by every batch tile, so key HBM traffic is
    independent of batch size.
  * **DMA-tile-aligned key padding** (:func:`pad_kernel_key`): the logical
    (K, 2M) = (48, 96) block minors are not int8-tile multiples and forced
    strided row-by-row key DMA; the stored key pads to (Kp, 2*Mp) =
    (64, 128) while every dot slices back to the compact shapes.
  * **prime-batched pipeline**: when the single-reduce audits hold for both
    primes, each stage runs once with a leading prime axis ((P, F) flattened
    to one matmul batch dim — Mosaic supports only one) and vectorized
    per-prime reduction constants.

Round-4 additions (each measured on the real chip; ``ROOFLINE.md`` r4):

  * **rounded-key plan** (``ctx.key_round_bits > 0``): key rounded to its
    top 32-rb bits so 2x12-bit limbs meet the CRT bound — M drops 48 -> 32.
  * **int16 lazy-residue transients** between the dots (EOC_NTT_I16).
  * **pre-scaled inverse** for 2-limb plans (``_winv_cat256_i8``): the
    c-limb scale folded into a 4F-row Winv constant — no c16 quadrant, no
    inner reduction, no lane concat on the inverse.

Measured v4 roofline: ~30.7 us/step/128-tile on v5e for the rounded plan
(~98% of the VMEM-traffic floor of this dataflow; exact plan ~40 us),
~6,200 end-to-end gate bootstraps/s/chip.  r3 state for reference: ~41 us
exact (dots ~10 us near MXU peak, barrel ~2 us, elementwise ~29 us).

Consumes the SAME key tensor layout as v1 ((n, P, F, J*R, 2*L*U*R) int8
from ``prepare_kernel_key[_np]``, then padded), so key preparation is
shared; only the NttContext (primes) differs by default.

Overflow audit (int32, K the contraction width, |int8 limb| <= 128):
  fwd:       |q| <= F*64*128 = 2^20;  q_lo + 256*q_hi <= 513*2^20 = 2^29.1
  pointwise: |P| <= K*128^2 = 786K (K=48); P00 + 512*P + c16*P
             <= 786K*(513 + 1023) = 1.21e9 < 2^30.5 (balanced_reduce domain)
  inverse:   |P| <= F*128^2 = 2.1M; needs ONE inner strict reduce of P11
             (c16*2.1M alone would reach 2.15e9): P00 + 256*(P01+P10)
             + c16*B(P11) <= 2.1M + 1.08e9 + 1023*32256 = 1.12e9  OK
  CRT:       |r2 - r1|*|inv| <= 48K * 16128 = 7.8e8  OK; |V| < p1p2/2 < 2^31
  rounded plan (key_round_bits=8, 2x12-bit limbs): true coefficient bound
             doubles (limb_max 2049: J*N*halfBg*2049 = 8.06e8 < p1p2/2 OK);
             lazy-V consistency |V|+|c| <= 1.047e9 + 8.06e8 < p1p2  OK

Reference: upstream ``tfhe_blindRotate_FFT`` (SURVEY.md §3.5 hot loop #1).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.params import GateBootstrappingParams
from . import ntt

_I32 = jnp.int32
_I8 = jnp.int8

#: Default prime pair for the v3 kernel: both === 1 mod 256 (so every F in
#: {128, 64, 32} has the needed 2F-th root), both with |balanced 2^16 mod p|
#: <= 1023 — the property that lets limb recombination skip inner reductions.
KERNEL_PRIMES = (64513, 32257)


def _wt_cat_i8(ctx: ntt.NttContext) -> np.ndarray:
    """(P, 2F, F) int8: per prime, [W^T lo; W^T hi] — forward matrix in the
    v3 2D@3D orientation (contract over t on the rhs major axis)."""
    outs = []
    for p in ctx.primes:
        W, _ = ntt._ntt_matrices_np(p, ctx.F)     # W[t, f]
        WT = W.T                                   # [f, t]
        lo = ((WT + 128) % 256) - 128
        hi = (WT - lo) >> 8
        outs.append(np.concatenate([lo, hi], axis=0))   # rows [f | f+F]
    return np.stack(outs).astype(np.int8)


def _winv_cat_i8(ctx: ntt.NttContext) -> np.ndarray:
    """(P, 2F, F) int8: per prime, [Winv^T lo; Winv^T hi] (as v1)."""
    outs = []
    for p in ctx.primes:
        _, Winv = ntt._ntt_matrices_np(p, ctx.F)   # Winv[f, t]
        WiT = Winv.T                                # [t, f] -> rows t
        lo = ((WiT + 128) % 256) - 128
        hi = (WiT - lo) >> 8
        outs.append(np.concatenate([lo, hi], axis=0))
    return np.stack(outs).astype(np.int8)


def _winv_cat256_i8(ctx: ntt.NttContext) -> np.ndarray:
    """(P, 4F, F) int8: per prime, limbs of Winv^T AND of (256*Winv^T mod p),
    rows [A_lo; A_hi; B_lo; B_hi].

    The inverse then runs as TWO dots, A @ c_lo + B @ c_hi, with the c-limb
    scale 256 folded into B — this removes the c16-weighted quadrant (and
    its extra lazy reduction + multiply) from the inverse combine entirely:
    V_raw = (qA+qB)_lo + 256*(qA+qB)_hi === Winv @ (c_lo + 256*c_hi) mod p.
    Overflow: 4 partials <= F*128^2 = 2.1e6 each; |sum| <= 2*2.1e6 +
    256*2*2.1e6 = 1.08e9 < 2^30.4 — inside the lazy-Barrett domain.
    """
    outs = []
    for p in ctx.primes:
        _, Winv = ntt._ntt_matrices_np(p, ctx.F)
        blocks = []
        for W in (Winv.T, ntt._balanced_np(256 * Winv.T, p)):
            lo = ((W + 128) % 256) - 128
            hi = (W - lo) >> 8
            blocks += [lo, hi]
        outs.append(np.concatenate(blocks, axis=0))
    return np.stack(outs).astype(np.int8)


def _bal(z, p, strict=True):
    """Balanced Barrett reduction (ops/ntt.balanced_reduce; |z| < 2^30.5)."""
    zf = z.astype(jnp.float32)
    q = jnp.round(zf * np.float32(1.0 / p)).astype(_I32)
    r = z - q * jnp.int32(p)
    if strict:
        half = jnp.int32((p - 1) // 2)
        r = r - jnp.int32(p) * (r > half).astype(_I32)
        r = r + jnp.int32(p) * (r < -half).astype(_I32)
    return r


def _split8(x):
    # Arithmetic in int32: Mosaic cannot legalize i16 shifts (arith.shrui);
    # narrow inputs are upcast in registers, only the limbs hit VMEM.
    # 4-op form: for x = 256h + l with l in [-128, 127], x + 128 has the
    # unsigned low byte l + 128, so an arithmetic >> 8 yields h directly.
    # Valid for |x| <= 32639 — including LAZY balanced residues
    # (|x| <= p/2 + 92 <= 32348 for p <= 64513).
    t = x.astype(_I32) + 128
    hi = t >> 8
    lo = (t & 255) - 128
    return lo.astype(_I8), hi.astype(_I8)


def pad_kernel_key(T8k: jax.Array | np.ndarray):
    """Pad a (n, P, F, K, 2M) kernel key to DMA-tile-aligned minors
    (n, P, F, Kp, 2*Mp) with Kp = K rounded up to 32 and Mp = M rounded up
    to 64: int8 VMEM tiles are (32, 128), and a non-aligned block minor
    forces the per-step key stream into strided row-by-row DMA — measured
    ~8-20 GB/s effective on v5e, which made the whole kernel DMA-bound
    (round-3 finding; the padded layout streams at full HBM rate).  Pad
    rows/columns are zeros: zero digit rows contribute nothing to the
    contraction and the padded output columns are sliced off.
    """
    xp = jnp if isinstance(T8k, jax.Array) else np
    n, P, F, K, M2 = T8k.shape
    M = M2 // 2
    Kp = -(-K // 32) * 32
    Mp = -(-M // 64) * 64
    if (Kp, Mp) == (K, M):
        return T8k
    out_shape = (n, P, F, Kp, 2 * Mp)
    if xp is np:
        out = np.zeros(out_shape, np.int8)
        out[:, :, :, :K, :M] = T8k[..., :M]
        out[:, :, :, :K, Mp:Mp + M] = T8k[..., M:]
        return out
    lo = T8k[..., :M]
    hi = T8k[..., M:]
    pad_k = [(0, 0)] * 3 + [(0, Kp - K), (0, Mp - M)]
    return jnp.concatenate([jnp.pad(lo, pad_k), jnp.pad(hi, pad_k)], axis=-1)


def expand_kernel_key_256(T8k: jax.Array, ctx: ntt.NttContext,
                          params: GateBootstrappingParams) -> jax.Array:
    """Fold the digit-limb scale into the key: (n, P, F, Kp, 2Mp) ->
    (n, P, F, 2K, 2Mp) with rows [A(K); B(K)], A = T, B = 256*T mod p.

    The pointwise stage then contracts [d_lo; d_hi] (2K rows) against A/B in
    ONE lane-width: chat === A@d_lo + B@d_hi === T@(d_lo + 256*d_hi) mod p —
    the quadrant lane doubling (2Bt) and the c16 term disappear, HALVING the
    pointwise dot-output traffic (the kernel's biggest tensor after q).
    Overflow: |zz_lo + 256*zz_hi| <= 2K*128^2*257 = 4.04e8 < 2^30.4 — one
    lazy Barrett suffices.  Key doubles to ~1.5 GB (HBM) / +1 MB VMEM tile;
    the step key stream grows ~1 ms/call — noise next to the ~3.4 us/step
    saved.  Row block A equals the original unpadded rows, so
    ``kernel_key_to_scan`` keeps working on the expanded key.
    """
    n, P, F, Kp, Mp2 = T8k.shape
    Mp = Mp2 // 2
    K = ctx.J * ctx.R
    U = params.tgsw_params.tlwe_params.k + 1
    M = ctx.key_limbs * U * ctx.R
    assert Kp >= K and Mp >= M
    out_blocks = []
    for pi, p in enumerate(ctx.primes):
        lo = T8k[:, pi, :, :K, :M].astype(jnp.int32)
        hi = T8k[:, pi, :, :K, Mp:Mp + M].astype(jnp.int32)
        r = lo + (hi << 8)                       # balanced residue, |r| <= p/2
        b = ntt.balanced_reduce((r << 8).astype(jnp.int32), p)   # 256*r mod p
        blo, bhi = ntt.split_i8(b)
        z = jnp.zeros((n, F, K, Mp - M), _I8)
        A = T8k[:, pi, :, :K, :].astype(_I8)
        B = jnp.concatenate([blo.astype(_I8), z, bhi.astype(_I8), z], axis=-1)
        out_blocks.append(jnp.concatenate([A, B], axis=2))  # (n, F, 2K, 2Mp)
    return jnp.stack(out_blocks, axis=1)                    # (n, P, F, 2K, 2Mp)


def blind_rotate_ntt_pallas2(acc0: jax.Array, bara: jax.Array,
                             T8k: jax.Array, ctx: ntt.NttContext,
                             params: GateBootstrappingParams,
                             block_b: int = 128,
                             interpret: bool | None = None,
                             expanded: bool | None = None) -> jax.Array:
    """Fused v3 NTT blind rotation.

    Args:
      acc0: (B, k+1, N) int32 initial accumulator (natural coeff order).
      bara: (n, B) int32 rotation amounts in [0, 2N).
      T8k:  (n, P, F, Kp, 2*Mp) int8 — ``prepare_kernel_key`` layout, padded
            by :func:`pad_kernel_key` (unpadded keys are accepted and padded
            here), primes matching ``ctx``.
      expanded: whether T8k is the [A; 256A] form from
            :func:`expand_kernel_key_256`.  Callers that know (e.g.
            ``prepare_eval_key_ntt`` via ``EvalKey.kernel_key_expanded``)
            must pass it; None falls back to shape inference, which is
            ambiguous when ``J*R == 16`` (r4 ADVICE low) and raises there.
    Returns (B, k+1, N) int32.
    """
    B, U, N = acc0.shape
    R, L = ctx.R, ctx.key_limbs
    S = R
    tg = params.tgsw_params
    # Gadget digits feed the MXU as int8: one value when |digit| <= halfBg
    # <= 128 (128-bit set, Bg=2^7), else a 2-limb split (dl=2 — the 80-bit
    # set's Bg=2^10, halfBg=512; r4 VERDICT item 5): the digit tensor
    # doubles to [d_lo(K); d_hi(K)] rows and the forward-NTT combine gains a
    # 256-weighted hi-block term (overflow audit at the combine site).
    dl = 1 if tg.halfBg <= 128 else 2
    assert tg.halfBg <= 32639, (
        f"digit magnitude {tg.halfBg} exceeds the 2-limb int8 split domain")
    J, tgl = tg.kpl, tg.l
    M = L * U * R
    US = U * S
    K = J * R
    if T8k.shape[3] == K and T8k.shape[4] == 2 * M:
        T8k = pad_kernel_key(T8k)
    n, P, F, Kp, Mp2 = T8k.shape
    Mp = Mp2 // 2
    assert F == ctx.F and Kp >= K and Mp >= M and N == R * F
    assert P == len(ctx.primes) == 2
    if expanded is None:
        # shape inference: the padded unexpanded row count is roundup(K, 32);
        # the expanded [A; B] form has 2K rows.  When those coincide
        # (J*R == 16) the layouts are indistinguishable — require the flag.
        if 2 * K == -(-K // 32) * 32 and Kp == 2 * K:
            raise ValueError(
                "expanded-key layout is ambiguous at J*R == 16; pass "
                "expanded= explicitly (see EvalKey.kernel_key_expanded)")
        expanded = Kp == 2 * K and Kp != -(-K // 32) * 32
    expanded_key = expanded
    sb = (R - 1).bit_length()          # log2 R  (s-stages)
    fb = (F - 1).bit_length()          # log2 F  (t-stages)
    assert R == 1 << sb and F == 1 << fb and 2 * N == 1 << (sb + fb + 1)

    if interpret is None:
        mosaic_ok = (B % 128 == 0)
        interpret = jax.default_backend() != "tpu" or not mosaic_ok
    Bt = min(block_b, B) if not interpret else B
    assert B % Bt == 0

    primes = ctx.primes
    p1, p2 = primes
    c16 = [int(ntt._balanced_np(np.int64(1 << 16), p)) for p in primes]
    # Single-reduce recombination audits (see module docstring); fall back to
    # an extra inner reduce if a caller picks large-c16 primes.
    pw_bound = [K * 128 * 128 * (513 + abs(c)) for c in c16]
    pw_single = [b < 2 ** 30.4 for b in pw_bound]
    inv_bound = [F * 128 * 128 * 513 + abs(c16[i]) * ((primes[i] - 1) // 2 + 92)
                 for i in range(P)]
    inv_single = [b < 2 ** 31 - 2 ** 28 for b in inv_bound]
    # Prime-batched single-op pipeline requires the single-reduce audits to
    # hold for BOTH primes (true for KERNEL_PRIMES); otherwise the per-prime
    # loop with its extra inner reductions runs.
    batched_primes = P == 2 and all(pw_single) and all(inv_single)
    crt_inv = int(ntt._balanced_np(np.int64(pow(p1, p2 - 2, p2)), p2))
    kbits = ctx.key_limb_bits
    rb = ctx.key_round_bits

    WfT = jnp.asarray(_wt_cat_i8(ctx))     # (P, 2F, F)
    # Pre-scaled 4F-row inverse (c16 quadrant folded away) wins on the
    # rounded 2-limb plan (M=32: 32.8 -> 30.7 us/step-tile measured) but
    # REGRESSES the exact 3-limb plan (M=48: 40.4 -> 48.5) — Mosaic
    # schedules the two narrower dots worse at that width.  Gate by plan.
    _ps_env = os.environ.get("EOC_NTT_PRESCALE")
    prescaled_inv = batched_primes and (
        (_ps_env == "1") if _ps_env is not None else ctx.key_limbs == 2)
    Wi = jnp.asarray(_winv_cat256_i8(ctx) if prescaled_inv
                     else _winv_cat_i8(ctx))
    # int16 transients for the lazy residues between the dots: |r| <=
    # p/2+92 <= 32348 fits int16, halving the VMEM traffic of the dhat/chat
    # stages.  PLAN-DEPENDENT like the pre-scaled inverse: it won -1.4
    # us/step-tile on the (since-retracted) 2-limb plan but measured a
    # ~1.6% REGRESSION on the 3-limb exact plan (r5: 4,846/s i16-off vs
    # 4,770 on; Mosaic schedules the M=48 casts worse).  EOC_NTT_I16
    # overrides either way.
    i16_env = os.environ.get("EOC_NTT_I16")
    i16 = (i16_env == "1") if i16_env is not None else ctx.key_limbs == 2

    def kernel(bara_ref, acc0_ref, T_ref, wf_ref, wi_ref, out_ref, acc):
        # Grid is (n, n_btiles) with the STEP on the outer axis: the 2 MB key
        # tile for step i is DMA'd once and reused by every batch tile (the
        # whole batch stays resident in the acc scratch), so key traffic is
        # independent of B — at (bt, i) order a B=2048 batch would re-stream
        # the full key 16x.
        i = pl.program_id(0)
        bt = pl.program_id(1)
        sl = pl.ds(pl.multiple_of(bt * Bt, Bt), Bt)

        @pl.when(i == 0)
        def _():
            acc[:, :, :, sl] = acc0_ref[:]

        bara_i = bara_ref[:]                        # (1, 1, Bt) int32 [0,2N)

        def bit(k):
            return (((bara_i >> k) & 1) > 0).reshape(1, 1, 1, Bt)

        # ---- rotation barrel: x = X^a * acc, a = a_t*R + a_s ----
        # pltpu.roll is the native lane/sublane rotate; jnp.roll lowers to
        # slice+concat copies.
        a = acc[:, :, :, sl]                        # (F, U, S, Bt)
        x = a
        siota = jax.lax.broadcasted_iota(_I32, (1, 1, S, 1), 2)
        fiota = jax.lax.broadcasted_iota(_I32, (F, 1, 1, 1), 0)
        roll = pltpu.roll if not interpret else jnp.roll
        for k in range(sb):                         # X^{a_s}: subpoly shift
            sh = 1 << k
            r1 = roll(x, sh, 2)
            rz = roll(r1, 1, 0)                     # Z-carry on wrapped rows
            rz = jnp.where(fiota < 1, -rz, rz)
            rolled = jnp.where(siota < sh, rz, r1)
            x = jnp.where(bit(k), rolled, x)
        for k in range(fb):                         # Z^{a_t mod F}
            c = 1 << k
            r1 = roll(x, c, 0)
            rolled = jnp.where(fiota < c, -r1, r1)
            x = jnp.where(bit(sb + k), rolled, x)
        x = jnp.where(bit(sb + fb), -x, x)          # Z^F = -1

        d = (x - a).astype(_I32)                    # (F, U, S, Bt)

        # ---- gadget decomposition -> (F, K, Bt) int8, rows (j, s) ----
        # (the key's Kp/Mp padding exists for DMA tile alignment only; all
        # dots below slice the valid K rows / M columns so the MXU outputs
        # and the VMEM elementwise traffic stay at the compact sizes)
        du = d.astype(jnp.uint32) + jnp.uint32(tg.offset)
        pieces = []
        for u in range(U):
            for li in range(tgl):
                dig = ((du[:, u] >> jnp.uint32(32 - (li + 1) * tg.Bgbit))
                       & jnp.uint32(tg.maskMod)).astype(_I32) - jnp.int32(tg.halfBg)
                pieces.append(dig)                  # (F, S, Bt)
        digits = jnp.concatenate(pieces, axis=1)    # (F, K, Bt) int32
        if dl == 2:
            # 2-limb digit split (halfBg > 128): rows [d_lo(K); d_hi(K)],
            # d = d_lo + 256*d_hi with d_lo in [-128,127], |d_hi| <=
            # (halfBg+128)/256 (<= 3 at Bg=2^10).  Same 4-op split as the
            # residue transients.
            d_lo, d_hi = _split8(digits)
            x8 = jnp.concatenate([d_lo, d_hi], axis=1)     # (F, 2K, Bt)
        else:
            x8 = digits.astype(_I8)                 # (F, K, Bt)

        # ---- both primes batched: fwd NTT -> pointwise -> inverse ----
        # One op per stage for BOTH primes (prime axis leading, reductions
        # vectorized over a per-prime constant vector) — halves the Mosaic
        # op count of the NTT pipeline relative to a per-prime loop.
        if batched_primes:
            # per-prime constant vectors built from iota + scalar selects
            # (pallas_call rejects captured array constants of any kind)
            pidx = jax.lax.broadcasted_iota(_I32, (P, 1, 1, 1), 0)
            first = pidx == 0
            pvi = jnp.where(first, jnp.int32(p1), jnp.int32(p2))
            pvf = jnp.where(first, np.float32(1.0 / p1), np.float32(1.0 / p2))
            halfv = (pvi - 1) // 2
            c16v = jnp.where(first, jnp.int32(c16[0]), jnp.int32(c16[1]))

            def balv(z, strict=True):
                zf = z.astype(jnp.float32)
                qq = jnp.round(zf * pvf).astype(_I32)
                r = z - qq * pvi
                if strict:
                    r = r - pvi * (r > halfv).astype(_I32)
                    r = r + pvi * (r < -halfv).astype(_I32)
                return r

            # Lazy (non-strict) reductions throughout: |r| <= p/2 + 92 <=
            # 32348 still fits the int8 split domain (32639, hi limb <= 127),
            # every downstream overflow audit tolerates the +92 slack, and
            # the CRT stays exact with lazy residues (|V| <= p/2+92 +
            # (p2/2)*p1 ~ 1.047e9 and |c| <= 4.03e8, so |V - c| < p1*p2
            # forces V = c).  Only the CRT quotient t stays strict.
            # fwd: both primes' matrices stacked on ROWS — one unbatched
            # 2D@3D dot, no rhs broadcast materialization.
            q = jax.lax.dot_general(
                wf_ref[:].reshape(P * 2 * F, F), x8,
                (((1,), (0,)), ((), ())),
                preferred_element_type=_I32).reshape(P, 2 * F, dl * K, Bt)
            if dl == 2:
                # NTT(d) = NTT(d_lo) + 256*NTT(d_hi) (linearity).  Audits:
                # lo block |q| <= F*128*128 = 2^21, raw combine <= 513*2^21
                # = 2^30.0 < 2^30.5 (balv domain); hi block |q| <= F*128*
                # ceil(halfBg/256+1) = 2^15.6 (Bg=2^10), its lazy residue
                # <= p/2+92, so the outer raw sum <= 2^30.0 + 32348*256 =
                # 2^30.1 — still in-domain.  One extra balv on (F, K) rows.
                dB = balv(q[:, :F, K:] + (q[:, F:, K:] << 8), strict=False)
                dhat = balv(q[:, :F, :K] + (q[:, F:, :K] << 8) + (dB << 8),
                            strict=False)
            else:
                dhat = balv(q[:, :F] + (q[:, F:] << 8), strict=False)
            if i16:
                # lazy residues |r| <= p/2+92 <= 32348 fit int16; halves the
                # VMEM traffic of the transient if Mosaic materializes it
                dhat = dhat.astype(jnp.int16)
            lo, hi = _split8(dhat)

            # Mosaic supports one matmul batch dim: flatten (P, F) -> P*F
            # (major-axis reshape, free).
            if expanded_key:
                # Expanded [A; B] key (expand_kernel_key_256): the digit-limb
                # scale lives in the B rows, so the contraction runs over
                # 2K = [d_lo; d_hi] rows and the dot outputs carry Bt lanes
                # (not 2Bt) and need no c16 term — half the pointwise
                # dot-output traffic of the quadrant form.
                dcat = jnp.concatenate([lo, hi], axis=2)   # (P, F, 2K, Bt)
                dcf = dcat.reshape(P * F, 2 * K, Bt)
                T2_lo = T_ref[0, :, :, :, :M].reshape(P * F, 2 * K, M)
                T2_hi = T_ref[0, :, :, :, Mp:Mp + M].reshape(P * F, 2 * K, M)
                zz_lo = jax.lax.dot_general(
                    T2_lo, dcf, (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=_I32).reshape(P, F, M, Bt)
                zz_hi = jax.lax.dot_general(
                    T2_hi, dcf, (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=_I32).reshape(P, F, M, Bt)
                # |zz_lo + 256*zz_hi| <= 2K*128^2*257 = 4.04e8 < 2^30.4
                chat = balv(zz_lo + (zz_hi << 8), strict=False)
            elif os.environ.get("EOC_NTT_PW4") == "1":
                # four quadrant dots on the bare limb tensors — skips the
                # (P, F, K, 2Bt) lane-concat copy of d8, but measured ~1.8us
                # SLOWER on v5e (extra dot dispatches outweigh the copy);
                # kept as an off-default probe toggle
                dlo = lo.reshape(P * F, K, Bt)
                dhi = hi.reshape(P * F, K, Bt)
                T_lo = T_ref[0, :, :, :K, :M].reshape(P * F, K, M)
                T_hi = T_ref[0, :, :, :K, Mp:Mp + M].reshape(P * F, K, M)

                def pwdot(Tm, dm):
                    return jax.lax.dot_general(
                        Tm, dm, (((1,), (1,)), ((0,), (0,))),
                        preferred_element_type=_I32).reshape(P, F, M, Bt)

                P00 = pwdot(T_lo, dlo)
                P01 = pwdot(T_hi, dlo)
                P10 = pwdot(T_lo, dhi)
                P11 = pwdot(T_hi, dhi)
                chat = balv(P00 + ((P01 + P10) << 8) + P11 * c16v,
                            strict=False)
            else:
                d8 = jnp.concatenate([lo, hi], axis=3)  # (P, F, K, 2Bt)
                d8f = d8.reshape(P * F, K, 2 * Bt)
                T_lo = T_ref[0, :, :, :K, :M].reshape(P * F, K, M)
                T_hi = T_ref[0, :, :, :K, Mp:Mp + M].reshape(P * F, K, M)
                zz_lo = jax.lax.dot_general(
                    T_lo, d8f, (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=_I32).reshape(P, F, M, 2 * Bt)
                zz_hi = jax.lax.dot_general(
                    T_hi, d8f, (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=_I32).reshape(P, F, M, 2 * Bt)
                chat = balv(zz_lo[..., :Bt]
                            + ((zz_hi[..., :Bt] + zz_lo[..., Bt:]) << 8)
                            + zz_hi[..., Bt:] * c16v,
                            strict=False)
            if i16:
                chat = chat.astype(jnp.int16)
            clo, chi = _split8(chat)                    # (P, F, M, Bt) each
            if prescaled_inv:
                # Two dots against the pre-scaled inverse matrix (A = Winv,
                # B = 256*Winv mod p; see _winv_cat256_i8): the c-limb scale
                # is folded into B, so the combine needs no c16 quadrant, no
                # inner reduction, and no c8 lane concat.
                qA = jax.lax.dot_general(
                    wi_ref[:, :2 * F], clo, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=_I32)        # (P, 2F, M, Bt)
                qB = jax.lax.dot_general(
                    wi_ref[:, 2 * F:], chi, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=_I32)
                qs = qA + qB
                vpv = balv(qs[:, :F] + (qs[:, F:] << 8), strict=False)
            else:
                c8 = jnp.concatenate([clo, chi], axis=2)   # (P, F, 2M, Bt)
                qv = jax.lax.dot_general(
                    wi_ref[:], c8, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=_I32)        # (P, 2F, 2M, Bt)
                vpv = balv(qv[:, :F, :M]
                           + ((qv[:, :F, M:] + qv[:, F:, :M]) << 8)
                           + balv(qv[:, F:, M:], strict=False) * c16v,
                           strict=False)
            if os.environ.get("EOC_NTT_I16V") == "1":
                # inverse-output narrowing: measured neutral-to-slightly-
                # negative on v5e (probe r4), kept as an off-default toggle
                vpv = vpv.astype(jnp.int16)
            vp = [vpv[0], vpv[1]]
        else:
            vp = []
        for pi in range(P if not batched_primes else 0):
            p = primes[pi]
            q = jax.lax.dot_general(
                wf_ref[pi], x8, (((1,), (0,)), ((), ())),
                preferred_element_type=_I32)        # (2F, dl*K, Bt)
            if dl == 2:   # digit-limb combine (same audit as batched path)
                dB = _bal(q[:F, K:] + (q[F:, K:] << 8), p, strict=False)
                q = q[:, :K]
                dhat = _bal(q[:F] + (q[F:] << 8) + (dB << 8), p)
            else:
                dhat = _bal(q[:F] + (q[F:] << 8), p)
            # int16 narrowing: strict-balanced residues fit int16; halves the
            # VMEM traffic of the transient (the kernel is traffic-bound).
            dhat = dhat.astype(jnp.int16)
            lo, hi = _split8(dhat)
            d8 = jnp.concatenate([lo, hi], axis=2)  # (F, K, 2Bt)

            zz_lo = jax.lax.dot_general(
                T_ref[0, pi, :, :K, :M], d8, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=_I32)        # (F, M, 2Bt)
            zz_hi = jax.lax.dot_general(
                T_ref[0, pi, :, :K, Mp:Mp + M], d8,
                (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=_I32)        # (F, M, 2Bt)
            P00 = zz_lo[:, :, :Bt]
            P01 = zz_hi[:, :, :Bt]
            P10 = zz_lo[:, :, Bt:]
            P11 = zz_hi[:, :, Bt:]
            if pw_single[pi]:
                chat = _bal(P00 + ((P01 + P10) << 8)
                            + P11 * jnp.int32(c16[pi]), p)
            else:
                chat = _bal(P00 + (_bal(P01 + P10, p) << 8)
                            + _bal(P11, p) * jnp.int32(c16[pi]), p)
            chat = chat.astype(jnp.int16)

            clo, chi = _split8(chat)
            c8 = jnp.concatenate([clo, chi], axis=1)     # (F, 2M, Bt)
            qv = jax.lax.dot_general(
                wi_ref[pi], c8, (((1,), (0,)), ((), ())),
                preferred_element_type=_I32)        # (2F, 2M, Bt)
            Q00 = qv[:F, :M]
            Q01 = qv[:F, M:]
            Q10 = qv[F:, :M]
            Q11 = qv[F:, M:]
            if inv_single[pi]:
                vp.append(_bal(Q00 + ((Q01 + Q10) << 8)
                               + _bal(Q11, p, strict=False)
                               * jnp.int32(c16[pi]), p))
            else:
                vp.append(_bal(Q00 + (_bal(Q01 + Q10, p) << 8)
                               + _bal(Q11, p) * jnp.int32(c16[pi]), p))

        # ---- CRT + key-limb recombination + accumulate ----
        # lazy t is safe: |V| <= (p/2+92) + (p2/2+92)*p1 ~ 1.05e9 < 2^31 and
        # |V - c| < p1*p2 still forces V = c exactly.
        t = _bal((vp[1].astype(_I32) - vp[0].astype(_I32)) * jnp.int32(crt_inv),
                 p2, strict=False)
        V = (vp[0].astype(_I32) + t * jnp.int32(p1)).astype(_I32)  # (F,M,Bt)
        out_t = V[:, :US, :]
        for li in range(1, L):
            out_t = (out_t
                     + (V[:, li * US:(li + 1) * US, :]
                        << jnp.int32(kbits * li))).astype(_I32)  # (F, US, Bt)
        if rb:
            # rounded-key plan: every limb carries the extra 2^rb scale
            out_t = (out_t << jnp.int32(rb)).astype(_I32)
        acc[:, :, :, sl] = (a + out_t.reshape(F, U, S, Bt)).astype(_I32)

        @pl.when(i == n - 1)
        def _():
            out_ref[:] = acc[:, :, :, sl]

    # ---- host-side plumbing: natural (B, U, N) <-> (F, U, S, B) ----
    def to_perm(x):                                  # N index m = t*R + s
        x4 = x.reshape(B, U, F, S)
        return jnp.transpose(x4, (2, 1, 3, 0))       # (F, U, S, B)

    def from_perm(y):
        y4 = jnp.transpose(y, (3, 1, 0, 2))          # (B, U, F, S)
        return y4.reshape(B, U, N)

    acc0p = to_perm(acc0)
    bara3 = bara.astype(jnp.int32)[:, None, :]       # (n, 1, B)

    # The whole per-call batch is VMEM-resident (16 MB at Bc=2048); larger
    # batches run as sequential chunked calls.  Bc is the largest Bt-multiple
    # divisor of B within the residency cap, so any Bt-multiple batch chunks
    # cleanly (bootstrap_woKS pads B to a multiple of 128 = Bt; e.g. a user
    # batch of 3000 arrives as 3072 and runs as 2 x 1536 — ADVICE r3).
    MAX_RESIDENT_B = int(os.environ.get("EOC_NTT_RESIDENT_B", "2048"))
    Bc = B
    if not interpret and B > MAX_RESIDENT_B:
        Bc = max(d for d in range(Bt, MAX_RESIDENT_B + 1, Bt) if B % d == 0)
    assert B % Bc == 0 and Bc % Bt == 0

    def call_one(acc0p_c, bara3_c):
        n_bt = Bc // Bt
        flops = 2 * n * Bc * P * (2 * F * F * Kp + F * Kp * 2 * Mp * 2
                                  + 2 * F * F * 2 * M)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((F, U, S, Bc), jnp.int32),
            grid=(n, n_bt),
            in_specs=[
                pl.BlockSpec((1, 1, Bt), lambda i, bt: (i, 0, bt),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((F, U, S, Bt), lambda i, bt: (0, 0, 0, bt),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, P, F, Kp, 2 * Mp),
                             lambda i, bt: (i, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((P, 2 * F, F), lambda i, bt: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(tuple(Wi.shape), lambda i, bt: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((F, U, S, Bt), lambda i, bt: (0, 0, 0, bt),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((F, U, S, Bc), jnp.int32),    # resident batch acc
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(flops=flops,
                                          bytes_accessed=T8k.size,
                                          transcendentals=0),
            interpret=interpret,
        )(bara3_c, acc0p_c, T8k, WfT, Wi)

    if B == Bc:
        out = call_one(acc0p, bara3)
    else:
        outs = [call_one(acc0p[..., c * Bc:(c + 1) * Bc],
                         bara3[..., c * Bc:(c + 1) * Bc])
                for c in range(B // Bc)]
        out = jnp.concatenate(outs, axis=-1)
    return from_perm(out)


@functools.lru_cache(maxsize=None)
def kernel_context(N: int, J: int, halfBg: int, R: int | None = None,
                   key_round_bits: int = 0) -> ntt.NttContext:
    """NttContext with the v3 kernel's default prime pair."""
    return ntt.make_context(N=N, J=J, halfBg=halfBg, R=R, primes=KERNEL_PRIMES,
                            key_round_bits=key_round_bits)


def kernel_context_for_params(params: GateBootstrappingParams,
                              rounded: bool = False) -> ntt.NttContext:
    """``rounded=True`` selects the v4 fast plan: the key is rounded so a
    2-limb split meets the CRT bound (rb=8 -> 2x12-bit limbs at the 128-bit
    set), trading ~1/3 of the pointwise/inverse work for an accounted
    key-rounding noise term comparable to the inherent bootstrap noise —
    the same trade the reference's f64 FFT makes (its rounding is absorbed
    into ciphertext noise; ``/root/reference/build.sh:54-57``)."""
    tg = params.tgsw_params
    rb = 0
    if rounded:
        rb = ntt.choose_rounded_plan(tg.kpl, tg.tlwe_params.N, tg.halfBg,
                                     n_steps=params.n,
                                     bk_variance=float(tg.tlwe_params.alpha_min) ** 2,
                                     primes=KERNEL_PRIMES)
    return kernel_context(N=tg.tlwe_params.N, J=tg.kpl, halfBg=tg.halfBg,
                          key_round_bits=rb)
