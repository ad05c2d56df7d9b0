"""Gate bootstrapping: blind rotation, sample extraction, key switching.

TPU-native re-implementation of upstream ``lwe-bootstrapping-functions[-fft].cpp``
(SURVEY.md §3.5 — the north-star hot path). Differences from the reference:

  * Batched: every function maps over leading batch dims; the blind-rotate
    loop is a single ``lax.scan`` over the n TGSW rows with the whole batch
    advancing together (the reference loops one sample at a time).
  * The per-iteration CMux uses the exact int8-limb MXU external product
    (``ops/polymul.small_by_torus_matmul``) instead of f64 FFTs; results are
    exact mod 2^32, so the default (full-limb) key forms add strictly less
    noise than the reference's FFT rounding. (The optional rounded-key fast
    form, ``prepare_eval_key_fused(limbs<4)``, trades a bounded, accounted
    key-rounding error for fewer MACs — see the variance bookkeeping in
    :func:`bootstrap_woKS`.)
  * ``bara_i == 0`` iterations are algebraically no-ops here (decompose(0)=0),
    so the reference's ``continue`` needs no branch.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .params import GateBootstrappingParams
from .numeric import mod_switch_from_torus32
from .lwe import LweCiphertext
from .tlwe import TLweCiphertext, tlwe_noiseless_trivial, tlwe_extract_lwe_sample
from .tgsw import decompose_h
from .keys import BootstrappingKey, CloudKeySet
from ..ops import polymul, rotate
from ..ops.keyswitch import prepare_keyswitch_matmul, keyswitch_apply


#: Valid EvalKey fast-path forms, in dispatch-precedence order (VERDICT r2
#: item 10 — one explicit form instead of four optional fields with implicit
#: precedence).
EVAL_KEY_FORMS = ("ntt_kernel", "ntt_scan", "compact", "rows")

#: Kernel-key layout version — bump when the fused kernel's key layout or
#: its NTT plan encoding changes, so stale disk caches can never load
#: (round-2 ADVICE medium finding).
KERNEL_KEY_LAYOUT_VERSION = 4   # v4: DMA-tile-aligned padded key minors


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class EvalKey:
    """Device-prepared evaluation key (the analog of the reference's
    ``LweBootstrappingKeyFFT`` — precomputed fast-path form of the cloud keys).

    Exactly one fast-path form is active, named by ``form``; the matching
    field is non-None (validated by :func:`_check_eval_key`)."""

    bk_rows: jax.Array      # (n, kpl, k+1, N) int32 TGSW rows
    bk_variance: jax.Array  # () float32
    ks_prepared: jax.Array  # (n_in*t*base, (n_out+1)*LIMBS) bf16 limbs
    ks: object              # KeySwitchKey (for metadata/variance)
    # Optional compact limb form for the fused Pallas blind rotation
    # ((n, (k+1)*LIMBS*kpl, N) int8, ~31 MB at 128-bit params); Toeplitz
    # blocks are built inside the kernel.
    bk_compact: jax.Array | None = None
    # Optional CRT-NTT form (ops/ntt.py): exact mod 2^32 at ~1/6 the MAC
    # count of the Toeplitz paths.
    bk_ntt: object | None = None       # ops.ntt.NttKey
    ntt_ctx: object | None = None      # ops.ntt.NttContext
    # Optional kernel-layout NTT key for the fused Pallas blind rotation
    # ((n, P, F, J*R, 2*L*(k+1)*R) int8 — ops/pallas_ntt_blindrot2).  Batches
    # are padded to the kernel tile.
    bk_ntt_kernel: jax.Array | None = None
    #: Which fast path this key is prepared for (static metadata).
    form: str = dataclasses.field(default="rows", metadata=dict(static=True))
    #: Whether bk_ntt_kernel is the expanded [A; 256A] layout
    #: (ops/pallas_ntt_blindrot2.expand_kernel_key_256) — explicit flag, not
    #: inferred from padding shape (r4 ADVICE low).
    kernel_key_expanded: bool = dataclasses.field(
        default=False, metadata=dict(static=True))

    @property
    def n(self) -> int:
        return self.bk_rows.shape[0]


def _check_eval_key(ek: EvalKey) -> EvalKey:
    """Validate form/field consistency at construction time (not in a scan)."""
    if ek.form not in EVAL_KEY_FORMS:
        raise ValueError(f"unknown EvalKey form {ek.form!r}; "
                         f"expected one of {EVAL_KEY_FORMS}")
    need = {"ntt_kernel": ek.bk_ntt_kernel, "ntt_scan": ek.bk_ntt,
            "compact": ek.bk_compact, "rows": ek.bk_rows}[ek.form]
    if need is None:
        raise ValueError(f"EvalKey form {ek.form!r} requires its key field")
    if ek.form in ("ntt_kernel", "ntt_scan") and ek.ntt_ctx is None:
        raise ValueError(f"EvalKey form {ek.form!r} requires ntt_ctx")
    return ek


def prepare_eval_key(cloud: CloudKeySet) -> EvalKey:
    """Standard evaluation key (per-step Toeplitz construction, low memory)."""
    bk = cloud.bk
    return _check_eval_key(
        EvalKey(bk_rows=bk.bk, bk_variance=bk.bk_variance,
                ks_prepared=prepare_keyswitch_matmul(bk.ks), ks=bk.ks,
                form="rows"))


def prepare_eval_key_fused(cloud: CloudKeySet, limbs: int | None = None) -> EvalKey:
    """Evaluation key with the compact limb key for the fused Pallas kernel.

    Default (None/4) is exact.  ``limbs=3`` selects the Toeplitz
    rounded-key form — DEMOTED by the r5 retraction along with the NTT
    rounded plans (the fixed-per-key rounding error accumulates
    ~coherently over the n blind-rotate steps, ~10x the old incoherent
    model's sigma at production step counts; ROOFLINE.md "ROUND-5
    RETRACTION").  The coherent variance rail now accounts it honestly;
    use sub-exact limb counts only where that rail's margin allows.
    """
    from ..ops import pallas_blindrot, polymul
    ek = prepare_eval_key(cloud)
    ek.bk_compact = pallas_blindrot.prepare_compact_bk(
        ek.bk_rows, limbs=polymul.LIMBS if limbs is None else limbs)
    ek.form = "compact"
    return _check_eval_key(ek)


def prepare_eval_key_chunked(cloud: CloudKeySet,
                             params: GateBootstrappingParams | None = None,
                             chunk: int = 128) -> EvalKey:
    """Back-compat alias for :func:`prepare_eval_key_fused`.

    The batch chunk is a kernel-call parameter now (``block_b``), not baked
    into the key; a non-default ``chunk`` is rejected rather than silently
    ignored (ADVICE r3 weak #6).  ``params`` is unused (kept for the old
    call signature) — the fused form derives everything from the cloud key.
    """
    del params
    if chunk != 128:
        raise ValueError(
            "prepare_eval_key_chunked no longer bakes the chunk into the "
            f"key (got chunk={chunk}); pass block_b to the kernel call, or "
            "use prepare_eval_key_fused()")
    return prepare_eval_key_fused(cloud)


def _attach_scan_form(ek: EvalKey, ctx, small_batch: bool) -> EvalKey:
    """Derive the XLA-scan key form from the kernel layout (one device
    transpose; ops/pallas_ntt_blindrot.kernel_key_to_scan) so small batches
    can skip the Pallas dispatch (SMALL_BATCH_CUTOVER)."""
    if small_batch and ek.bk_ntt_kernel is not None and ek.bk_ntt is None:
        from ..ops import ntt, pallas_ntt_blindrot
        U = int(ek.bk_rows.shape[2])
        relayout = jax.jit(partial(pallas_ntt_blindrot.kernel_key_to_scan,
                                   ctx=ctx, U=U))
        ek.bk_ntt = ntt.NttKey(T8=relayout(ek.bk_ntt_kernel),
                               variance=ek.bk_variance)
    return ek



def _device_ctx(ctx):
    """Device-resident copy of the NTT context arrays for the EvalKey.

    Two placements, deliberately different (r5 review finding + the r5
    keygen fix): ``make_context`` keeps HOST numpy so build graphs that
    close over the context lower without a device->host constant fetch
    (seconds through the relay); but as EvalKey fields the arrays travel as
    jit ARGUMENTS on every gate call, where numpy leaves are re-uploaded
    host->device per call (~3.7 ms/call measured on the relay) — so the
    finished key carries device copies."""
    return dataclasses.replace(ctx, Wf8=jnp.asarray(ctx.Wf8),
                               Wi8=jnp.asarray(ctx.Wi8),
                               omega=jnp.asarray(ctx.omega))


def _maybe_expand_kernel_key(ek: EvalKey, ctx, params) -> EvalKey:
    """Optional expanded [A; 256A mod p] kernel key
    (ops/pallas_ntt_blindrot2.expand_kernel_key_256): halves the pointwise
    dot-output traffic but doubles the key stream and narrows the
    contraction to 96 rows — measured NET SLOWER end-to-end on v5e (5,910
    vs 6,235/s), so it stays off unless EOC_NTT_EXPAND_KEY=1."""
    if (ek.bk_ntt_kernel is not None and ctx.key_limbs == 2
            and os.environ.get("EOC_NTT_EXPAND_KEY") == "1"):
        from ..ops import pallas_ntt_blindrot2
        expand = jax.jit(partial(pallas_ntt_blindrot2.expand_kernel_key_256,
                                 ctx=ctx, params=params))
        ek.bk_ntt_kernel = expand(ek.bk_ntt_kernel)
        ek.kernel_key_expanded = True
    return ek


#: Batches below this use the XLA-scan blind rotation even when the fused
#: Pallas kernel key is available: a Pallas dispatch costs ~26 ms through
#: the axon relay (scripts/probes/tpu_probe5.py) and the kernel always pays
#: a full 128-lane tile, so at B<~8 the scan path is faster end-to-end
#: (measured round 4: B=1 NAND 47 ms kernel vs 33 ms scan;
#: scripts/probes/tpu_b1_probe.py).
SMALL_BATCH_CUTOVER = 8


def prepare_eval_key_ntt(cloud: CloudKeySet,
                         params: GateBootstrappingParams,
                         kernel: str | bool = "auto",
                         rounded: bool = False,
                         small_batch: str | bool = "auto") -> EvalKey:
    """Evaluation key in CRT-NTT form (``ops/ntt.py``) — the fast path.

    The analog of the reference's FFT-converted ``LweBootstrappingKeyFFT``
    (upstream ``tfhe_createLweBootstrappingKey`` FFT conversion): the TGSW
    rows are limb-split, negacyclic-NTT'd per CRT prime, and expanded into
    the outer-twisted contraction tensor consumed by the hot loop.

    ``kernel``: store the key in the fused v3/v4 Pallas kernel layout
    (``ops/pallas_ntt_blindrot2``, prime pair ``KERNEL_PRIMES``) instead of
    the XLA-scan layout (``ntt.DEFAULT_PRIMES``).  "auto" enables it on TPU.
    The two paths are bit-exact against each other (tests/test_pallas_ntt.py).

    ``rounded``: the v4 fast plan — key rounded to its top 32-rb bits so a
    2-limb split meets the CRT bound (rb=8 at the 128-bit set).  The NTT
    stays exact *on the rounded key*; the rounding error is an accounted
    noise term (``bootstrap_woKS``) comparable to the inherent bootstrap
    noise — the reference's own f64-FFT trade.  Decrypted outputs remain
    bit-exact vs reference vectors (tests/test_reference_oracle.py).
    """
    from ..ops import ntt, pallas_ntt_blindrot2
    ek = prepare_eval_key(cloud)
    explicit_kernel = kernel is True
    if kernel == "auto":
        kernel = jax.default_backend() == "tpu"
    # Digit magnitude: the kernel handles |digit| <= 128 as single int8
    # values and larger bases (80-bit set: Bg=2^10, halfBg=512) via its
    # 2-limb digit split (r5 — previously only the XLA-scan path could;
    # the r4 lockout is gone).  The split domain caps at 32639; beyond it
    # auto falls back to the scan path, an EXPLICIT kernel=True raises
    # rather than silently downgrading (r5 review finding).
    if kernel and params.tgsw_params.halfBg > 32639:
        if explicit_kernel:
            raise ValueError(
                f"fused kernel digit split requires halfBg <= 32639 (got "
                f"{params.tgsw_params.halfBg}); use kernel='auto' or False")
        kernel = False
    if small_batch == "auto":
        small_batch = bool(kernel) and jax.default_backend() == "tpu"
    if kernel:
        ctx = pallas_ntt_blindrot2.kernel_context_for_params(params, rounded)
    else:
        ctx = ntt.context_for_params(params, rounded)
    ek.ntt_ctx = ctx
    ek.form = "ntt_kernel" if kernel else "ntt_scan"

    def _finish(ek):
        # finished keys carry DEVICE context arrays (gate-call arguments);
        # the host copy above stays for the build closures — see _device_ctx
        ek.ntt_ctx = _device_ctx(ek.ntt_ctx)
        return _check_eval_key(ek)

    # Optional disk cache of the prepared form: EOC_NTT_KEY_CACHE=<dir>.
    # Keyed by the raw TGSW rows AND the full NTT plan + layout version, and
    # validated on load (round-2 ADVICE: a plan or layout change must never
    # silently load a stale key).
    cache_path = None
    expected_shape = None
    cache_dir = os.environ.get("EOC_NTT_KEY_CACHE")
    n, J, U, N = ek.bk_rows.shape
    if kernel:
        K = ctx.J * ctx.R
        M = ctx.key_limbs * int(U) * ctx.R
        Kp = -(-K // 32) * 32
        Mp = -(-M // 64) * 64
        expected_shape = (int(n), len(ctx.primes), ctx.F, Kp, 2 * Mp)
    if cache_dir:
        import hashlib
        bk_np = np.asarray(ek.bk_rows)
        plan = (f"v{KERNEL_KEY_LAYOUT_VERSION}-p{'.'.join(map(str, ctx.primes))}"
                f"-R{ctx.R}-L{ctx.key_limbs}b{ctx.key_limb_bits}"
                f"-rb{ctx.key_round_bits}")
        h = hashlib.sha1(bk_np.tobytes() + plan.encode()).hexdigest()[:16]
        form = "kern" if kernel else "scan"
        cache_path = os.path.join(cache_dir, f"ntt-{form}-{plan}-{h}.npy")
        if os.path.exists(cache_path):
            T8c = np.load(cache_path)
            ok = T8c.dtype == np.int8 and (
                expected_shape is None or T8c.shape == expected_shape)
            if not ok:
                T8c = None  # stale/mismatched — rebuild below
            elif kernel:
                ek.bk_ntt_kernel = jnp.asarray(T8c)
                _attach_scan_form(ek, ctx, small_batch)
                return _finish(_maybe_expand_kernel_key(ek, ctx, params))
            else:
                ek.bk_ntt = ntt.NttKey(T8=jnp.asarray(T8c),
                                       variance=ek.bk_variance)
                return _finish(ek)

    # Build the prepared key.  On a real TPU the build MUST run on device:
    # the transform is seconds of device work on a 31 MB input, whereas
    # shipping the ~743 MB prepared tensor through the axon relay runs at
    # ~6 MB/s (measured round 3) — minutes of pure transfer.  On CPU the
    # numpy fast path wins (no XLA compile of the build graph).
    if kernel and jax.default_backend() == "tpu":
        from ..ops import pallas_ntt_blindrot

        @jax.jit
        def build(rows):
            key_dev = ntt.prepare_key_ntt(rows, ctx, variance=0.0)
            return pallas_ntt_blindrot2.pad_kernel_key(
                pallas_ntt_blindrot.prepare_kernel_key(key_dev, ctx))

        ek.bk_ntt_kernel = build(jnp.asarray(ek.bk_rows))
        jax.block_until_ready(ek.bk_ntt_kernel)
        if cache_path:
            # cache write would pull 743 MB back through the relay — skip.
            pass
        _attach_scan_form(ek, ctx, small_batch)
        return _finish(_maybe_expand_kernel_key(ek, ctx, params))
    if kernel:
        T8c = pallas_ntt_blindrot2.pad_kernel_key(
            ntt.prepare_kernel_key_fast_np(np.asarray(ek.bk_rows), ctx))
        assert T8c.shape == expected_shape, (T8c.shape, expected_shape)
        ek.bk_ntt_kernel = jnp.asarray(T8c)
        _attach_scan_form(ek, ctx, small_batch)
        _maybe_expand_kernel_key(ek, ctx, params)
    else:
        key_np = ntt.prepare_key_ntt_np(np.asarray(ek.bk_rows), ctx,
                                        variance=float(ek.bk_variance),
                                        as_numpy=True)
        T8c = key_np.T8
        ek.bk_ntt = ntt.NttKey(T8=jnp.asarray(T8c), variance=key_np.variance)
    if cache_path:
        os.makedirs(cache_dir, exist_ok=True)
        tmp = cache_path + f".tmp.{os.getpid()}.npy"
        np.save(tmp, T8c)
        os.replace(tmp, cache_path)
    return _finish(ek)


def cmux_rotate_step(acc: jax.Array, bk_row: jax.Array, bara_i: jax.Array,
                     params: GateBootstrappingParams,
                     rotation_impl: str = "auto") -> jax.Array:
    """One blind-rotate iteration (upstream ``tfhe_MuxRotate_FFT``):

        acc <- acc + bk_i ⊡ ((X^{bara_i} - 1) * acc)

    Args:
      acc:    (..., k+1, N) int32 accumulator polynomials.
      bk_row: (kpl, k+1, N) int32 TGSW rows for LWE key bit i (shared).
      bara_i: (...) int32 per-sample rotation amounts in [0, 2N).
    """
    tg = params.tgsw_params
    d = rotate.mul_by_xai(acc, bara_i[..., None], impl=rotation_impl) - acc
    digits = decompose_h(d.astype(jnp.int32), tg)                  # (..., kpl, N)
    delta = polymul.small_by_torus_matmul(digits, bk_row, x_bound=tg.halfBg)
    return (acc + delta).astype(jnp.int32)


def blind_rotate(acc0: jax.Array, bara: jax.Array, bk_rows: jax.Array,
                 params: GateBootstrappingParams,
                 rotation_impl: str = "auto", unroll: int = 1) -> jax.Array:
    """``tfhe_blindRotate``: scan the CMux step over the n TGSW rows.

    Args:
      acc0: (..., k+1, N) int32 initial accumulator.
      bara: (..., n) int32 per-sample rotation amounts.
      bk_rows: (n, kpl, k+1, N) int32.
    """
    bara_t = jnp.moveaxis(bara, -1, 0)  # (n, ...)

    def step(acc, xs):
        bk_row, bara_i = xs
        return cmux_rotate_step(acc, bk_row, bara_i, params, rotation_impl), None

    acc, _ = jax.lax.scan(step, acc0, (bk_rows, bara_t), unroll=unroll)
    return acc


def bootstrap_woKS(mu: jax.Array, ct: LweCiphertext, ek: EvalKey,
                   params: GateBootstrappingParams,
                   rotation_impl: str = "auto") -> LweCiphertext:
    """``tfhe_bootstrap_woKS_FFT``: blind-rotate a testvector and extract.

    Returns an LWE sample over k*N encrypting ``mu * sign(phase in upper half)``
    — precisely: mu if phase(ct) in [-N/2N..), following upstream semantics.
    """
    tl = params.tgsw_params.tlwe_params
    N, k, Nx2 = tl.N, tl.k, 2 * tl.N

    barb = mod_switch_from_torus32(ct.b, Nx2)                      # (...)
    bara = mod_switch_from_torus32(ct.a, Nx2)                      # (..., n)

    mu = jnp.asarray(mu, jnp.int32)
    testvect = jnp.broadcast_to(mu[..., None], ct.b.shape + (N,)).astype(jnp.int32)
    # acc = X^{2N - barb} * testvect  (as trivial TLWE)
    rot = rotate.mul_by_xai(testvect, (Nx2 - barb) % Nx2, impl=rotation_impl)
    acc0 = tlwe_noiseless_trivial(rot, k).a                        # (..., k+1, N)

    _B = int(np.prod(ct.b.shape)) if ct.b.shape else 1
    use_kernel = ek.bk_ntt_kernel is not None and not (
        _B < SMALL_BATCH_CUTOVER and ek.bk_ntt is not None)
    if use_kernel:
        from ..ops import pallas_ntt_blindrot2
        batch_shape = ct.b.shape
        B = int(np.prod(batch_shape)) if batch_shape else 1
        acc0_f = acc0.reshape((B, k + 1, N))
        bara_f = jnp.moveaxis(bara.reshape((B, params.n)), -1, 0)   # (n, B)
        # Mosaic tiles the batch on the lane axis in blocks of 128; pad and
        # slice back.  The pad rows rotate zeros — well-defined, discarded.
        pad = (-B) % 128 if jax.default_backend() == "tpu" else 0
        if pad:
            acc0_f = jnp.concatenate(
                [acc0_f, jnp.zeros((pad, k + 1, N), jnp.int32)], axis=0)
            bara_f = jnp.concatenate(
                [bara_f, jnp.zeros((params.n, pad), jnp.int32)], axis=1)
        acc = pallas_ntt_blindrot2.blind_rotate_ntt_pallas2(
            acc0_f, bara_f, ek.bk_ntt_kernel, ek.ntt_ctx, params,
            expanded=ek.kernel_key_expanded)
        acc = acc[:B].reshape(batch_shape + (k + 1, N))
    elif ek.bk_ntt is not None:
        from ..ops import ntt
        batch_shape = ct.b.shape
        B = int(np.prod(batch_shape)) if batch_shape else 1
        acc0_f = acc0.reshape((B, k + 1, N))
        bara_f = jnp.moveaxis(bara.reshape((B, params.n)), -1, 0)
        acc = ntt.blind_rotate_ntt(acc0_f, bara_f, ek.bk_ntt, params,
                                   ek.ntt_ctx, rotation_impl=rotation_impl)
        acc = acc.reshape(batch_shape + (k + 1, N))
    elif ek.bk_compact is not None:
        from ..ops import pallas_blindrot
        batch_shape = ct.b.shape
        B = int(np.prod(batch_shape)) if batch_shape else 1
        acc0_f = acc0.reshape((B, k + 1, N))
        bara_f = jnp.moveaxis(bara.reshape((B, params.n)), -1, 0)
        acc = pallas_blindrot.blind_rotate_pallas(acc0_f, bara_f, ek.bk_compact,
                                                  params)
        acc = acc.reshape(batch_shape + (k + 1, N))
    else:
        acc = blind_rotate(acc0, bara, ek.bk_rows, params, rotation_impl)

    out = tlwe_extract_lwe_sample(
        TLweCiphertext(a=acc, current_variance=jnp.zeros(ct.b.shape, jnp.float32)))
    var = blind_rotate_output_variance(
        params, ek.bk_variance,
        key_round_bits=(ek.ntt_ctx.key_round_bits
                        if ek.ntt_ctx is not None else 0))
    tg = params.tgsw_params
    if ek.bk_compact is not None and ek.bk_ntt is None:
        # Fast rounded-key form: account the key-rounding error (uniform in
        # [-2^(8*drop-1), 2^(8*drop-1)) per coefficient, convolved with the
        # gadget digits over n steps; normalized torus units).
        from ..ops import polymul, pallas_blindrot
        Jp = pallas_blindrot._padded_rows(tg.kpl)
        stored = ek.bk_compact.shape[1] // ((k + 1) * Jp)
        drop = polymul.LIMBS - stored
        if drop:
            # Worst-case digit bound halfBg^2, with the COHERENT ~n^2
            # accumulation of a fixed-per-key rounding error (r5 finding —
            # see blind_rotate_output_variance; the same structure as the
            # NTT rounded plans).
            round_var = (float(params.n) ** 2 * tg.kpl * N
                         * float(tg.halfBg ** 2)
                         * (float(1 << (16 * drop)) / 12.0) / float(2 ** 64))
            var = var + jnp.float32(round_var)
    var = jnp.broadcast_to(var, ct.b.shape)
    return LweCiphertext(a=out.a, b=out.b, current_variance=var)


def blind_rotate_output_variance(params: GateBootstrappingParams,
                                 bk_variance, key_round_bits: int = 0):
    """Device-side output phase variance of a blind rotation (scalar f32).

    The noise recurrence, calibrated against measured phase error
    (tests/test_noise.py; derivation in scripts/probes/README + the round-3
    noise study).  Per CMux step:
      * bk-noise term: kpl*N*E[d^2]*Var_bk, E[d^2] = Bg^2/12 (uniform
        digits).  The NTT path is exact mod 2^32, so there is NO FFT
        rounding term (the reference's f64 FFT adds one).
      * decomposition term: the offset-trick reconstruction error is
        uniform in (-2^(32-l*Bgbit), 0] — floor-like, mean -eps_mean with
        eps_mean = 2^-(l*Bgbit+1).  The per-coefficient bias is IDENTICAL
        across coefficients, so its phase contribution sums coherently to
        ~(1 + k*N*E[s]) * eps_mean within a step (and decoheres across
        steps through the rotations), dominating the incoherent part.
        Only steps with s_i = 1 contribute (E[s] = 1/2).
      * ``key_round_bits > 0`` (rounded-key plans): the key is rounded to
        its top 32-rb bits before the NTT limb split (ops/ntt.round_key) —
        error uniform in +-2^(rb-1) int32 units per key coefficient, FIXED
        per key.  The digits it convolves with repeat (rotated) across the
        n steps, so the contributions accumulate COHERENTLY: variance ~n^2
        (r5 on-chip measurement — see ops/ntt.choose_rounded_plan), not
        the r4 incoherent ~n model that under-counted by ~600x in variance
        at the 128-bit set.

    Shared by :func:`bootstrap_woKS` and the sharded gate paths
    (parallel/sharded.py) so the variance rail cannot drift between them.
    """
    tg = params.tgsw_params
    tl = tg.tlwe_params
    N = tl.N
    eps_mean = 2.0 ** -(tg.l * tg.Bgbit + 1)
    eps_u2 = 2.0 ** (-2 * tg.l * tg.Bgbit) / 12.0
    kN2 = 1.0 + tl.k * N / 2.0
    dec_step = 0.5 * (kN2 * eps_mean) ** 2 + kN2 * eps_u2
    d2 = (2.0 * tg.halfBg) ** 2 / 12.0
    step_var = (jnp.float32(tg.kpl * N * d2) * bk_variance
                + jnp.float32(dec_step))
    var = jnp.float32(params.n) * step_var
    if key_round_bits:
        round_var = (float(params.n) ** 2 * tg.kpl * N
                     * float(tg.halfBg ** 2)
                     * (float(1 << (2 * key_round_bits)) / 12.0)
                     / float(2 ** 64))
        var = var + jnp.float32(round_var)
    return var


def predicted_bootstrap_variance(params: GateBootstrappingParams,
                                 bk_variance: float | None = None,
                                 with_keyswitch: bool = True,
                                 key_round_bits: int = 0) -> float:
    """Host-side worst-case output phase variance of one gate bootstrap.

    Mirrors the device bookkeeping in :func:`bootstrap_woKS` /
    ``ops.keyswitch.keyswitch_apply`` with the keyswitch term at its maximum
    (every digit nonzero).  Used by the gate-level noise-budget assertion
    (``core/gates.check_noise_budget``) and the statistical noise test.
    """
    tg = params.tgsw_params
    tl = tg.tlwe_params
    if bk_variance is None:
        bk_variance = float(tl.alpha_min) ** 2
    eps_mean = 2.0 ** -(tg.l * tg.Bgbit + 1)
    eps_u2 = 2.0 ** (-2 * tg.l * tg.Bgbit) / 12.0
    kN2 = 1.0 + tl.k * tl.N / 2.0
    dec_step = 0.5 * (kN2 * eps_mean) ** 2 + kN2 * eps_u2
    d2 = (2.0 * tg.halfBg) ** 2 / 12.0
    var = params.n * (tg.kpl * tl.N * d2 * bk_variance + dec_step)
    if key_round_bits:
        # coherent-accumulation model (~n^2) — see blind_rotate_output_variance
        var += (float(params.n) ** 2 * tg.kpl * tl.N * float(tg.halfBg ** 2)
                * (float(1 << (2 * key_round_bits)) / 12.0) / float(2 ** 64))
    if with_keyswitch:
        n_in = tl.k * tl.N
        tb = params.ks.t * params.ks.basebit
        var += n_in * params.ks.t * float(params.in_out_params.alpha_min) ** 2
        var += n_in * 2.0 ** (-2 * tb) / 24.0     # digit-rounding term
    return var


def bootstrap(mu: jax.Array, ct: LweCiphertext, ek: EvalKey,
              params: GateBootstrappingParams,
              rotation_impl: str = "auto") -> LweCiphertext:
    """``tfhe_bootstrap_FFT``: woKS bootstrap followed by key switching."""
    u = bootstrap_woKS(mu, ct, ek, params, rotation_impl)
    return keyswitch_apply(u, ek.ks, t=params.ks.t, basebit=params.ks.basebit,
                           prepared=ek.ks_prepared)
