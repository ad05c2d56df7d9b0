"""Sharded bootstrapped-gate execution with explicit collectives.

``shard_map`` formulation of the batched gate step over a ("dp", "tp") mesh
(SURVEY.md §2.4 comm-backend mapping):

  * blind rotation — local per dp shard (no collectives; bk replicated);
  * key switching — the (n_in*t*base) contraction rows are sharded over tp;
    each device contracts its row slice and the partial results are reduced
    with ``psum`` over "tp" (the keyswitch-accumulation collective the north
    star names).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core import gates
from ..core.params import GateBootstrappingParams
from ..core.lwe import LweCiphertext, lwe_noiseless_trivial, lwe_add_mul
from ..core.bootstrap import EvalKey, bootstrap_woKS
from ..ops import polymul
from ..ops.keyswitch import keyswitch_digits


def _keyswitch_tp(u: LweCiphertext, ks_prepared_local: jax.Array,
                  ks_variance, t: int, basebit: int, n_in: int,
                  axis: str = "tp") -> LweCiphertext:
    """Row-sharded keyswitch: local contraction over an i-slice + psum.

    ks_prepared_local: (n_in_local * t * base, m * LIMBS) int8 — this
    device's slice of the table rows, split along the input coefficient i.
    The matching slice of the input coefficients is selected by tp index.
    """
    base = 1 << basebit
    ntp = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    n_local = n_in // ntp
    m_l = ks_prepared_local.shape[-1]
    m = m_l // polymul.LIMBS
    n_out = m - 1

    a_local = jax.lax.dynamic_slice_in_dim(u.a, idx * n_local, n_local, axis=-1)
    digits = keyswitch_digits(a_local, t, basebit)             # (..., n_local, t)
    uvals = jnp.arange(base, dtype=jnp.int32)
    onehot = (digits[..., None] == uvals).astype(jnp.bfloat16)
    x8 = onehot.reshape((-1, n_local * t * base))
    # exact bf16 MXU contraction (see ops/keyswitch.prepare_keyswitch_matmul)
    z = jax.lax.dot_general(x8, ks_prepared_local.astype(jnp.bfloat16),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    z = z.astype(jnp.int32).reshape(u.b.shape + (m, polymul.LIMBS))
    delta = polymul.recombine_limbs(z, axis=-1)
    delta = jax.lax.psum(delta, axis)                           # exact int32 psum

    a = (-delta[..., :n_out]).astype(jnp.int32)
    b = (u.b - delta[..., n_out]).astype(jnp.int32)
    # Variance parity with ops/keyswitch.keyswitch_apply (VERDICT r3 item 8):
    # count NONZERO digits per sample (each subtracts one ks entry) with a
    # psum over the tp row slices, plus the same digit-rounding term.
    nnz_local = jnp.sum((digits != 0).astype(jnp.float32), axis=(-2, -1))
    nnz = jax.lax.psum(nnz_local, axis)
    tb = t * basebit
    round_var = jnp.float32(n_in * 2.0 ** (-2 * tb) / 24.0)
    var = u.current_variance + nnz * ks_variance + round_var
    return LweCiphertext(a=a, b=b, current_variance=var)


def make_sharded_gate(mesh: Mesh, params: GateBootstrappingParams,
                      offset_t32: int, sa: int, sb: int,
                      rotation_impl: str = "auto"):
    """Build a jitted sharded two-input bootstrapped gate (e.g. NAND).

    Returns fn(ca_a, ca_b, ca_var, cb_a, cb_b, cb_var, bk_rows, bk_var,
    ks_prepared, ks_var) -> (a, b, var) with the ciphertext batch sharded
    over dp and the keyswitch contraction sharded over tp.  The variance
    rail matches the unsharded path exactly (VERDICT r3 item 8): input
    variances propagate through the linear part, the bootstrap term uses the
    real bk variance, and the keyswitch term counts per-sample nonzero
    digits; the static gate budget rail runs at build time like
    ``gates._gate``.
    """
    n_in = params.N * params.k
    gates.check_noise_budget(params, sa, sb)

    def step(ca_a, ca_b, ca_var, cb_a, cb_b, cb_var, bk_rows, bk_var,
             ks_prepared, ks_var):
        ca = LweCiphertext(a=ca_a, b=ca_b, current_variance=ca_var)
        cb = LweCiphertext(a=cb_a, b=cb_b, current_variance=cb_var)
        temp = lwe_noiseless_trivial(
            jnp.broadcast_to(jnp.int32(offset_t32), ca.b.shape), ca.n)
        temp = lwe_add_mul(temp, sa, ca)
        temp = lwe_add_mul(temp, sb, cb)
        ek_local = EvalKey(bk_rows=bk_rows, bk_variance=bk_var,
                           ks_prepared=ks_prepared, ks=None)
        u = bootstrap_woKS(jnp.int32(gates._1S8), temp, ek_local, params,
                           rotation_impl)
        out = _keyswitch_tp(u, ks_prepared, ks_var, params.ks.t,
                            params.ks.basebit, n_in)
        return out.a, out.b, out.current_variance

    smapped = shard_map(
        step, mesh=mesh,
        in_specs=(P("dp"), P("dp"), P("dp"),            # ca batch-sharded
                  P("dp"), P("dp"), P("dp"),            # cb batch-sharded
                  P(), P(),                              # bk replicated
                  P("tp"),                               # ks rows tp-sharded
                  P()),
        out_specs=(P("dp"), P("dp"), P("dp")),
        check_vma=False,
    )

    @jax.jit
    def gate_fn(ca_a, ca_b, ca_var, cb_a, cb_b, cb_var, bk_rows, bk_var,
                ks_prepared, ks_var):
        return smapped(ca_a, ca_b, ca_var, cb_a, cb_b, cb_var, bk_rows,
                       bk_var, ks_prepared, ks_var)

    return gate_fn


def make_sharded_nand(mesh: Mesh, params: GateBootstrappingParams,
                      rotation_impl: str = "auto"):
    from ..core.numeric import mod_switch_to_torus32_np
    off = int(mod_switch_to_torus32_np(1, 8))
    return make_sharded_gate(mesh, params, off, -1, -1, rotation_impl)


# ---------------------------------------------------------------------------
# TP external product: TGSW-row split of the blind rotation (key-partitioned
# mode). The north star names this axis explicitly (SURVEY.md §2.4 TP row:
# limb/TGSW-row partition of the external product with collectives on ICI).
# ---------------------------------------------------------------------------

def shard_ntt_key_rows(T8: jax.Array, mesh: Mesh):
    """Place the NTT key tensor with its contraction axis sharded over tp.

    T8: (n, P, L, 2, F, J*R, U*R) from ``ntt.prepare_key_ntt``. The J*R axis
    is j-major, so a tp split over it partitions whole TGSW rows j — each
    device stores 1/tp of the bootstrapping key (the memory-bound
    "key-partitioned" deployment mode).
    """
    return jax.device_put(T8, NamedSharding(mesh, P(None, None, None, None,
                                                    None, "tp", None)))


def blind_rotate_ntt_tp(acc0: jax.Array, bara: jax.Array, T8_sharded,
                        params: GateBootstrappingParams, ctx, mesh: Mesh,
                        rotation_impl: str = "auto",
                        axis: str = "tp") -> jax.Array:
    """Blind rotation with the external-product contraction split over tp.

    Per step, each device decomposes the (tp-replicated, dp-sharded)
    accumulator, keeps its slice of the gadget digits, runs the full local
    NTT pipeline against its key-row slice (partial results stay exact
    int32: a j-subset of the convolution respects the same CRT bound as the
    full sum), and an exact int32 ``psum`` over tp merges the partial
    Delta-acc. Bit-identical to the replicated path.

    Args:
      acc0: (B, k+1, N) int32; bara: (n, B) int32; T8_sharded: the NttKey
      T8 tensor placed by :func:`shard_ntt_key_rows`.
    """
    from ..core.tgsw import decompose_h
    from ..ops import ntt as ntt_mod
    from ..ops import rotate
    tg = params.tgsw_params
    J = tg.kpl
    ntp = mesh.shape[axis]
    assert J % ntp == 0, (J, ntp)
    J_local = J // ntp

    def local_rotate(acc0_l, bara_l, T8_l):
        def step(acc, xs):
            T8_step, bara_i = xs
            d = rotate.mul_by_xai(acc, bara_i[:, None], impl=rotation_impl) - acc
            digits = decompose_h(d.astype(jnp.int32), tg)      # (B, J, N)
            idx = jax.lax.axis_index(axis)
            dig_l = jax.lax.dynamic_slice_in_dim(
                digits, idx * J_local, J_local, axis=1)
            delta = ntt_mod.external_product_ntt(dig_l, T8_step, ctx)
            delta = jax.lax.psum(delta, axis)                  # exact mod 2^32
            return (acc + delta).astype(jnp.int32), None

        acc, _ = jax.lax.scan(step, acc0_l, (T8_l, bara_l))
        return acc

    smapped = shard_map(
        local_rotate, mesh=mesh,
        in_specs=(P("dp"), P(None, "dp"), P(None, None, None, None, None,
                                            "tp", None)),
        out_specs=P("dp"),
        check_vma=False,
    )
    return smapped(acc0, bara, T8_sharded)


# ---------------------------------------------------------------------------
# Frequency-split (limb-split) TP external product with all_to_all — the
# north-star small-batch latency path (SURVEY.md §2.4 TP row: "FFT butterfly
# stages exchanged all-to-all where polynomials are limb-split").  Unlike the
# TGSW-row psum split above (which reduces full-size partial updates), each
# device here owns an F-slice of the NTT spectrum: forward NTT + pointwise
# MAC are local to the slice, one all_to_all repartitions the spectrum from
# frequency-sharded to output-column-sharded, the inverse NTT is local, and
# one all_gather rebuilds the update — moving ~2/tp of the psum bytes.
# ---------------------------------------------------------------------------

def _extprod_freq_step(digits, T8_l, ctx, axis: str):
    """Local fwd NTT + pointwise for this device's frequency slice.

    digits: (B, J, N) int32 (replicated over tp); T8_l: (P, L, 2, F_loc,
    J*R, U*R) — this device's F-slice of the NttKey step.
    Returns chat (P, L, F_loc, B, U*R) int32, strictly balanced per prime.
    """
    import numpy as np
    from ..ops import ntt as ntt_mod

    B, J, N = digits.shape
    R, L = ctx.R, ctx.key_limbs
    P = len(ctx.primes)
    F_loc = T8_l.shape[3]
    idx = jax.lax.axis_index(axis)

    sub = ntt_mod.to_subpolys(digits, R)                  # (B, J, R, F)
    chats = []
    for pi, p in enumerate(ctx.primes):
        W8_l = jax.lax.dynamic_slice_in_dim(
            ctx.Wf8[pi], idx * F_loc, F_loc, axis=2)      # (2, F, F_loc)
        dhat = ntt_mod.mod_matmul(sub, W8_l, p, xmax=ctx.halfBg)
        dhat = jnp.transpose(dhat, (3, 0, 1, 2)).reshape(F_loc, B, J * R)
        dlo, dhi = ntt_mod.split_i8(dhat)

        def outer(d8, W8):   # (F_loc,B,K) x (L,F_loc,K,M) -> (L,F_loc,B,M)
            return jax.lax.dot_general(
                jnp.broadcast_to(d8[None], (L,) + d8.shape), W8,
                (((3,), (2,)), ((0, 1), (0, 1))),
                preferred_element_type=jnp.int32)

        Tlo, Thi = T8_l[pi, :, 0], T8_l[pi, :, 1]
        P00 = outer(dlo, Tlo)
        Pm = ntt_mod.balanced_reduce(outer(dlo, Thi) + outer(dhi, Tlo), p)
        P11 = ntt_mod.balanced_reduce(outer(dhi, Thi), p)
        c16 = int(ntt_mod._balanced_np(np.int64(1 << 16), p))
        chats.append(ntt_mod.balanced_reduce(
            P00 + (Pm << 8) + P11 * jnp.int32(c16), p))   # (L, F_loc, B, M)
    return jnp.stack(chats)                               # (P, L, F_loc, B, M)


def _freq_local_rotate(acc0_l, bara_l, T8_l, ctx,
                       params: GateBootstrappingParams,
                       rotation_impl: str = "auto", axis: str = "tp"):
    """Per-device body of the frequency-split blind rotation (runs INSIDE
    shard_map; reused by :func:`blind_rotate_ntt_freq_tp` and the gate-level
    path :func:`make_sharded_gate_freq`)."""
    from ..core.tgsw import decompose_h
    from ..ops import ntt as ntt_mod
    from ..ops import rotate
    tg = params.tgsw_params
    ntp = jax.lax.axis_size(axis)
    R, F, L = ctx.R, ctx.F, ctx.key_limbs
    assert F % ntp == 0, (F, ntp)
    B = acc0_l.shape[0]
    U = acc0_l.shape[1]
    UR = U * R
    assert UR % ntp == 0, (UR, ntp)

    def step(acc, xs):
        T8_step_l, bara_i = xs
        d = rotate.mul_by_xai(acc, bara_i[:, None], impl=rotation_impl) - acc
        digits = decompose_h(d.astype(jnp.int32), tg)        # (B, J, N)
        chat = _extprod_freq_step(digits, T8_step_l, ctx, axis)
        # all_to_all: frequency-sharded -> output-column-sharded
        chat_x = jax.lax.all_to_all(chat, axis, split_axis=4,
                                    concat_axis=2, tiled=True)
        # (P, L, F, B, UR_loc) -> inverse NTT over full F, local columns
        chat2 = jnp.transpose(chat_x, (0, 1, 3, 4, 2))       # (P,L,B,url,F)
        vl = [ntt_mod.ntt_inverse_prime(chat2[pi], ctx, pi)
              for pi in range(len(ctx.primes))]
        V = ntt_mod.crt_pair(jnp.stack(vl), ctx)             # (L,B,url,F)
        out_l = jnp.zeros(V.shape[1:], jnp.int32)
        for li in range(L):
            sh = ctx.key_round_bits + ctx.key_limb_bits * li
            out_l = (out_l + (V[li] << jnp.int32(sh))).astype(jnp.int32)
        upd = jax.lax.all_gather(out_l, axis, axis=1, tiled=True)
        upd = ntt_mod.from_subpolys(upd.reshape(B, U, R, F))
        return (acc + upd).astype(jnp.int32), None

    acc, _ = jax.lax.scan(step, acc0_l, (T8_l, bara_l))
    return acc


def blind_rotate_ntt_freq_tp(acc0: jax.Array, bara: jax.Array, T8_sharded,
                             params: GateBootstrappingParams, ctx, mesh: Mesh,
                             rotation_impl: str = "auto",
                             axis: str = "tp") -> jax.Array:
    """Blind rotation with the external product split over the NTT frequency
    axis (all_to_all mode) — bit-identical to the replicated path.

    Args:
      acc0: (B, k+1, N) int32 (dp-sharded); bara: (n, B) int32;
      T8_sharded: NttKey T8 (n, P, L, 2, F, J*R, U*R) placed with the F axis
      sharded over tp (see :func:`shard_ntt_key_freq`).
    """
    smapped = shard_map(
        partial(_freq_local_rotate, ctx=ctx, params=params,
                rotation_impl=rotation_impl, axis=axis),
        mesh=mesh,
        in_specs=(P("dp"), P(None, "dp"),
                  P(None, None, None, None, "tp", None, None)),
        out_specs=P("dp"),
        check_vma=False,
    )
    return smapped(acc0, bara, T8_sharded)


def make_sharded_gate_freq(mesh: Mesh, params: GateBootstrappingParams,
                           offset_t32: int, sa: int, sb: int, ctx,
                           rotation_impl: str = "auto"):
    """Gate-level frequency-split path (r4 VERDICT item 7): a jitted
    two-input bootstrapped gate whose blind rotation runs the all_to_all
    frequency split — the small-batch latency mode (each device holds 1/tp
    of the key and 1/tp of the spectrum work; collectives move ~2/tp of the
    row-psum bytes).

    Returns fn(ca_a, ca_b, ca_var, cb_a, cb_b, cb_var, T8_freq, bk_var,
    ks_prepared, ks_var) -> (a, b, var):

      * batch sharded over dp, spectrum over tp (``shard_ntt_key_freq``);
      * keyswitch contraction rows tp-sharded + psum (``_keyswitch_tp``);
      * bit-identical outputs and variance rail vs the unsharded gate
        (tests/test_sharding.py; decrypt-checked in ``dryrun_multichip``).
    """
    from ..core.numeric import mod_switch_from_torus32
    from ..core.tlwe import tlwe_noiseless_trivial, tlwe_extract_lwe_sample, \
        TLweCiphertext
    from ..core.bootstrap import blind_rotate_output_variance
    from ..ops import rotate
    n_in = params.N * params.k
    gates.check_noise_budget(params, sa, sb)
    tl = params.tgsw_params.tlwe_params
    N, k, Nx2 = tl.N, tl.k, 2 * tl.N
    mu = gates._1S8

    def step(ca_a, ca_b, ca_var, cb_a, cb_b, cb_var, T8_l, bk_var,
             ks_prepared, ks_var):
        ca = LweCiphertext(a=ca_a, b=ca_b, current_variance=ca_var)
        cb = LweCiphertext(a=cb_a, b=cb_b, current_variance=cb_var)
        temp = lwe_noiseless_trivial(
            jnp.broadcast_to(jnp.int32(offset_t32), ca.b.shape), ca.n)
        temp = lwe_add_mul(temp, sa, ca)
        temp = lwe_add_mul(temp, sb, cb)
        # bootstrap_woKS front half (modswitch + testvector), local dp rows
        barb = mod_switch_from_torus32(temp.b, Nx2)
        bara = mod_switch_from_torus32(temp.a, Nx2)          # (B_l, n)
        testvect = jnp.broadcast_to(jnp.int32(mu),
                                    temp.b.shape + (N,)).astype(jnp.int32)
        rot = rotate.mul_by_xai(testvect, (Nx2 - barb) % Nx2,
                                impl=rotation_impl)
        acc0 = tlwe_noiseless_trivial(rot, k).a              # (B_l, k+1, N)
        acc = _freq_local_rotate(acc0, jnp.moveaxis(bara, -1, 0), T8_l,
                                 ctx, params, rotation_impl)
        u = tlwe_extract_lwe_sample(TLweCiphertext(
            a=acc, current_variance=jnp.zeros(temp.b.shape, jnp.float32)))
        var = jnp.broadcast_to(
            blind_rotate_output_variance(params, bk_var,
                                         ctx.key_round_bits),
            temp.b.shape)
        u = LweCiphertext(a=u.a, b=u.b, current_variance=var)
        out = _keyswitch_tp(u, ks_prepared, ks_var, params.ks.t,
                            params.ks.basebit, n_in)
        return out.a, out.b, out.current_variance

    smapped = shard_map(
        step, mesh=mesh,
        in_specs=(P("dp"), P("dp"), P("dp"),
                  P("dp"), P("dp"), P("dp"),
                  P(None, None, None, None, "tp", None, None),  # T8 F-split
                  P(),
                  P("tp"),                                      # ks rows
                  P()),
        out_specs=(P("dp"), P("dp"), P("dp")),
        check_vma=False,
    )

    @jax.jit
    def gate_fn(ca_a, ca_b, ca_var, cb_a, cb_b, cb_var, T8_freq, bk_var,
                ks_prepared, ks_var):
        return smapped(ca_a, ca_b, ca_var, cb_a, cb_b, cb_var, T8_freq,
                       bk_var, ks_prepared, ks_var)

    return gate_fn


def make_sharded_nand_freq(mesh: Mesh, params: GateBootstrappingParams,
                           ctx, rotation_impl: str = "auto"):
    """Frequency-split NAND (small-batch latency mode, gate level)."""
    from ..core.numeric import mod_switch_to_torus32_np
    off = int(mod_switch_to_torus32_np(1, 8))
    return make_sharded_gate_freq(mesh, params, off, -1, -1, ctx,
                                  rotation_impl)


def shard_ntt_key_freq(T8: jax.Array, mesh: Mesh):
    """Place the NttKey tensor with the NTT frequency axis sharded over tp
    (each device stores 1/tp of the key — the all_to_all latency mode)."""
    return jax.device_put(T8, NamedSharding(mesh, P(None, None, None, None,
                                                    "tp", None, None)))
