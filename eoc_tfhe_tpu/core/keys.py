"""Key material: secret/cloud key sets, bootstrapping key, key-switching key.

TPU-native equivalents of upstream ``lwe-gate-bootstrapping.cpp`` (keyset
construction reached from ``new_random_gate_bootstrapping_secret_keyset``,
``/root/reference/ao-tfhe/eoc-tfhe-run.cpp:231``), ``lwe-keyswitch-functions.cpp``
(``lweCreateKeySwitchKey``) and ``lwe-bootstrapping-functions.cpp``
(``tfhe_createLweBootstrappingKey``).

Unlike the reference's global singletons (``globalSecretKey``/``globalPublicKey``,
``eoc-tfhe-run.cpp:38-39``), keys are explicit pytree values passed per call
(SURVEY.md appendix A).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .params import GateBootstrappingParams
from .numeric import gaussian32, uniform_torus32
from .lwe import LweKey, lwe_key_gen, lwe_sym_encrypt
from .tlwe import TLweKey, tlwe_key_gen
from .tgsw import TGswCiphertext, tgsw_sym_encrypt_int


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KeySwitchKey:
    """``LweKeySwitchKey``: precomputed LWE encryptions of key-bit fragments.

    ks[i, j, u] encrypts  in_key[i] * u * 2^(32 - (j+1)*basebit)  under the
    output key; stored packed as (N_in, t, base, n_out + 1) int32 with the
    body in the last column.
    """

    ks: jax.Array  # (n_in, t, base, n_out + 1) int32
    variance: jax.Array  # () float32 — noise variance of each entry

    @property
    def n_in(self) -> int:
        return self.ks.shape[0]

    @property
    def t(self) -> int:
        return self.ks.shape[1]

    @property
    def base(self) -> int:
        return self.ks.shape[2]

    @property
    def n_out(self) -> int:
        return self.ks.shape[3] - 1


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BootstrappingKey:
    """``LweBootstrappingKey``: n TGSW encryptions of the LWE key bits + ks key.

    ``bk`` holds the raw TGSW rows; the "FFT-converted copy" of the reference
    (``LweBootstrappingKeyFFT``) corresponds here to :class:`BootstrappingKeyMatmul`
    (precomputed matmul form, built lazily by the bootstrap ops).
    """

    bk: jax.Array  # (n, kpl, k+1, N) int32
    bk_variance: jax.Array  # () float32
    ks: KeySwitchKey

    @property
    def n(self) -> int:
        return self.bk.shape[0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CloudKeySet:
    """``TFheGateBootstrappingCloudKeySet``: the public evaluation material."""

    bk: BootstrappingKey


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SecretKeySet:
    """``TFheGateBootstrappingSecretKeySet``: lwe key + tgsw key + cloud keys."""

    lwe_key: LweKey
    tgsw_key: TLweKey
    cloud: CloudKeySet

    @property
    def extracted_key(self) -> LweKey:
        """``tLweExtractKey``: the ring key flattened to an LWE key over k*N."""
        return LweKey(s=self.tgsw_key.key.reshape(-1))


def create_keyswitch_key(key: jax.Array, in_key: LweKey, out_key: LweKey,
                         t: int, basebit: int, alpha: float) -> KeySwitchKey:
    """``lweCreateKeySwitchKey``: N_in * t * base fresh LWE encryptions.

    Entry (i, j, u) encrypts in_key[i] * u * 2^(32-(j+1)*basebit). The u=0
    plane encrypts zero (upstream encrypts it too; kept for exact parity of
    the serialized format).
    """
    n_in = in_key.n
    base = 1 << basebit
    # messages[i, j, u] = s_i * u * 2^(32-(j+1)*basebit)  (int32 wraparound)
    u = jnp.arange(base, dtype=jnp.int32)
    shifts = jnp.array([32 - (j + 1) * basebit for j in range(t)], jnp.int32)
    mess = (in_key.s[:, None, None] * (u[None, None, :] << shifts[None, :, None])
            ).astype(jnp.int32)
    ct = lwe_sym_encrypt(key, mess, alpha, out_key)
    packed = jnp.concatenate([ct.a, ct.b[..., None]], axis=-1)
    return KeySwitchKey(ks=packed.astype(jnp.int32),
                        variance=jnp.float32(alpha) ** 2)


def create_bootstrapping_key(key: jax.Array, lwe_key: LweKey, tgsw_key: TLweKey,
                             params: GateBootstrappingParams) -> BootstrappingKey:
    """``tfhe_createLweBootstrappingKey``: TGSW(s_i) for each LWE key bit + ks key."""
    k_bk, k_ks = jax.random.split(key)
    alpha_bk = params.tgsw_params.tlwe_params.alpha_min
    tg = tgsw_sym_encrypt_int(k_bk, lwe_key.s, alpha_bk, tgsw_key, params.tgsw_params)

    extracted = LweKey(s=tgsw_key.key.reshape(-1))
    ks = create_keyswitch_key(k_ks, extracted, lwe_key,
                              t=params.ks.t, basebit=params.ks.basebit,
                              alpha=params.in_out_params.alpha_min)
    return BootstrappingKey(bk=tg.rows, bk_variance=jnp.float32(alpha_bk) ** 2, ks=ks)


def new_random_gate_bootstrapping_secret_keyset(
        key: jax.Array, params: GateBootstrappingParams) -> SecretKeySet:
    """``new_random_gate_bootstrapping_secret_keyset`` with explicit randomness."""
    k1, k2, k3 = jax.random.split(key, 3)
    lwe_key = lwe_key_gen(k1, params.in_out_params)
    tgsw_key = tlwe_key_gen(k2, params.tgsw_params.tlwe_params)
    bk = create_bootstrapping_key(k3, lwe_key, tgsw_key, params)
    return SecretKeySet(lwe_key=lwe_key, tgsw_key=tgsw_key, cloud=CloudKeySet(bk=bk))
