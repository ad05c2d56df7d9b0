"""Parameter sets for the TPU-native TFHE framework.

These mirror the parameter *semantics* of the reference stack's crypto core
(upstream ``tfhe/tfhe`` @ bc71bfae, consumed by the reference wrapper at
``/root/reference/ao-tfhe/eoc-tfhe-run.cpp:34,230`` via
``new_default_gate_bootstrapping_parameters(128)``), re-expressed as frozen,
hashable dataclasses suitable for use as static JAX arguments.

Default 128-bit set (values embedded in the reference's shipped wasm via its
parameter-selection strings, see SURVEY.md §2.2):
  N=1024, k=1, n=630, bk_l=3, bk_Bgbit=7, ks_basebit=2, ks_t=8,
  ks_stdev=2^-15, bk_stdev=2^-25, max_stdev=0.012467.
80-bit set (upstream ``lwe-gate-bootstrapping.cpp`` at the same pin):
  N=1024, k=1, n=500, bk_l=2, bk_Bgbit=10, ks_basebit=1, ks_t=15,
  ks_stdev=2.44e-5, bk_stdev=7.18e-9, max_stdev=0.012467.

Unlike the reference (mutable heap structs with a garbage-collector registry,
``tfhe_garbage_collector.cpp``), parameters here are immutable values; there
is nothing to collect.
"""

from __future__ import annotations

import dataclasses
from functools import cached_property


@dataclasses.dataclass(frozen=True)
class LweParams:
    """LWE dimension and noise bounds (reference struct ``LweParams{n, alpha_min, alpha_max}``)."""

    n: int
    alpha_min: float
    alpha_max: float


@dataclasses.dataclass(frozen=True)
class TLweParams:
    """Ring-LWE parameters (reference ``TLweParams{N, k, alpha_min, alpha_max}``).

    ``N`` is the (power-of-two) polynomial degree; ``k`` the number of mask
    polynomials. ``extracted_lweparams`` has n = N*k.
    """

    N: int
    k: int
    alpha_min: float
    alpha_max: float

    def __post_init__(self) -> None:
        if self.N & (self.N - 1):
            raise ValueError(f"N must be a power of two, got {self.N}")

    @cached_property
    def extracted_lweparams(self) -> LweParams:
        return LweParams(n=self.N * self.k, alpha_min=self.alpha_min, alpha_max=self.alpha_max)


@dataclasses.dataclass(frozen=True)
class TGswParams:
    """Gadget (TGSW) parameters (reference ``TGswParams{l, Bgbit, ...}``).

    Derived quantities follow upstream ``tgsw-functions.cpp``:
      Bg      = 2**Bgbit             gadget base
      halfBg  = Bg // 2              signed-digit offset
      maskMod = Bg - 1               digit mask
      kpl     = (k + 1) * l          rows per TGSW sample
      h[p]    = 2**(32 - (p+1)*Bgbit)            gadget values, p in [0, l)
      offset  = sum_p halfBg * h[p]  decomposition rounding offset
    """

    l: int
    Bgbit: int
    tlwe_params: TLweParams

    @property
    def Bg(self) -> int:
        return 1 << self.Bgbit

    @property
    def halfBg(self) -> int:
        return self.Bg // 2

    @property
    def maskMod(self) -> int:
        return self.Bg - 1

    @property
    def kpl(self) -> int:
        return (self.tlwe_params.k + 1) * self.l

    @cached_property
    def h(self) -> tuple[int, ...]:
        return tuple(1 << (32 - (p + 1) * self.Bgbit) for p in range(self.l))

    @cached_property
    def offset(self) -> int:
        # Interpreted as an unsigned 32-bit value (upstream computes it in uint32).
        return sum(self.halfBg * hp for hp in self.h) & 0xFFFFFFFF


@dataclasses.dataclass(frozen=True)
class KeySwitchParams:
    """LWE key-switching parameters (reference ``LweKeySwitchKey{n, t, basebit, base}``)."""

    t: int
    basebit: int

    @property
    def base(self) -> int:
        return 1 << self.basebit


@dataclasses.dataclass(frozen=True)
class GateBootstrappingParams:
    """Full gate-bootstrapping parameter set.

    Mirrors the reference ``TFheGateBootstrappingParameterSet{ks_t, ks_basebit,
    in_out_params, tgsw_params}`` (consumed by the wrapper via ``key->params``
    and ``params->in_out_params``, ``eoc-tfhe-run.cpp:144,264``).
    """

    ks: KeySwitchParams
    in_out_params: LweParams
    tgsw_params: TGswParams

    @property
    def n(self) -> int:
        return self.in_out_params.n

    @property
    def N(self) -> int:
        return self.tgsw_params.tlwe_params.N

    @property
    def k(self) -> int:
        return self.tgsw_params.tlwe_params.k

    @property
    def l(self) -> int:
        return self.tgsw_params.l


#: Maximum tolerated ciphertext noise stddev for correct gate decryption,
#: shared by both default parameter sets (upstream ``lwe-gate-bootstrapping.cpp``).
MAX_STDEV = 0.012467


def default_128bit_params() -> GateBootstrappingParams:
    """The reference's default 128-bit secure parameter set.

    Requested with lambda=128 by the wrapper (``eoc-tfhe-run.cpp:34,230``);
    constants from upstream ``new_default_gate_bootstrapping_parameters`` at
    the pinned commit (selection-error strings verbatim in the shipped wasm).
    """
    ks_stdev = 2.0 ** -15  # standard deviation of the keyswitch key noise
    bk_stdev = 2.0 ** -25  # standard deviation of the bootstrapping key noise
    in_out = LweParams(n=630, alpha_min=ks_stdev, alpha_max=MAX_STDEV)
    tlwe = TLweParams(N=1024, k=1, alpha_min=bk_stdev, alpha_max=MAX_STDEV)
    tgsw = TGswParams(l=3, Bgbit=7, tlwe_params=tlwe)
    return GateBootstrappingParams(
        ks=KeySwitchParams(t=8, basebit=2), in_out_params=in_out, tgsw_params=tgsw
    )


def default_80bit_params() -> GateBootstrappingParams:
    """Upstream's 80-bit secure parameter set (lambda <= 80)."""
    ks_stdev = 2.44e-5
    bk_stdev = 7.18e-9
    in_out = LweParams(n=500, alpha_min=ks_stdev, alpha_max=MAX_STDEV)
    tlwe = TLweParams(N=1024, k=1, alpha_min=bk_stdev, alpha_max=MAX_STDEV)
    tgsw = TGswParams(l=2, Bgbit=10, tlwe_params=tlwe)
    return GateBootstrappingParams(
        ks=KeySwitchParams(t=15, basebit=1), in_out_params=in_out, tgsw_params=tgsw
    )


def default_gate_bootstrapping_params(minimum_lambda: int) -> GateBootstrappingParams:
    """Equivalent of ``new_default_gate_bootstrapping_parameters``.

    Reproduces upstream's selection behavior, including the error for
    unsupported security levels (message text embedded in the reference wasm).
    """
    if minimum_lambda > 128:
        raise ValueError(
            "Sorry, for now, the parameters are only implemented for 80bit and "
            "128bit of security!"
        )
    if minimum_lambda > 80:
        return default_128bit_params()
    if minimum_lambda > 0:
        return default_80bit_params()
    raise ValueError(
        "the requested security parameter must be positive (currently, 80 and "
        "128-bits are supported)"
    )


def test_params(N: int = 64, k: int = 1, n: int = 16, l: int = 2, Bgbit: int = 8,
                ks_t: int = 8, ks_basebit: int = 2,
                ks_stdev: float = 1e-7, bk_stdev: float = 1e-9) -> GateBootstrappingParams:
    """Tiny insecure parameters for fast unit tests (CPU-friendly shapes)."""
    in_out = LweParams(n=n, alpha_min=ks_stdev, alpha_max=MAX_STDEV)
    tlwe = TLweParams(N=N, k=k, alpha_min=bk_stdev, alpha_max=MAX_STDEV)
    tgsw = TGswParams(l=l, Bgbit=Bgbit, tlwe_params=tlwe)
    return GateBootstrappingParams(
        ks=KeySwitchParams(t=ks_t, basebit=ks_basebit), in_out_params=in_out, tgsw_params=tgsw
    )
