"""One typed configuration for the whole framework.

Replaces the reference's three ad-hoc config mechanisms — ``config.yml``
build geometry, compile-time ``#if`` feature flags, and CMake FFT-processor
toggles (SURVEY.md §5 config notes: "one typed config covering parameter set,
kernel variant, sharding mesh, batch size; no silent global singletons").
"""

from __future__ import annotations

import dataclasses
import json

from .core.params import (GateBootstrappingParams, default_128bit_params,
                          default_80bit_params, test_params)


@dataclasses.dataclass(frozen=True)
class FrameworkConfig:
    """Everything tunable, in one frozen value."""

    # Security / crypto parameters ("128", "80", or "test").
    param_set: str = "128"
    # Monomial-rotation kernel: "auto" | "gather" | "onehot".
    rotation_impl: str = "auto"
    # Evaluation-key form: "rows" (construct per step) | "chunked" (precomputed
    # block-Toeplitz matmul form; more HBM, zero per-step construction).
    eval_key_form: str = "rows"
    # JWT gate on API entry points (structural validation, reference parity).
    enable_jwt: bool = True
    # Real RS256 signature verification against the supplied JWKS (the
    # capability the reference links jwt-cpp/OpenSSL for but never enables).
    jwt_rs256: bool = False
    # Sharding mesh: data-parallel x tensor-parallel device counts (0 = all).
    mesh_dp: int = 0
    mesh_tp: int = 1
    # Default ciphertext batch for benchmarks/serving.
    batch_size: int = 256
    # Per-op profiler echo (reference-style "completed in X ms" prints).
    profile_echo: bool = False

    def params(self) -> GateBootstrappingParams:
        return {"128": default_128bit_params, "80": default_80bit_params,
                "test": test_params}[self.param_set]()

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self))

    @classmethod
    def from_json(cls, s: str) -> "FrameworkConfig":
        return cls(**json.loads(s))


DEFAULT_CONFIG = FrameworkConfig()
