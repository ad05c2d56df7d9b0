"""Deterministic message-driven process runtime — the AO/aos analog.

The reference runs inside an AO "process": a deterministic Lua VM whose entire
state is a pure function of the message log, exposed to the host as a single
wasm export ``handle(msgJSON, envJSON)`` (``tests/process.js:4755``; message
dispatch via the aos ``Handlers`` registry — SURVEY.md §3.1-3.2). Determinism
is what makes blockchain replay possible: any node re-derives state by
replaying messages (SURVEY.md §5 failure-recovery notes).

This module provides the TPU-native equivalent:

  * :class:`Process` — a handler registry + message log; ``handle(msg, env)``
    takes/returns JSON strings exactly like the wasm export.
  * Determinism by construction: the process seed derives from
    (Block-Height, Owner, Module, Id) like the aos ``.crypto`` RNG (wasm
    string ``chance.seed(tonumber(msg['Block-Height'] .. stringToSeed(...)))``),
    and all crypto randomness flows from explicit jax.random keys.
  * :meth:`Process.replay` — rebuild identical state from a message log
    (elastic recovery: a fresh host re-shards from the replayed state).

Instead of the reference's ``Eval`` handler (which ``load()``s arbitrary Lua,
``tests/tfhe.test.js:64-71``), dispatch is by ``Action`` tag over the same
operation set — same capability, no arbitrary code execution.
"""

from __future__ import annotations

import hashlib
import json
from typing import Callable

from .api.tfhe import Tfhe
from .core.params import GateBootstrappingParams


def _seed_from_env(env: dict, msg: dict) -> int:
    """Deterministic seed from chain coordinates (aos .crypto seeding scheme)."""
    proc = env.get("Process", {})
    material = "|".join(str(x) for x in (
        msg.get("Block-Height", 0), proc.get("Owner", ""),
        proc.get("Module", ""), proc.get("Id", "")))
    return int.from_bytes(hashlib.sha256(material.encode()).digest()[:8], "little")


class Process:
    """A deterministic TFHE process: state = f(message log)."""

    def __init__(self, params: GateBootstrappingParams | None = None):
        self._params = params
        self.tfhe: Tfhe | None = None
        self.log: list[tuple[str, str]] = []
        self.handlers: dict[str, Callable[[dict, dict], str]] = {}
        self._register_defaults()

    # -- handler registry (aos ``Handlers.add`` analog) --------------------

    def add_handler(self, action: str, fn: Callable[[dict, dict], str]) -> None:
        self.handlers[action] = fn

    def _register_defaults(self) -> None:
        def tags(msg):
            return {t["name"]: t["value"] for t in msg.get("Tags", [])}

        self.add_handler("Info", lambda m, e: self._t().info())
        self.add_handler("TestJWT", lambda m, e: str(self._t().testJWT()))
        self.add_handler("GenerateSecretKey", lambda m, e: self._t().generateSecretKey(
            tags(m).get("Token", "a.b"), tags(m).get("JWKS", "")) or "")
        self.add_handler("GeneratePublicKey", lambda m, e: self._t().generatePublicKey())
        self.add_handler("EncryptInteger", lambda m, e: self._t().encryptInteger(
            int(tags(m).get("Value", m.get("Data", "0")))))
        self.add_handler("DecryptInteger", lambda m, e: str(self._t().decryptInteger(
            m.get("Data", ""), "", tags(m).get("Token", "a.b"), "")))
        self.add_handler("EncryptASCIIString", lambda m, e: self._t().encryptASCIIString(
            m.get("Data", "")))
        self.add_handler("DecryptASCIIString", lambda m, e: self._t().decryptASCIIString(
            m.get("Data", ""), int(tags(m)["Length"]), "", tags(m).get("Token", "a.b"), "") or "")
        self.add_handler("AddCiphertexts", lambda m, e: self._t().addCiphertexts(
            *json.loads(m.get("Data", "[]"))))
        self.add_handler("SubtractCiphertexts", lambda m, e: self._t().subtractCiphertexts(
            *json.loads(m.get("Data", "[]"))))

    def _t(self) -> Tfhe:
        if self.tfhe is None:
            raise RuntimeError("process not initialized (no message seen yet)")
        return self.tfhe

    # -- the wasm-export-shaped entry point --------------------------------

    def handle(self, msg_json: str, env_json: str) -> str:
        """``handle(msgJSON, envJSON) -> responseJSON`` (tests/process.js:4755).

        Response shape mirrors ao-loader results:
        ``{"Output": {"data": {"output": ...}}, "Messages": [], "Error": ...}``.
        """
        msg = json.loads(msg_json)
        env = json.loads(env_json)
        if self.tfhe is None:
            seed = _seed_from_env(env, msg)
            self.tfhe = Tfhe(params=self._params, seed=seed)
        self.log.append((msg_json, env_json))

        tags = {t["name"]: t["value"] for t in msg.get("Tags", [])}
        action = tags.get("Action", "")
        try:
            handler = self.handlers.get(action)
            if handler is None:
                return json.dumps({"Output": {"data": {"output": ""}},
                                   "Messages": [],
                                   "Error": f"no handler for Action {action!r}"})
            out = handler(msg, env)
            return json.dumps({"Output": {"data": {"output": out}},
                               "Messages": [], "Error": None})
        except Exception as exc:  # deterministic error surface, process survives
            return json.dumps({"Output": {"data": {"output": ""}},
                               "Messages": [], "Error": f"{type(exc).__name__}: {exc}"})

    # -- replay / recovery --------------------------------------------------

    def replay(self) -> "Process":
        """Re-derive an identical process from this process's message log."""
        fresh = Process(params=self._params)
        for msg_json, env_json in self.log:
            fresh.handle(msg_json, env_json)
        return fresh

    @classmethod
    def from_log(cls, log: list[tuple[str, str]],
                 params: GateBootstrappingParams | None = None) -> "Process":
        p = cls(params=params)
        for msg_json, env_json in log:
            p.handle(msg_json, env_json)
        return p
