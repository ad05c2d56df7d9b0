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

Dispatch is by ``Action`` tag over the reference's operation set, plus:

  * ``Eval`` — the aos ``_eval`` analog (``tests/tfhe.test.js:64-71``), but
    over a restricted expression grammar (:func:`_eval_restricted`) instead
    of arbitrary code: ``Tfhe.*`` calls, literals and variables persist
    across messages, nothing else.
  * ``Process.send`` / response ``Messages`` — the ``ao.send`` pattern;
    :class:`Router` delivers them between registered processes
    (``9qK8…/README.md:88-113``).
"""

from __future__ import annotations

import ast
import hashlib
import json
from typing import Callable

from .api.tfhe import Tfhe
from .core.params import GateBootstrappingParams


class EvalError(Exception):
    pass


def _eval_restricted(src: str, names: dict) -> tuple[object, dict]:
    """The ``Eval`` analog: run ``Tfhe.*`` expressions, safely.

    The reference's aos ``_eval`` handler ``load()``s arbitrary Lua
    (``tests/tfhe.test.js:64-71``); the TPU runtime keeps the capability
    (drive the full API from message Data, incl. variables across
    statements) but only admits a whitelisted expression grammar — method
    calls on known objects, literals, and names — no attribute escapes,
    no builtins, no statements with side channels.
    """
    tree = ast.parse(src, mode="exec")
    env = dict(names)
    result = None

    def ev(node):
        if isinstance(node, ast.Expression):
            return ev(node.body)
        if isinstance(node, ast.Constant):
            return node.value
        if isinstance(node, ast.Name):
            if node.id not in env:
                raise EvalError(f"unknown name {node.id!r}")
            return env[node.id]
        if isinstance(node, (ast.List, ast.Tuple)):
            return [ev(e) for e in node.elts]
        if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.USub):
            v = ev(node.operand)
            if not isinstance(v, (int, float)):
                raise EvalError("unary minus on non-number")
            return -v
        if isinstance(node, ast.BinOp) and isinstance(node.op, (ast.Add, ast.Sub)):
            a, b = ev(node.left), ev(node.right)
            if isinstance(node.op, ast.Add):
                return a + b
            return a - b
        if isinstance(node, ast.Call):
            fn = node.func
            if not (isinstance(fn, ast.Attribute) and isinstance(fn.value, ast.Name)):
                raise EvalError("only obj.method(...) calls are allowed")
            obj = env.get(fn.value.id)
            if obj is None or fn.value.id.startswith("_"):
                raise EvalError(f"unknown object {fn.value.id!r}")
            if fn.attr.startswith("_"):
                raise EvalError("private attributes are not callable")
            method = getattr(type(obj), fn.attr, None)
            if not callable(method):
                raise EvalError(f"no method {fn.attr!r} on {fn.value.id}")
            args = [ev(a) for a in node.args]
            return method(obj, *args)
        raise EvalError(f"disallowed syntax: {ast.dump(node)[:60]}")

    for stmt in tree.body:
        if isinstance(stmt, ast.Expr):
            result = ev(stmt.value)
        elif (isinstance(stmt, ast.Assign) and len(stmt.targets) == 1
              and isinstance(stmt.targets[0], ast.Name)):
            name = stmt.targets[0].id
            if name.startswith("_") or name == "Tfhe":
                raise EvalError(f"cannot assign to {name!r}")
            env[name] = ev(stmt.value)
            result = env[name]
        else:
            raise EvalError("only expressions and simple assignments allowed")
    return result, env


def _seed_from_env(env: dict, msg: dict) -> int:
    """Deterministic seed from chain coordinates (aos .crypto seeding scheme)."""
    proc = env.get("Process", {})
    material = "|".join(str(x) for x in (
        msg.get("Block-Height", 0), proc.get("Owner", ""),
        proc.get("Module", ""), proc.get("Id", "")))
    seed = int.from_bytes(hashlib.sha256(material.encode()).digest()[:8], "little")
    return seed & (2 ** 63 - 1)   # jax.random.key takes a signed 64-bit seed


class Process:
    """A deterministic TFHE process: state = f(message log)."""

    def __init__(self, params: GateBootstrappingParams | None = None,
                 process_id: str = ""):
        self._params = params
        self.id = process_id
        self.tfhe: Tfhe | None = None
        self.log: list[tuple[str, str]] = []
        self.handlers: dict[str, Callable[[dict, dict], str]] = {}
        self._eval_env: dict = {}
        self._outbox: list[dict] = []
        self._register_defaults()

    # -- outbound messages (``ao.send`` analog) -----------------------------

    def send(self, target: str, tags: dict | None = None,
             data: str = "") -> None:
        """Queue an outbound message; delivered in the response's
        ``Messages`` list (the AO pattern: processes communicate only
        through routed messages, ``9qK8…/README.md:88-113``)."""
        self._outbox.append({
            "Target": target,
            "From": self.id,
            "Tags": [{"name": k, "value": str(v)}
                     for k, v in (tags or {}).items()],
            "Data": data,
        })

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
        self.add_handler("Eval", self._handle_eval)
        self.add_handler("Send", self._handle_send)

    def _handle_eval(self, msg: dict, env: dict) -> str:
        names = dict(self._eval_env)
        names["Tfhe"] = self._t()
        result, names = _eval_restricted(msg.get("Data", ""), names)
        names.pop("Tfhe", None)
        self._eval_env = names
        return "" if result is None else str(result)

    def _handle_send(self, msg: dict, env: dict) -> str:
        """Forward Data to another process (tag Target), ao.send-style."""
        tags = {t["name"]: t["value"] for t in msg.get("Tags", [])}
        fwd = {k: v for k, v in tags.items()
               if k not in ("Action", "Target", "Forward-Action")}
        fwd["Action"] = tags.get("Forward-Action", "Eval")
        self.send(tags.get("Target", ""), fwd, msg.get("Data", ""))
        return "OK"

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
        self._outbox = []
        try:
            handler = self.handlers.get(action)
            if handler is None:
                return json.dumps({"Output": {"data": {"output": ""}},
                                   "Messages": [],
                                   "Error": f"no handler for Action {action!r}"})
            out = handler(msg, env)
            return json.dumps({"Output": {"data": {"output": out}},
                               "Messages": self._outbox, "Error": None})
        except Exception as exc:  # deterministic error surface, process survives
            return json.dumps({"Output": {"data": {"output": ""}},
                               "Messages": self._outbox,
                               "Error": f"{type(exc).__name__}: {exc}"})

    # -- replay / recovery --------------------------------------------------

    def replay(self) -> "Process":
        """Re-derive an identical process from this process's message log."""
        fresh = Process(params=self._params, process_id=self.id)
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


class Router:
    """Host-level message router between processes (the AO network analog).

    Delivers a message to its target process and recursively routes every
    message the handler emitted via :meth:`Process.send`, breadth-first,
    up to ``max_hops`` deliveries — deterministic fan-out, no network.
    """

    def __init__(self, max_hops: int = 64):
        self.processes: dict[str, Process] = {}
        self.max_hops = max_hops

    def register(self, process: Process) -> None:
        if not process.id:
            raise ValueError("process needs an id to be routable")
        self.processes[process.id] = process

    def push(self, target: str, msg: dict, env: dict | None = None) -> list[dict]:
        """Deliver msg to target; route produced messages. Returns the
        ordered list of handle() responses (parsed)."""
        env = env or {"Process": {"Id": target, "Owner": "ROUTER",
                                  "Module": "eoc-tfhe-tpu"}}
        queue = [(target, msg)]
        responses = []
        hops = 0
        while queue:
            if hops >= self.max_hops:
                raise RuntimeError(f"router exceeded {self.max_hops} hops")
            hops += 1
            tgt, m = queue.pop(0)
            proc = self.processes.get(tgt)
            if proc is None:
                responses.append({"Error": f"no process {tgt!r}", "Messages": []})
                continue
            penv = {"Process": {"Id": tgt, "Owner": env["Process"].get("Owner", ""),
                                "Module": env["Process"].get("Module", "")}}
            resp = json.loads(proc.handle(json.dumps(m), json.dumps(penv)))
            responses.append(resp)
            for out in resp.get("Messages", []):
                nm = {"Tags": out.get("Tags", []), "Data": out.get("Data", ""),
                      "From": out.get("From", tgt),
                      "Block-Height": m.get("Block-Height", 0)}
                queue.append((out.get("Target", ""), nm))
        return responses
