"""Batching gate server — the production-serving tier.

The fused blind-rotate kernel reaches its throughput at batches of
hundreds-to-thousands of gates (ROOFLINE.md), while callers typically hold
one or a few ciphertexts.  This module aggregates concurrent gate requests
into padded device batches, runs ONE batched bootstrapped gate per (gate
kind, flush), and scatters the results back — the TPU-serving analog of the
reference's one-message-at-a-time wasm loop (which has no batching tier at
all; every ``handle`` call pays a full single bootstrap).

Design:
  * pure-functional core ops underneath; the server owns only queues;
  * one background worker thread drives the device (JAX dispatch is not
    re-entrant-friendly across threads; a single submitter serializes it);
  * flush policy: ``max_batch`` gates or ``max_delay_s`` since the oldest
    queued request, whichever first — the standard latency/throughput knob;
  * per-kind queues (nand/and_/or_/xor_/...): one compiled program per kind,
    reused across flushes (padded to pow2-ish buckets to bound recompiles);
  * **seeded uploads**: requests may carry ``SeededLweCiphertext`` inputs
    (mask = PRNG seed, 12 B instead of 2,524 B per operand) — the masks are
    re-derived on-device inside the gate program, eliminating the
    host->device upload that dominated the r4 serving gap (ROOFLINE.md:
    ~10 MB per 2,048-gate flush over a ~20 MB/s relay);
  * **pipelined flushes**: a batch executes in chunks with async
    device->host copies, so result download overlaps the next chunk's
    compute (measured: 2x1024 pipelined 0.44 s vs 0.60 s serial).

No external dependencies; ``concurrent.futures.Future`` is the result
handle.
"""

from __future__ import annotations

import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from .core import gates
from .core.lwe import LweCiphertext, SeededLweCiphertext, lwe_seeded_expand
from .core.bootstrap import EvalKey
from .core.params import GateBootstrappingParams

#: Two-input gate kinds servable by name.
GATE_FNS = {name: getattr(gates, name)
            for name in ("nand", "and_", "or_", "nor", "xor_", "xnor",
                         "andny", "andyn", "orny", "oryn")}

#: Three-input kinds (submit(kind, c, a, b) — selector first, matching
#: ``gates.mux``; upstream ``bootsMUX`` is the one 3-input gate).
GATE_FNS3 = {"mux": gates.mux}


def _circuit_fns():
    from .circuits import adder
    return {"add_u8": adder.ripple_carry_add, "sub_u8": adder.ripple_borrow_sub,
            "mul_u8": adder.ripple_mul}


def _bucket(n: int, max_batch: int) -> int:
    """Smallest power-of-two >= n (capped) — bounds compile variants."""
    b = 1
    while b < n:
        b *= 2
    return min(b, max_batch)


@dataclass
class _Request:
    ca: LweCiphertext
    cb: LweCiphertext
    future: Future
    cc: LweCiphertext | None = None      # third operand (mux only)
    t_enqueue: float = field(default_factory=time.monotonic)


class GateServer:
    """Aggregates two-input boolean-gate requests into batched bootstraps.

    Usage::

        srv = GateServer(ek, params, max_batch=1024, max_delay_s=0.005)
        srv.start()
        fut = srv.submit("nand", ca, cb)     # ca/cb: single LWE ciphertexts
        out = fut.result()                    # LweCiphertext
        srv.stop()
    """

    def __init__(self, ek: EvalKey, params: GateBootstrappingParams,
                 max_batch: int = 1024, max_delay_s: float = 0.005,
                 rotation_impl: str = "auto", pipeline_chunk: int = 128):
        self.ek = ek
        self.params = params
        self.max_batch = max_batch
        self.max_delay_s = max_delay_s
        self.rotation_impl = rotation_impl
        #: Batches larger than this execute as a pipeline of chunks with
        #: async D2H so result download overlaps the next chunk's compute.
        #: Measured on v5e at 2,048 seeded requests (r5 sweeps, exact
        #: plan): 64 -> 2,289 gates/s (half the kernel's 128-lane tile
        #: wasted), 128 -> 4,161, 256 -> 4,073, 2048 (no overlap) -> 3,799;
        #: default 128 = the kernel tile.
        self.pipeline_chunk = pipeline_chunk
        # Queues keyed (gate kind, seeded?) — a flush batch must be
        # homogeneous in input representation to stack into one program.
        self._queues: dict[tuple[str, bool], list[_Request]] = {
            (k, s): [] for k in (*GATE_FNS, *GATE_FNS3, *_circuit_fns())
            for s in (False, True)}
        # One jitted program per gate kind (jax re-specializes per bucket
        # shape); eval key passes as an argument — never baked into the HLO.
        self._compiled: dict[str, object] = {}
        self._lock = threading.Lock()
        # Serializes _run_batch across threads: flush() runs batches on the
        # calling thread while the worker may be mid-batch (r4 ADVICE low) —
        # device dispatch, self._compiled and self.stats are only touched
        # while holding this lock.
        self._exec_lock = threading.Lock()
        self._wake = threading.Event()
        self._stop = False
        self._thread: threading.Thread | None = None
        self.stats = {"flushes": 0, "gates": 0, "padded_slots": 0}

    # -- client side -------------------------------------------------------

    def submit(self, kind: str, ca, cb, cc=None) -> Future:
        """Queue one gate.  Operands: scalar-batch ``LweCiphertext`` or
        ``SeededLweCiphertext`` (all the same representation — seeded is the
        wire-efficient upload, see module docstring).  Two-input kinds take
        (ca, cb); ``"mux"`` takes (c, a, b) — selector first, like
        ``gates.mux``."""
        if kind in GATE_FNS3:
            if cc is None:
                raise ValueError(f"gate kind {kind!r} takes three operands")
        elif kind in GATE_FNS:
            if cc is not None:
                raise ValueError(f"gate kind {kind!r} takes two operands")
        else:
            raise ValueError(f"unknown gate kind {kind!r}; one of "
                             f"{sorted(GATE_FNS) + sorted(GATE_FNS3)}")
        ops = (ca, cb) if cc is None else (ca, cb, cc)
        seeded = isinstance(ca, SeededLweCiphertext)
        if any(isinstance(o, SeededLweCiphertext) != seeded for o in ops):
            raise ValueError("operands must all be seeded or all plain")
        if any(np.ndim(o.b) != 0 for o in ops):
            raise ValueError("submit() takes single (scalar-batch) ciphertexts")
        fut: Future = Future()
        with self._lock:
            if self._stop:
                raise RuntimeError("server stopped")
            self._queues[kind, seeded].append(_Request(ca, cb, fut, cc=cc))
        self._wake.set()
        return fut

    def submit_uint8(self, op: str, ca_bits, cb_bits) -> Future:
        """Queue a whole bootstrapped 8-bit operation (``"add"``/``"sub"``/
        ``"mul"``, mod 256).  Operands: ``LweCiphertext`` or ``SeededLweCiphertext``
        with batch shape (8,) — one gate-encoded bit per slot, LSB first
        (the ``api.tfhe`` uint8 wire layout).  Requests batch across
        CLIENTS: one flush runs the ripple circuit once for the whole
        stacked batch (fast mode: one MAJ bootstrap/bit + one batched
        refresh — circuits/adder.py), so per-request
        cost approaches the batched gate rate."""
        if op not in ("add", "sub", "mul"):
            raise ValueError(f"unknown uint8 op {op!r}; 'add', 'sub' or 'mul'")
        seeded = isinstance(ca_bits, SeededLweCiphertext)
        if seeded != isinstance(cb_bits, SeededLweCiphertext):
            raise ValueError("operands must both be seeded or both plain")
        if tuple(np.shape(ca_bits.b)) != (8,) or \
                tuple(np.shape(cb_bits.b)) != (8,):
            raise ValueError("submit_uint8 takes (8,)-batch bit ciphertexts")
        fut: Future = Future()
        with self._lock:
            if self._stop:
                raise RuntimeError("server stopped")
            self._queues[f"{op}_u8", seeded].append(
                _Request(ca_bits, cb_bits, fut))
        self._wake.set()
        return fut

    # -- lifecycle ---------------------------------------------------------

    def start(self) -> "GateServer":
        if self._thread is None:
            self._thread = threading.Thread(target=self._run, daemon=True,
                                            name="eoc-gate-server")
            self._thread.start()
        return self

    def stop(self, drain: bool = True) -> None:
        if drain:
            self.flush()
        with self._lock:
            self._stop = True
        self._wake.set()
        if self._thread is not None:
            self._thread.join(timeout=30)
            self._thread = None

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()

    # -- server side -------------------------------------------------------

    def flush(self) -> int:
        """Synchronously run everything queued (any thread). Returns the
        number of gates executed."""
        done = 0
        while True:
            batch = self._take_ready(force=True)
            if batch is None:
                return done
            done += self._run_batch(*batch)

    def _take_ready(self, force: bool) -> tuple[str, list[_Request]] | None:
        now = time.monotonic()
        with self._lock:
            best: str | None = None
            for kind, q in self._queues.items():
                if not q:
                    continue
                due = force or len(q) >= self.max_batch or \
                    (now - q[0].t_enqueue) >= self.max_delay_s
                if due and (best is None or
                            len(q) > len(self._queues[best])):
                    best = kind
            if best is None:
                return None
            q = self._queues[best]
            take, self._queues[best] = q[: self.max_batch], q[self.max_batch:]
            return best, take

    def _run_batch(self, qkey: tuple[str, bool], reqs: list[_Request]) -> int:
        with self._exec_lock:
            return self._run_batch_locked(qkey, reqs)

    def _gate_program(self, qkey: tuple[str, bool]):
        gate = self._compiled.get(qkey)
        if gate is None:
            kind, seeded = qkey
            circuits = _circuit_fns()
            is_circuit = kind in circuits
            base = circuits.get(kind) or GATE_FNS3.get(kind) or GATE_FNS[kind]
            nops = 3 if kind in GATE_FNS3 else 2
            n = self.params.n

            @jax.jit
            def gate(*flat_and_ek):
                ek = flat_and_ek[-1]
                cts = []
                for o in range(nops):
                    m, b, v = flat_and_ek[3 * o: 3 * o + 3]
                    if seeded:
                        # masks re-derived on-device from the 16 B seeds
                        ct = lwe_seeded_expand(SeededLweCiphertext(m, b, v), n)
                    else:
                        ct = LweCiphertext(m, b, v)
                    if is_circuit:
                        # stacked (Bc, 8, ...) -> circuit layout (8, Bc, ...)
                        ct = LweCiphertext(
                            a=jnp.swapaxes(ct.a, 0, 1),
                            b=jnp.swapaxes(ct.b, 0, 1),
                            current_variance=jnp.swapaxes(
                                ct.current_variance, 0, 1))
                    cts.append(ct)
                if is_circuit:
                    out, _flag = base(*cts, ek, self.params,
                                      self.rotation_impl)
                    return (jnp.swapaxes(out.a, 0, 1),
                            jnp.swapaxes(out.b, 0, 1),
                            jnp.swapaxes(out.current_variance, 0, 1))
                out = base(*cts, ek, self.params, self.rotation_impl)
                return out.a, out.b, out.current_variance

            self._compiled[qkey] = gate
        return gate

    def _run_batch_locked(self, qkey: tuple[str, bool],
                          reqs: list[_Request]) -> int:
        _kind, seeded = qkey
        B = len(reqs)
        Bp = _bucket(B, self.max_batch)
        chunk = min(self.pipeline_chunk, Bp)
        try:
            # stack + pad to the bucket (repeat the last request — results
            # for pad slots are discarded; repeating keeps inputs valid).
            # Stacking happens on the HOST, then one device transfer per
            # operand per chunk: jnp.stack over N rows would dispatch N tiny
            # host->device copies (measured pathological through the relay).
            mask_field = "seed" if seeded else "a"

            def stack(cts):
                rows = [(np.asarray(getattr(c, mask_field)), np.asarray(c.b),
                         np.asarray(c.current_variance)) for c in cts]
                rows += [rows[-1]] * (Bp - B)
                return (np.stack([r[0] for r in rows]),
                        np.stack([r[1] for r in rows]),
                        np.stack([r[2] for r in rows]))

            stacks = [stack([r.ca for r in reqs]), stack([r.cb for r in reqs])]
            if _kind in GATE_FNS3:
                stacks.append(stack([r.cc for r in reqs]))
            flat = tuple(x for s in stacks for x in s)
            gate = self._gate_program(qkey)

            # Pipelined chunks: dispatch every chunk's H2D + compute + async
            # D2H before blocking on any result — the relay download of
            # chunk k overlaps the compute of chunk k+1 (module docstring).
            outs = []
            for o in range(0, Bp, chunk):
                args = [jnp.asarray(x[o:o + chunk]) for x in flat]
                out = gate(*args, self.ek)
                for x in out:
                    x.copy_to_host_async()
                outs.append(out)
            parts = [jax.device_get(o) for o in outs]
            oa = np.concatenate([p[0] for p in parts])
            ob = np.concatenate([p[1] for p in parts])
            ov = np.concatenate([p[2] for p in parts])
        except Exception as exc:   # surface the failure on every future
            for r in reqs:
                if not r.future.cancelled():
                    r.future.set_exception(exc)
            return 0
        for i, r in enumerate(reqs):
            if not r.future.cancelled():
                r.future.set_result(LweCiphertext(
                    a=oa[i], b=ob[i], current_variance=ov[i]))
        self.stats["flushes"] += 1
        self.stats["gates"] += B
        self.stats["padded_slots"] += Bp - B
        return B

    def _run(self) -> None:
        while True:
            with self._lock:
                if self._stop and not any(self._queues.values()):
                    return
            batch = self._take_ready(force=False)
            if batch is not None:
                self._run_batch(*batch)
                continue
            # nothing due: sleep until the next deadline or a new submit
            with self._lock:
                oldest = min((q[0].t_enqueue for q in self._queues.values()
                              if q), default=None)
                stopping = self._stop
            if oldest is None:
                if stopping:
                    return
                self._wake.wait(timeout=0.05)
            else:
                wait = self.max_delay_s - (time.monotonic() - oldest)
                if wait > 0:
                    self._wake.wait(timeout=wait)
            self._wake.clear()
