"""High-level ``Tfhe`` API: parity surface with the reference Lua module.

Mirrors ``/root/reference/ao-tfhe/tfhe.lua`` (the ``Tfhe.*`` table) and the
C++ wrapper semantics (``eoc-tfhe-run.cpp``): base64-string ciphertexts, the
``Msize = 2^31 - 1`` integer encoding, ``alpha = 1/(10*Msize)`` leveled noise,
and the JWT gate. Two tiers:

  * :class:`TfheSession` — idiomatic, explicit-key, batched-capable API.
  * :class:`Tfhe` — reference-shaped facade with a process-global key
    (matching ``globalSecretKey``, ``eoc-tfhe-run.cpp:38``) for drop-in
    parity tests. Divergences from reference quirks (documented in
    SURVEY.md appendix A):
      - ``subtractCiphertexts`` really subtracts (the reference Lua layer
        aliases it to add, ``tfhe.lua:41-43``); ``addCiphertexts`` unchanged.
      - key arguments are honored when a session key is absent.
      - ``generatePublicKey`` actually exports the cloud key (the reference's
        binding is an empty stub, ``eoc-tfhe-bindings.c:51-57``).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..core import lwe
from ..core.numeric import (mod_switch_from_torus32_np, mod_switch_to_torus32_np)
from ..core.params import GateBootstrappingParams, default_128bit_params
from ..core.keys import SecretKeySet, new_random_gate_bootstrapping_secret_keyset
from ..io import tfhe_io
from .jwt import validate_jwt
from ..utils.profiling import op_timer

#: eoc-tfhe-run.cpp:34-36
MINIMUM_LAMBDA = 128
MSIZE = (1 << 31) - 1
ALPHA = 1.0 / (10.0 * MSIZE)


class TfheSession:
    """Explicit-key API over the reference wrapper's operation set."""

    def __init__(self, params: GateBootstrappingParams | None = None,
                 seed: int | None = None,
                 config: "FrameworkConfig | None" = None):
        from ..config import DEFAULT_CONFIG
        self.config = config or DEFAULT_CONFIG
        self.config.apply_profiling()
        if params is None:
            params = self.config.params()
        self.params = params
        if seed is None:
            # fresh OS entropy by default: a fixed default seed would make
            # every default-constructed session derive the IDENTICAL secret
            # key (r5 review).  Deterministic callers (AO processes, tests)
            # pass an explicit seed — replay derives it from chain
            # coordinates (process._seed_from_env).
            import os as _os
            seed = int.from_bytes(_os.urandom(8), "little") >> 1
        self._rng = jax.random.key(seed)
        self.keyset: SecretKeySet | None = None
        self._gate_api = None

    def gate_api(self):
        """Bound boolean-gate namespace (config's eval_key_form and
        rotation_impl wired in); built lazily on first use."""
        if self._gate_api is None:
            self._gate_api = self.config.make_gate_api(self._require_key(),
                                                       self.params)
        return self._gate_api

    def _next_key(self) -> jax.Array:
        self._rng, k = jax.random.split(self._rng)
        return k

    # -- key management ----------------------------------------------------

    def generate_secret_key(self) -> str:
        """Generate (once) and export the secret keyset as base64."""
        with op_timer("generateSecretKey"):
            if self.keyset is None:
                self.keyset = new_random_gate_bootstrapping_secret_keyset(
                    self._next_key(), self.params)
            blob = tfhe_io.export_secret_keyset(self.keyset, self.params)
            return tfhe_io.b64encode(blob)

    def generate_public_key(self) -> str:
        """Export the cloud (evaluation) keyset as base64."""
        if self.keyset is None:
            raise RuntimeError("Secret key not initialized. Generate the secret key first.")
        with op_timer("generatePublicKey"):
            blob = tfhe_io.export_cloud_keyset(self.keyset.cloud, self.params)
            return tfhe_io.b64encode(blob)

    def import_secret_key(self, b64: str) -> None:
        self.keyset, self.params = tfhe_io.import_secret_keyset(tfhe_io.b64decode(b64))
        # The cached gate API holds an eval key built from the PREVIOUS cloud
        # key; keeping it would make addUint8/subtractUint8 silently compute
        # under a stale key (round-4 ADVICE medium finding).
        self._gate_api = None

    def _require_key(self) -> SecretKeySet:
        if self.keyset is None:
            raise RuntimeError("Secret key not initialized. Generate the secret key first.")
        return self.keyset

    # -- integers (leveled; eoc-tfhe-run.cpp:282-310,393-425) --------------

    def encrypt_integer(self, value: int) -> str:
        ks = self._require_key()
        with op_timer("encryptInteger"):
            mu = mod_switch_to_torus32_np(int(value), MSIZE)
            ct = lwe.lwe_sym_encrypt(self._next_key(), jnp.asarray(mu), ALPHA,
                                     ks.lwe_key)
            f = tfhe_io._io.BytesIO()
            tfhe_io.write_lwe_sample(f, np.asarray(ct.a), int(ct.b),
                                     float(ct.current_variance))
            return tfhe_io.b64encode(f.getvalue())

    def decrypt_integer(self, b64_ct: str) -> int:
        ks = self._require_key()
        with op_timer("decryptInteger"):
            ct = self._import_lwe(b64_ct)
            phase = int(lwe.lwe_phase(ct, ks.lwe_key))
            return int(mod_switch_from_torus32_np(np.int32(phase), MSIZE))

    def _import_lwe(self, b64_ct: str) -> lwe.LweCiphertext:
        n = self.params.n
        f = tfhe_io._io.BytesIO(tfhe_io.b64decode(b64_ct))
        a, b, var = tfhe_io.read_lwe_sample(f, n)
        return lwe.LweCiphertext(a=jnp.asarray(a), b=jnp.int32(b),
                                 current_variance=jnp.float32(var))

    def _export_lwe(self, ct: lwe.LweCiphertext) -> str:
        f = tfhe_io._io.BytesIO()
        tfhe_io.write_lwe_sample(f, np.asarray(ct.a), int(ct.b),
                                 float(ct.current_variance))
        return tfhe_io.b64encode(f.getvalue())

    # -- ASCII strings (eoc-tfhe-run.cpp:312-391) --------------------------

    def encrypt_ascii_string(self, text: str) -> str:
        ks = self._require_key()
        with op_timer("encryptASCIIString"):
            vals = np.frombuffer(text.encode("ascii"), np.uint8).astype(np.int64)
            mus = mod_switch_to_torus32_np(vals, MSIZE)
            ct = lwe.lwe_sym_encrypt(self._next_key(), jnp.asarray(mus), ALPHA,
                                     ks.lwe_key)
            # Bulk codec: one vectorized pack of all per-char UID-42 records
            # (identical bytes to per-record write_lwe_sample calls; the
            # reference loops one export per char, eoc-tfhe-run.cpp:330-334).
            return self._export_samples(ct)

    def decrypt_ascii_string(self, b64_ct: str, msg_length: int) -> str:
        ks = self._require_key()
        with op_timer("decryptASCIIString"):
            n = self.params.n
            data = tfhe_io.b64decode(b64_ct)
            a, b, _v = tfhe_io.unpack_lwe_samples(data, msg_length, n)
            ct = lwe.LweCiphertext(a=jnp.asarray(a), b=jnp.asarray(b),
                                   current_variance=jnp.zeros(msg_length,
                                                              jnp.float32))
            phases = np.asarray(lwe.lwe_phase(ct, ks.lwe_key))
            vals = mod_switch_from_torus32_np(phases.astype(np.int32), MSIZE)
            return "".join(chr(int(v) & 0xFF) for v in vals)

    # -- leveled arithmetic (eoc-tfhe-run.cpp:427-513) ---------------------

    def add_ciphertexts(self, b64_c1: str, b64_c2: str) -> str:
        self._require_key()
        with op_timer("addCiphertexts"):
            c1, c2 = self._import_lwe(b64_c1), self._import_lwe(b64_c2)
            return self._export_lwe(lwe.lwe_add(c1, c2))

    def subtract_ciphertexts(self, b64_c1: str, b64_c2: str) -> str:
        self._require_key()
        with op_timer("subtractCiphertexts"):
            c1, c2 = self._import_lwe(b64_c1), self._import_lwe(b64_c2)
            return self._export_lwe(lwe.lwe_sub(c1, c2))

    # -- bootstrapped integer arithmetic (beyond the reference) ------------
    # The reference's integer ops are leveled only (one LWE sample per int,
    # works solely because its alpha = 1/(10*Msize) noise never grows past
    # one addition chain).  These methods expose TRUE gate-bootstrapped
    # arithmetic through the same base64 string surface: a uint8 is 8 gate-
    # encoded LWE samples (mu = +-1/8), operations run the circuits layer
    # (ripple adder/subtractor/comparator), and noise resets at every gate —
    # unbounded composition depth.

    def encrypt_uint8_bits(self, value: int) -> str:
        """uint8 -> 8 gate-encoded LWE samples (LSB first), packed base64."""
        ks = self._require_key()
        with op_timer("encryptUint8Bits"):
            from ..core import gates as gates_mod
            bits = jnp.asarray([(int(value) >> i) & 1 for i in range(8)],
                               bool)
            ct = gates_mod.encrypt_bit(self._next_key(), bits, ks.lwe_key,
                                       self.params)
            return self._export_samples(ct)

    def decrypt_uint8_bits(self, b64_ct: str) -> int:
        ks = self._require_key()
        with op_timer("decryptUint8Bits"):
            ct = self._import_bits(b64_ct)
            from ..core import gates as gates_mod
            bits = np.asarray(gates_mod.decrypt_bit(ct, ks.lwe_key))
            return int(sum(int(b) << i for i, b in enumerate(bits)))

    def encrypt_uint8_bits_seeded(self, value: int) -> str:
        """uint8 -> 8 seeded gate-encoded samples (UID-242 records, 32 B
        each vs 2,532 B full — the wire-compressed upload format; every
        uint8 consumer accepts both via the UID sniff in ``_import_bits``)."""
        ks = self._require_key()
        with op_timer("encryptUint8BitsSeeded"):
            from ..core import gates as gates_mod
            bits = jnp.asarray([(int(value) >> i) & 1 for i in range(8)],
                               bool)
            ct = gates_mod.encrypt_bit_seeded(self._next_key(), bits,
                                              ks.lwe_key, self.params)
            blob = tfhe_io.pack_seeded_lwe_samples(
                np.asarray(ct.seed), np.asarray(ct.b),
                np.asarray(ct.current_variance, np.float64))
            return tfhe_io.b64encode(blob)

    def _import_bits(self, b64_ct: str) -> lwe.LweCiphertext:
        data = tfhe_io.b64decode(b64_ct)
        uid = int.from_bytes(data[:4], "little") if len(data) >= 4 else -1
        if uid == tfhe_io.SEEDED_LWE_SAMPLE_UID:
            seed, b, v = tfhe_io.unpack_seeded_lwe_samples(data, 8)
            return lwe.lwe_seeded_expand(
                lwe.SeededLweCiphertext(
                    seed=jnp.asarray(seed), b=jnp.asarray(b),
                    current_variance=jnp.asarray(v, jnp.float32)),
                self.params.n)
        a, b, v = tfhe_io.unpack_lwe_samples(data, 8, self.params.n)
        # Keep the unpacked per-sample variance (like _import_lwe does) so
        # the tracked noise rail sees the true input noise (r4 ADVICE low).
        return lwe.LweCiphertext(a=jnp.asarray(a), b=jnp.asarray(b),
                                 current_variance=jnp.asarray(v, jnp.float32))

    def _export_samples(self, ct) -> str:
        """One canonical LWE-batch export: pack_lwe_samples + base64 (the
        single place the wire byte layout is produced — r5 review dedup)."""
        blob = tfhe_io.pack_lwe_samples(
            np.asarray(ct.a), np.asarray(ct.b),
            np.asarray(ct.current_variance, np.float64))
        return tfhe_io.b64encode(blob)

    def _circuit_binop(self, op: str, b64_a: str, b64_b: str) -> str:
        self._require_key()
        from ..circuits import adder as circ
        api = self.gate_api()
        ca, cb = self._import_bits(b64_a), self._import_bits(b64_b)
        fn = {"add": circ.ripple_carry_add, "sub": circ.ripple_borrow_sub,
              "mul": circ.ripple_mul}[op]
        # honor config.rotation_impl like every other gate call (r5 review)
        out, _flag = fn(ca, cb, api.eval_key, api.params,
                        rotation_impl=self.config.rotation_impl)
        return self._export_samples(out)

    def add_uint8_bits(self, b64_a: str, b64_b: str) -> str:
        """Bootstrapped 8-bit addition (mod 256) — one MAJ bootstrap per bit
        + a batched refresh (circuits/adder.py fast mode), noise reset."""
        with op_timer("addUint8Bits"):
            return self._circuit_binop("add", b64_a, b64_b)

    def subtract_uint8_bits(self, b64_a: str, b64_b: str) -> str:
        """Bootstrapped 8-bit subtraction (mod 256) — the op the reference's
        Lua API aliases to addition (tfhe.lua:41-43), done for real."""
        with op_timer("subtractUint8Bits"):
            return self._circuit_binop("sub", b64_a, b64_b)

    def multiply_uint8_bits(self, b64_a: str, b64_b: str) -> str:
        """Bootstrapped 8-bit multiplication (mod 256) — array multiplier
        over the fast-adder machinery (circuits/adder.ripple_mul); no
        reference analog (its wrapper stops at leveled add/sub)."""
        with op_timer("multiplyUint8Bits"):
            return self._circuit_binop("mul", b64_a, b64_b)

    def _pack_bit_as_u8(self, bit_ct) -> str:
        """Pack a single bit ciphertext as a uint8 blob (value 0/1): the
        bit in slot 0, trivial-false pads above — interoperable with every
        uint8 op and decryptUint8."""
        from ..core import gates as gates_mod
        from ..core.lwe import lwe_stack
        pad = gates_mod.constant(
            jnp.zeros(bit_ct.b.shape, bool), self.params)
        word = lwe_stack([bit_ct] + [pad] * 7)
        return self._export_samples(word)

    def less_than_uint8_bits(self, b64_a: str, b64_b: str) -> str:
        """Bootstrapped unsigned comparison a < b: returns an encrypted
        uint8 0/1 (circuits/adder.compare_lt — one MAJ bootstrap/bit)."""
        self._require_key()
        from ..circuits import adder as circ
        api = self.gate_api()
        with op_timer("lessThanUint8Bits"):
            ca, cb = self._import_bits(b64_a), self._import_bits(b64_b)
            lt = circ.compare_lt(ca, cb, api.eval_key, api.params,
                                 rotation_impl=self.config.rotation_impl)
            return self._pack_bit_as_u8(lt)

    def equals_uint8_bits(self, b64_a: str, b64_b: str) -> str:
        """Bootstrapped equality a == b: encrypted uint8 0/1
        (circuits/adder.equals — XNOR tree + AND reduction)."""
        self._require_key()
        from ..circuits import adder as circ
        api = self.gate_api()
        with op_timer("equalsUint8Bits"):
            ca, cb = self._import_bits(b64_a), self._import_bits(b64_b)
            eq = circ.equals(ca, cb, api.eval_key, api.params,
                             rotation_impl=self.config.rotation_impl)
            return self._pack_bit_as_u8(eq)

    def select_uint8_bits(self, b64_c: str, b64_a: str, b64_b: str) -> str:
        """Bootstrapped select: bit 0 of c chooses a (1) or b (0) per-bit
        via MUX (circuits/adder.select_word)."""
        self._require_key()
        from ..circuits import adder as circ
        from ..core.lwe import lwe_index
        api = self.gate_api()
        with op_timer("selectUint8Bits"):
            cc = self._import_bits(b64_c)
            ca, cb = self._import_bits(b64_a), self._import_bits(b64_b)
            out = circ.select_word(lwe_index(cc, 0), ca, cb, api.eval_key,
                                   api.params,
                                   rotation_impl=self.config.rotation_impl)
            return self._export_samples(out)


class Tfhe:
    """Reference-shaped facade: the ``Tfhe.*`` Lua surface (tfhe.lua:4-53).

    Method names and argument order follow the Lua module; the JWT token/JWKS
    arguments gate the operations exactly where the reference gates them
    (generateSecretKey, decryptInteger, decryptASCIIString).
    """

    def __init__(self, params: GateBootstrappingParams | None = None,
                 seed: int = 0, config: "FrameworkConfig | None" = None):
        self._s = TfheSession(params, seed, config=config)
        self.config = self._s.config

    def _jwt_ok(self, token: str, jwks: str = "") -> bool:
        # config.enable_jwt=False disables the gate entirely (the published
        # reference module effectively runs this way, WcCL…/README.md:23-30).
        # config.jwt_rs256=True upgrades to real RS256 verification against
        # the supplied JWKS (api/jwt.verify_rs256).
        if not self.config.enable_jwt:
            return True
        if self.config.jwt_rs256:
            from .jwt import verify_rs256
            return verify_rs256(token, jwks)
        return validate_jwt(token)

    def info(self) -> str:
        return ("TFHE Library: Enabling fully homomorphic encryption computations "
                "on encrypted data.\nJWT support: Enabled\nOpenSSL support: Enabled")

    def testJWT(self) -> bool:
        # The reference encrypts/decrypts a demo string and structurally
        # validates a static token (eoc-tfhe-run.cpp:183-212).
        if self._s.keyset is not None:
            ct = self._s.encrypt_ascii_string("Hello Weavers!")
            assert self._s.decrypt_ascii_string(ct, 14) == "Hello Weavers!"
        return validate_jwt("header.payload")

    def generateSecretKey(self, token: str = "a.b", jwks: str = "") -> str | None:
        # Reference: invalid JWT -> nullptr (eoc-tfhe-run.cpp:216-219).
        if not self._jwt_ok(token, jwks):
            return None
        return self._s.generate_secret_key()

    def generatePublicKey(self, token: str = "", jwks: str = "") -> str:
        return self._s.generate_public_key()

    def encryptInteger(self, value: int, key: str = "") -> str:
        return self._s.encrypt_integer(value)

    # Reference alias quirk: encryptInteger_dummy is the same function
    # (eoc-tfhe-bindings.c:69-77).
    encryptInteger_dummy = encryptInteger

    def decryptInteger(self, ct: str, key: str = "", token: str = "a.b",
                       jwks: str = "") -> int:
        # validate UNCONDITIONALLY like the reference (eoc-tfhe-run.cpp:395)
        # — the old `if token` guard let an empty token bypass the gate
        # entirely (r5 review)
        if not self._jwt_ok(token, jwks):
            return -1
        return self._s.decrypt_integer(ct)

    def encryptASCIIString(self, text: str, length: int | None = None,
                           key: str = "") -> str:
        return self._s.encrypt_ascii_string(text if length is None else text[:length])

    def decryptASCIIString(self, ct: str, length: int, key: str = "",
                           token: str = "a.b", jwks: str = "") -> str | None:
        if not self._jwt_ok(token, jwks):   # unconditional (r5 review)
            return None
        return self._s.decrypt_ascii_string(ct, length)

    def addCiphertexts(self, c1: str, c2: str, key: str = "") -> str:
        return self._s.add_ciphertexts(c1, c2)

    def subtractCiphertexts(self, c1: str, c2: str, key: str = "") -> str:
        # Real subtraction (reference Lua aliases this to add, tfhe.lua:41-43).
        return self._s.subtract_ciphertexts(c1, c2)

    # -- bootstrapped 8-bit arithmetic (capability extension) --------------

    def encryptUint8(self, value: int, key: str = "") -> str:
        return self._s.encrypt_uint8_bits(int(value))

    def encryptUint8Seeded(self, value: int, key: str = "") -> str:
        """Wire-compressed (seeded-mask) uint8 encryption — decryptUint8 /
        addUint8 / subtractUint8 accept it interchangeably."""
        return self._s.encrypt_uint8_bits_seeded(int(value))

    def decryptUint8(self, ct: str, key: str = "", token: str = "a.b",
                     jwks: str = "") -> int:
        if not self._jwt_ok(token, jwks):
            raise PermissionError("JWT validation failed")
        return self._s.decrypt_uint8_bits(ct)

    def addUint8(self, c1: str, c2: str, key: str = "") -> str:
        return self._s.add_uint8_bits(c1, c2)

    def subtractUint8(self, c1: str, c2: str, key: str = "") -> str:
        return self._s.subtract_uint8_bits(c1, c2)

    def multiplyUint8(self, c1: str, c2: str, key: str = "") -> str:
        return self._s.multiply_uint8_bits(c1, c2)

    def lessThanUint8(self, c1: str, c2: str, key: str = "") -> str:
        """Encrypted (a < b) as a uint8 0/1 ciphertext."""
        return self._s.less_than_uint8_bits(c1, c2)

    def equalsUint8(self, c1: str, c2: str, key: str = "") -> str:
        """Encrypted (a == b) as a uint8 0/1 ciphertext."""
        return self._s.equals_uint8_bits(c1, c2)

    def selectUint8(self, c: str, c1: str, c2: str, key: str = "") -> str:
        """Encrypted select: bit 0 of c picks c1 (1) or c2 (0)."""
        return self._s.select_uint8_bits(c, c1, c2)
