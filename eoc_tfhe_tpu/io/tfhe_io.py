"""tfhe_io-compatible serialization codec.

Re-implements the reference core's serialization layer (upstream
``tfhe_io.cpp`` / ``tfhe_generic_streams.cpp``; wrapper call sites
``export_tfheGateBootstrappingSecretKeySet_toStream`` at
``/root/reference/ao-tfhe/eoc-tfhe-run.cpp:236`` and
``export/import_lweSample`` at ``:264,294,331,372,409,444-445,454,487-488,497``).

Format evidence extracted from the shipped reference binary
(``WcCL.../process.wasm`` — data-segment strings and a disassembly of
``import_lweSample_fromStream``):

  * Text-mode property sections with markers ``-----BEGIN <TITLE>-----`` /
    ``-----END <TITLE>-----`` and ``key: value`` lines
    (``MapTextModeProperties`` / ``print_TextModeProperties_toOStream``
    in the wasm name section). Section titles present in the binary:
    ``LWEPARAMS``, ``TLWEPARAMS``, ``TGSWPARAMS``, ``LWEKSPARAMS``,
    ``GATEBOOTSPARAMS``. Property keys present: ``alpha_min``, ``alpha_max``,
    ``Bgbit``, ``ks_basebit`` (shorter keys such as ``n``/``N``/``k``/``l``/
    ``ks_t`` are SSO-inlined in code and invisible to a string scan).
  * Binary records carry a little-endian int32 type UID; the UID table
    embedded in the wasm data segment (offset 0x352656-region) is
    ``{42, 43, 169, 200, 201}``, and ``import_lweSample_fromStream``
    checks UID 42.

UID assignment below is **verified by disassembly** of the shipped wasm
(round-3; tooling in ``scripts/wasm_pin_codec.py``).  The UID table lives at
memory address 352656 (five consecutive int32s ``{42, 43, 169, 200, 201}``),
and every record write is a ``fwrite(this, &table[i], 4)`` virtual call whose
pointer immediate pins the mapping:

  * 42  LweSample — ``export_lweSample_toStream`` writes ``&table+0``
    (code pc 904217); ``import_lweSample_fromStream`` aborts unless the read
    UID equals 42 (pc 863?822 region).  Record: uid,a[n]i32,b i32,var f64.
  * 43  LweKey — keyset export pc 875739; record: uid + key[n] int32 (one
    4n-byte write, pc 875800 region).
  * 169 TGswKey — keyset export pc 875890 (last record); uid + raw key
    polynomial coefficients (k*N int32).
  * 200 LweKeySwitchKey — keyset export pc 874242; record: uid,
    max-variance f64 (max of all entry variances, computed in a triple loop
    over the 24-byte LweSample structs at pc 873918-874212), then for
    (i<n_in, j<t, u<base): a[n_out] int32 + b int32 (no per-sample uid/var;
    write sites pc 874484/874541), then uid + max-variance AGAIN as a
    trailer (pc 874662/874723 — same frame slot, same bytes).
  * 201 LweBootstrappingKey bk — keyset export pc 875165; record: uid,
    max-variance f64 (loop over 32-byte TLweSample structs, variance at
    offset 16, pc 874900-875100), then for (i<n, row<kpl, u<k+1): raw
    polynomial coefficients (N int32 each, pc 875443/875508/875625).  No
    trailer.

Keyset record order (pinned by the emscripten EH labels 52..99, which
increment in execution order): GATEBOOTSPARAMS, LWEPARAMS, TLWEPARAMS,
TGSWPARAMS text sections; LWEKSPARAMS text + keyswitch record (200);
bootstrapping-key record (201); LweKey (43); TGswKey (169).

SSO-inlined short property keys (invisible to a string scan) recovered from
the i32 char constants + length pairs at the ``setProperty`` call sites:
LWEPARAMS {``n``(110), alpha_min, alpha_max}; TLWEPARAMS {``N``(78),
``k``(107), alpha_min, alpha_max}; TGSWPARAMS {``l``(108), Bgbit};
LWEKSPARAMS {``n``(110), ``t``(116), ``basebit``}; GATEBOOTSPARAMS
{``ks_t``(len-4 SSO), ``ks_basebit``} — all matching this module's writers.

KNOWN VALIDATION GAP (r3 VERDICT missing #6): the disassembly pinning above
is the strongest evidence obtainable in this environment (no Node.js /
``@permaweb/ao-loader``, zero egress), but the bytes have never been diffed
against an actual execution of the shipped ``process.wasm``.  Residual risk:
a mis-read write site or an unobserved field.  To close it once a Node
toolchain is reachable: copy ``WcCL.../process.wasm`` to
``/root/reference/tests/process.wasm``, run the reference's own test suite
(``node --test --experimental-wasm-memory64``) with a hook dumping the
base64 key/ciphertext blobs, and byte-compare against
``export_secret_keyset`` / ``write_lwe_sample`` here (the tests run offline
in ``mode: "test"``).
"""

from __future__ import annotations

import base64
import io as _io
import struct

import numpy as np

from ..core.params import (GateBootstrappingParams, KeySwitchParams, LweParams,
                           TGswParams, TLweParams)
from .. import native

# All five verified from the wasm UID table at mem 352656 + the fwrite
# pointer immediates at each record-write site (module docstring).
LWE_SAMPLE_UID = 42
LWE_KEY_UID = 43
TGSW_KEY_UID = 169
KEYSWITCH_KEY_UID = 200
BOOTSTRAP_KEY_UID = 201
# Internal-only bulk TLweSample array records (sharded native key format,
# native codec fast path).  NOT part of the reference keyset format — the
# reference writes bk polynomials raw inside the 201 record; upstream's
# TLweSample UID is dead-code-eliminated from the artifact and unknowable
# from it.  The value collides with TGSW_KEY_UID by historical accident but
# the two record types never appear in the same stream.
TLWE_SAMPLE_UID = 169
TLWE_KEY_UID = 200

_I32 = struct.Struct("<i")
_F64 = struct.Struct("<d")


# ---------------------------------------------------------------------------
# Text-mode property sections.
# ---------------------------------------------------------------------------

def format_double_cpp(v: float) -> str:
    """Format a double exactly as ``std::ostream <<`` does by default.

    libc++/libstdc++ ostream insertion with default flags is printf
    ``%.6g``: 6 significant digits, trailing zeros stripped, >= 2 exponent
    digits (e.g. ``2^-15 -> "3.05176e-05"``, not Python repr's
    ``"3.0517578125e-05"``). This is deliberately lossy — matching the
    reference byte stream matters more than round-trip precision; binary
    records keep full f64 payloads.
    """
    return f"{float(v):.6g}"


def write_section(f, title: str, props: dict) -> None:
    f.write(f"-----BEGIN {title}-----\n".encode())
    for k, v in props.items():
        if isinstance(v, float):
            v = format_double_cpp(v)
        f.write(f"{k}: {v}\n".encode())
    f.write(f"-----END {title}-----\n".encode())


def read_section(f, expect_title: str | None = None) -> tuple[str, dict]:
    line = f.readline().decode().rstrip("\n")
    if not (line.startswith("-----BEGIN ") and line.endswith("-----")):
        raise ValueError(f"bad section header: {line!r}")
    title = line[len("-----BEGIN "):-len("-----")]
    if expect_title is not None and title != expect_title:
        raise ValueError(f"expected section {expect_title}, got {title}")
    props: dict = {}
    while True:
        raw = f.readline()
        if not raw:
            # readline() at EOF returns b"" forever — a truncated blob must
            # raise, not hang the host (r5 review finding)
            raise ValueError(f"truncated stream inside section {title}")
        line = raw.decode().rstrip("\n")
        if line == f"-----END {title}-----":
            return title, props
        k, _, v = line.partition(": ")
        props[k] = v


def _read_exact(f, nbytes: int) -> bytes:
    """f.read(n) with a hard length check: a short read means a truncated
    blob and must raise, not silently yield a short np.frombuffer array
    whose failure surfaces later as an opaque shape error (r5 review)."""
    data = f.read(nbytes)
    if len(data) != nbytes:
        raise ValueError(
            f"truncated stream: wanted {nbytes} bytes, got {len(data)}")
    return data


# ---------------------------------------------------------------------------
# Parameter sections.
# ---------------------------------------------------------------------------

def write_lwe_params(f, p: LweParams) -> None:
    write_section(f, "LWEPARAMS",
                  {"n": p.n, "alpha_min": p.alpha_min, "alpha_max": p.alpha_max})


def read_lwe_params(f) -> LweParams:
    _, pr = read_section(f, "LWEPARAMS")
    return LweParams(n=int(pr["n"]), alpha_min=float(pr["alpha_min"]),
                     alpha_max=float(pr["alpha_max"]))


def write_tlwe_params(f, p: TLweParams) -> None:
    write_section(f, "TLWEPARAMS",
                  {"N": p.N, "k": p.k, "alpha_min": p.alpha_min, "alpha_max": p.alpha_max})


def read_tlwe_params(f) -> TLweParams:
    _, pr = read_section(f, "TLWEPARAMS")
    return TLweParams(N=int(pr["N"]), k=int(pr["k"]), alpha_min=float(pr["alpha_min"]),
                      alpha_max=float(pr["alpha_max"]))


def write_tgsw_params(f, p: TGswParams) -> None:
    write_section(f, "TGSWPARAMS", {"l": p.l, "Bgbit": p.Bgbit})
    write_tlwe_params(f, p.tlwe_params)


def read_tgsw_params(f) -> TGswParams:
    _, pr = read_section(f, "TGSWPARAMS")
    tl = read_tlwe_params(f)
    return TGswParams(l=int(pr["l"]), Bgbit=int(pr["Bgbit"]), tlwe_params=tl)


def write_gate_params(f, p: GateBootstrappingParams) -> None:
    write_section(f, "GATEBOOTSPARAMS", {"ks_t": p.ks.t, "ks_basebit": p.ks.basebit})
    write_lwe_params(f, p.in_out_params)
    write_tgsw_params(f, p.tgsw_params)


def read_gate_params(f) -> GateBootstrappingParams:
    _, pr = read_section(f, "GATEBOOTSPARAMS")
    in_out = read_lwe_params(f)
    tgsw = read_tgsw_params(f)
    return GateBootstrappingParams(
        ks=KeySwitchParams(t=int(pr["ks_t"]), basebit=int(pr["ks_basebit"])),
        in_out_params=in_out, tgsw_params=tgsw)


# ---------------------------------------------------------------------------
# Binary records. Layout per upstream write_lweSample: UID, payload.
# ---------------------------------------------------------------------------

def write_lwe_sample(f, a: np.ndarray, b: int, variance: float) -> None:
    """``export_lweSample_toStream``: UID 42, a[n] int32 LE, b int32, variance f64."""
    f.write(_I32.pack(LWE_SAMPLE_UID))
    f.write(np.asarray(a, "<i4").tobytes())
    f.write(_I32.pack(int(np.int32(b))))
    f.write(_F64.pack(float(variance)))


def read_lwe_sample(f, n: int) -> tuple[np.ndarray, int, float]:
    (uid,) = _I32.unpack(f.read(4))
    if uid != LWE_SAMPLE_UID:
        raise ValueError(f"bad LweSample UID {uid}")
    a = np.frombuffer(_read_exact(f, 4 * n), "<i4").copy()
    (b,) = _I32.unpack(f.read(4))
    (var,) = _F64.unpack(f.read(8))
    return a, b, var


def lwe_sample_num_bytes(n: int) -> int:
    return 4 + 4 * n + 4 + 8


def write_lwe_key(f, key_coefs: np.ndarray) -> None:
    f.write(_I32.pack(LWE_KEY_UID))
    f.write(np.asarray(key_coefs, "<i4").tobytes())


def read_lwe_key(f, n: int) -> np.ndarray:
    (uid,) = _I32.unpack(f.read(4))
    if uid != LWE_KEY_UID:
        raise ValueError(f"bad LweKey UID {uid}")
    return np.frombuffer(_read_exact(f, 4 * n), "<i4").copy()


def write_tlwe_sample(f, polys: np.ndarray, variance: float) -> None:
    """(k+1, N) torus polys + variance."""
    f.write(_I32.pack(TLWE_SAMPLE_UID))
    f.write(np.asarray(polys, "<i4").tobytes())
    f.write(_F64.pack(float(variance)))


def read_tlwe_sample(f, k: int, N: int) -> tuple[np.ndarray, float]:
    (uid,) = _I32.unpack(f.read(4))
    if uid != TLWE_SAMPLE_UID:
        raise ValueError(f"bad TLweSample UID {uid}")
    polys = np.frombuffer(_read_exact(f, 4 * (k + 1) * N), "<i4").reshape(k + 1, N).copy()
    (var,) = _F64.unpack(f.read(8))
    return polys, var


def write_tlwe_key(f, key: np.ndarray) -> None:
    f.write(_I32.pack(TLWE_KEY_UID))
    f.write(np.asarray(key, "<i4").tobytes())


def read_tlwe_key(f, k: int, N: int) -> np.ndarray:
    (uid,) = _I32.unpack(f.read(4))
    if uid != TLWE_KEY_UID:
        raise ValueError(f"bad TLweKey UID {uid}")
    return np.frombuffer(_read_exact(f, 4 * k * N), "<i4").reshape(k, N).copy()


def write_tgsw_key(f, key: np.ndarray) -> None:
    f.write(_I32.pack(TGSW_KEY_UID))
    f.write(np.asarray(key, "<i4").tobytes())


def read_tgsw_key(f, k: int, N: int) -> np.ndarray:
    (uid,) = _I32.unpack(f.read(4))
    if uid != TGSW_KEY_UID:
        raise ValueError(f"bad TGswKey UID {uid}")
    return np.frombuffer(_read_exact(f, 4 * k * N), "<i4").reshape(k, N).copy()


# ---------------------------------------------------------------------------
# Bulk record arrays (native C++ codec when available, vectorized numpy
# fallback). The keyswitch key alone is n_in*t*base = 32,768 records at the
# default 128-bit parameters; record-at-a-time Python loops are the
# reference's one-sample-at-a-time pattern and are not acceptable here.
# ---------------------------------------------------------------------------

def pack_lwe_samples(a: np.ndarray, b: np.ndarray, var: np.ndarray) -> bytes:
    """(B, n), (B,), (B,) -> B concatenated UID-42 records."""
    out = native.pack_lwe_array(a, b, var)
    if out is not None:
        return out
    B, n = a.shape
    rec = np.empty((B, lwe_sample_num_bytes(n)), np.uint8)
    rec[:, :4] = np.frombuffer(_I32.pack(LWE_SAMPLE_UID), np.uint8)
    rec[:, 4:4 + 4 * n] = np.ascontiguousarray(a, "<i4").view(np.uint8).reshape(B, 4 * n)
    rec[:, 4 + 4 * n:8 + 4 * n] = (
        np.ascontiguousarray(b, "<i4").view(np.uint8).reshape(B, 4))
    rec[:, 8 + 4 * n:] = (
        np.ascontiguousarray(var, "<f8").view(np.uint8).reshape(B, 8))
    return rec.tobytes()


def unpack_lwe_samples(data: bytes, B: int, n: int):
    """Inverse of :func:`pack_lwe_samples` -> (a (B,n), b (B,), var (B,))."""
    out = native.unpack_lwe_array(data, B, n)
    if out is not None:
        return out
    rec = np.frombuffer(data, np.uint8)[: B * lwe_sample_num_bytes(n)]
    rec = rec.reshape(B, lwe_sample_num_bytes(n))
    uids = rec[:, :4].copy().view("<i4").ravel()
    if (uids != LWE_SAMPLE_UID).any():
        bad = int(np.argmax(uids != LWE_SAMPLE_UID))
        raise ValueError(f"bad LweSample UID at record {bad}")
    a = rec[:, 4:4 + 4 * n].copy().view("<i4").reshape(B, n)
    b = rec[:, 4 + 4 * n:8 + 4 * n].copy().view("<i4").ravel()
    var = rec[:, 8 + 4 * n:].copy().view("<f8").ravel()
    return a, b, var


#: Framework-extension UID for seeded (mask-compressed) LWE samples
#: (core/lwe.SeededLweCiphertext — the serving tier's upload format).  The
#: reference has no analog; the value is chosen OUTSIDE its verified UID
#: table {42, 43, 169, 200, 201} so reference-compat streams can never
#: contain (or be confused with) this record.
SEEDED_LWE_SAMPLE_UID = 242

#: uid i32 + 128-bit seed 4*u32 + b i32 + var f64 = 32 bytes/sample
#: (vs 12 + 4n for UID 42 — ~79x smaller at the 128-bit set's n=630).
#: The seed is 4 uint32 words (two pinned threefry2x32 keys whose output
#: streams XOR — core/lwe._expand_mask; 64-bit birthday bound on mask
#: collisions instead of 2^32, r5 review finding).
SEEDED_LWE_SAMPLE_BYTES = 4 + 16 + 4 + 8


def pack_seeded_lwe_samples(seed: np.ndarray, b: np.ndarray,
                            var: np.ndarray) -> bytes:
    """(B, 4) uint32, (B,), (B,) -> B concatenated UID-242 records."""
    B = seed.shape[0]
    assert seed.shape == (B, 4)
    rec = np.empty((B, SEEDED_LWE_SAMPLE_BYTES), np.uint8)
    rec[:, :4] = np.frombuffer(_I32.pack(SEEDED_LWE_SAMPLE_UID), np.uint8)
    rec[:, 4:20] = np.ascontiguousarray(seed, "<u4").view(np.uint8).reshape(B, 16)
    rec[:, 20:24] = np.ascontiguousarray(b, "<i4").view(np.uint8).reshape(B, 4)
    rec[:, 24:] = np.ascontiguousarray(var, "<f8").view(np.uint8).reshape(B, 8)
    return rec.tobytes()


def unpack_seeded_lwe_samples(data: bytes, B: int):
    """Inverse of :func:`pack_seeded_lwe_samples` -> (seed (B,4) uint32,
    b (B,), var (B,))."""
    rec = np.frombuffer(data, np.uint8)[: B * SEEDED_LWE_SAMPLE_BYTES]
    rec = rec.reshape(B, SEEDED_LWE_SAMPLE_BYTES)
    uids = rec[:, :4].copy().view("<i4").ravel()
    if (uids != SEEDED_LWE_SAMPLE_UID).any():
        bad = int(np.argmax(uids != SEEDED_LWE_SAMPLE_UID))
        raise ValueError(f"bad seeded-LweSample UID at record {bad}")
    seed = rec[:, 4:20].copy().view("<u4").reshape(B, 4)
    b = rec[:, 20:24].copy().view("<i4").ravel()
    var = rec[:, 24:].copy().view("<f8").ravel()
    return seed, b, var


def pack_tlwe_samples(polys: np.ndarray, var: np.ndarray) -> bytes:
    """(B, k+1, N), (B,) -> B concatenated UID-169 records."""
    out = native.pack_tlwe_array(polys, var)
    if out is not None:
        return out
    B = polys.shape[0]
    m = polys.size // B
    rec = np.empty((B, 4 + 4 * m + 8), np.uint8)
    rec[:, :4] = np.frombuffer(_I32.pack(TLWE_SAMPLE_UID), np.uint8)
    rec[:, 4:4 + 4 * m] = (
        np.ascontiguousarray(polys, "<i4").view(np.uint8).reshape(B, 4 * m))
    rec[:, 4 + 4 * m:] = (
        np.ascontiguousarray(var, "<f8").view(np.uint8).reshape(B, 8))
    return rec.tobytes()


def unpack_tlwe_samples(data: bytes, B: int, m: int):
    out = native.unpack_tlwe_array(data, B, m)
    if out is not None:
        return out
    rec = np.frombuffer(data, np.uint8)[: B * (4 + 4 * m + 8)]
    rec = rec.reshape(B, 4 + 4 * m + 8)
    uids = rec[:, :4].copy().view("<i4").ravel()
    if (uids != TLWE_SAMPLE_UID).any():
        bad = int(np.argmax(uids != TLWE_SAMPLE_UID))
        raise ValueError(f"bad TLweSample UID at record {bad}")
    polys = rec[:, 4:4 + 4 * m].copy().view("<i4").reshape(B, m)
    var = rec[:, 4 + 4 * m:].copy().view("<f8").ravel()
    return polys, var


# ---------------------------------------------------------------------------
# Composite: key-switching key, bootstrapping key, keysets.
# ---------------------------------------------------------------------------

def write_keyswitch_key(f, ks_packed: np.ndarray, variance: float,
                        basebit: int) -> None:
    """LWEKSPARAMS section + the UID-200 composite record.

    Wasm-pinned layout (module docstring): uid, max-variance f64, then per
    (i, j, u) the raw ``a[n_out] + b`` int32s — which is exactly one packed
    row — then uid + max-variance again as a trailer.  The samples blob is
    therefore a single contiguous dump of the packed table.
    """
    n_in, t, base, m = ks_packed.shape
    write_section(f, "LWEKSPARAMS", {"n": n_in, "t": t, "basebit": basebit})
    f.write(_I32.pack(KEYSWITCH_KEY_UID))
    f.write(_F64.pack(float(variance)))
    f.write(np.ascontiguousarray(ks_packed, "<i4").tobytes())
    f.write(_I32.pack(KEYSWITCH_KEY_UID))
    f.write(_F64.pack(float(variance)))


def read_keyswitch_key(f, n_out: int):
    _, pr = read_section(f, "LWEKSPARAMS")
    n_in, t, basebit = int(pr["n"]), int(pr["t"]), int(pr["basebit"])
    base = 1 << basebit
    (uid,) = _I32.unpack(f.read(4))
    if uid != KEYSWITCH_KEY_UID:
        raise ValueError(f"bad LweKeySwitchKey UID {uid}")
    (var,) = _F64.unpack(f.read(8))
    B = n_in * t * base * (n_out + 1)
    rows = np.frombuffer(_read_exact(f, 4 * B), "<i4").copy()
    (uid2,) = _I32.unpack(f.read(4))
    (var2,) = _F64.unpack(f.read(8))
    if uid2 != KEYSWITCH_KEY_UID or var2 != var:
        raise ValueError("bad LweKeySwitchKey trailer")
    return (rows.reshape(n_in, t, base, n_out + 1).astype(np.int32),
            var, basebit)


def write_bootstrapping_key(f, bk_rows: np.ndarray, bk_variance: float,
                            ks_packed: np.ndarray, ks_variance: float,
                            basebit: int) -> None:
    """Keyswitch key (LWEKSPARAMS + UID 200) then the UID-201 bk record:
    uid, max-variance f64, raw polynomial coefficients (wasm-pinned order)."""
    write_keyswitch_key(f, ks_packed, ks_variance, basebit)
    f.write(_I32.pack(BOOTSTRAP_KEY_UID))
    f.write(_F64.pack(float(bk_variance)))
    f.write(np.ascontiguousarray(bk_rows, "<i4").tobytes())


def read_bootstrapping_key(f, n: int, params: GateBootstrappingParams):
    tg = params.tgsw_params
    kpl, k, N = tg.kpl, tg.tlwe_params.k, tg.tlwe_params.N
    ks, ks_var, _ = read_keyswitch_key(f, params.n)
    (uid,) = _I32.unpack(f.read(4))
    if uid != BOOTSTRAP_KEY_UID:
        raise ValueError(f"bad LweBootstrappingKey UID {uid}")
    (bk_var,) = _F64.unpack(f.read(8))
    m = n * kpl * (k + 1) * N
    bk = np.frombuffer(_read_exact(f, 4 * m), "<i4").copy().reshape(n, kpl, k + 1, N)
    return bk.astype(np.int32), bk_var, ks, ks_var


def export_secret_keyset(keyset, params: GateBootstrappingParams) -> bytes:
    """``export_tfheGateBootstrappingSecretKeySet_toStream``.

    Wasm-pinned order: parameter sections, keyswitch key (LWEKSPARAMS +
    UID 200), bootstrapping key (UID 201), LweKey (43), TGswKey (169).
    """
    f = _io.BytesIO()
    write_gate_params(f, params)
    bk = keyset.cloud.bk
    write_bootstrapping_key(f, np.asarray(bk.bk), float(bk.bk_variance),
                            np.asarray(bk.ks.ks), float(bk.ks.variance),
                            params.ks.basebit)
    write_lwe_key(f, np.asarray(keyset.lwe_key.s))
    write_tgsw_key(f, np.asarray(keyset.tgsw_key.key))
    return f.getvalue()


def import_secret_keyset(data: bytes):
    """Inverse of :func:`export_secret_keyset`. Returns (SecretKeySet, params)."""
    import jax.numpy as jnp
    from ..core.keys import (BootstrappingKey, CloudKeySet, KeySwitchKey,
                             SecretKeySet)
    from ..core.lwe import LweKey
    from ..core.tlwe import TLweKey

    f = _io.BytesIO(data)
    params = read_gate_params(f)
    bk, bk_var, ks, ks_var = read_bootstrapping_key(f, params.n, params)
    s = read_lwe_key(f, params.n)
    tk = read_tgsw_key(f, params.k, params.N)
    keyset = SecretKeySet(
        lwe_key=LweKey(s=jnp.asarray(s)),
        tgsw_key=TLweKey(key=jnp.asarray(tk)),
        cloud=CloudKeySet(bk=BootstrappingKey(
            bk=jnp.asarray(bk), bk_variance=jnp.float32(bk_var),
            ks=KeySwitchKey(ks=jnp.asarray(ks), variance=jnp.float32(ks_var)))))
    return keyset, params


def export_cloud_keyset(cloud, params: GateBootstrappingParams) -> bytes:
    """``export_tfheGateBootstrappingCloudKeySet`` equivalent (the real
    "public key" the reference's stub ``generatePublicKey`` never exposed —
    SURVEY.md appendix A)."""
    f = _io.BytesIO()
    write_gate_params(f, params)
    bk = cloud.bk
    write_bootstrapping_key(f, np.asarray(bk.bk), float(bk.bk_variance),
                            np.asarray(bk.ks.ks), float(bk.ks.variance),
                            params.ks.basebit)
    return f.getvalue()


def import_cloud_keyset(data: bytes):
    import jax.numpy as jnp
    from ..core.keys import BootstrappingKey, CloudKeySet, KeySwitchKey

    f = _io.BytesIO(data)
    params = read_gate_params(f)
    bk, bk_var, ks, ks_var = read_bootstrapping_key(f, params.n, params)
    cloud = CloudKeySet(bk=BootstrappingKey(
        bk=jnp.asarray(bk), bk_variance=jnp.float32(bk_var),
        ks=KeySwitchKey(ks=jnp.asarray(ks), variance=jnp.float32(ks_var))))
    return cloud, params


# ---------------------------------------------------------------------------
# Base64 (the wrapper wraps every stream in base64, eoc-tfhe-run.cpp:48-90).
# ---------------------------------------------------------------------------

def b64encode(data: bytes) -> str:
    out = native.b64encode(data)
    if out is not None:
        return out
    return base64.b64encode(data).decode()


def b64decode(s: str) -> bytes:
    # The reference's decoder stops at the first non-alphabet char and
    # tolerates missing padding (eoc-tfhe-run.cpp:70-90); mirror that.
    out = native.b64decode(s)
    if out is not None:
        return out
    alphabet = set("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/")
    clean = []
    for ch in s:
        if ch not in alphabet:
            break
        clean.append(ch)
    t = "".join(clean)
    t += "=" * (-len(t) % 4)
    return base64.b64decode(t)
