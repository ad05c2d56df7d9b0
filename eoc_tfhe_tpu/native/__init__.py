"""Native (C++) host-side tier: ctypes bindings for the bulk codec.

The reference's host runtime is C/C++ (base64 + tfhe_io record streams,
``/root/reference/ao-tfhe/eoc-tfhe-run.cpp:48-90,236-265``); this package is
the equivalent native tier here. The library is built on demand with g++
(no pip deps; ctypes only) and every entry point has a numpy fallback in
``io/tfhe_io.py``, so the framework works without a toolchain.

Use :func:`get_lib` — returns the loaded CDLL or None.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "codec.cpp")
_SO = os.path.join(_DIR, f"libeoc_native_{sys.implementation.cache_tag}.so")

_lib: ctypes.CDLL | None = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def get_lib() -> ctypes.CDLL | None:
    """Load (building if needed) the native codec; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("EOC_TFHE_NO_NATIVE"):
        return None
    if not os.path.exists(_SO) or (
            os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    c_i64, c_u8p, c_i32p, c_f64p, c_charp = (
        ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double),
        ctypes.c_char_p)
    lib.eoc_b64_encode.restype = c_i64
    lib.eoc_b64_encode.argtypes = [c_u8p, c_i64, ctypes.c_void_p]
    lib.eoc_b64_decode.restype = c_i64
    lib.eoc_b64_decode.argtypes = [c_charp, c_i64, c_u8p]
    lib.eoc_pack_lwe_array.restype = None
    lib.eoc_pack_lwe_array.argtypes = [c_i32p, c_i32p, c_f64p, c_i64, c_i64, c_u8p]
    lib.eoc_unpack_lwe_array.restype = c_i64
    lib.eoc_unpack_lwe_array.argtypes = [c_u8p, c_i64, c_i64, c_i32p, c_i32p, c_f64p]
    lib.eoc_pack_tlwe_array.restype = None
    lib.eoc_pack_tlwe_array.argtypes = [c_i32p, c_f64p, c_i64, c_i64, c_u8p]
    lib.eoc_unpack_tlwe_array.restype = c_i64
    lib.eoc_unpack_tlwe_array.argtypes = [c_u8p, c_i64, c_i64, c_i32p, c_f64p]
    _lib = lib
    return _lib


def _u8(buf) -> ctypes.POINTER(ctypes.c_uint8):
    return buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _i32(arr) -> ctypes.POINTER(ctypes.c_int32):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _f64(arr) -> ctypes.POINTER(ctypes.c_double):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def b64encode(data: bytes) -> str | None:
    lib = get_lib()
    if lib is None:
        return None
    src = np.frombuffer(data, np.uint8)
    out = ctypes.create_string_buffer(4 * ((len(data) + 2) // 3) + 4)
    n = lib.eoc_b64_encode(_u8(src), len(data), out)
    return out.raw[:n].decode()


def b64decode(s: str) -> bytes | None:
    lib = get_lib()
    if lib is None:
        return None
    raw = s.encode()
    out = np.empty((len(raw) * 3) // 4 + 3, np.uint8)
    n = lib.eoc_b64_decode(raw, len(raw), _u8(out))
    return out[:int(n)].tobytes()


def pack_lwe_array(a: np.ndarray, b: np.ndarray, var: np.ndarray) -> bytes | None:
    lib = get_lib()
    if lib is None:
        return None
    a = np.ascontiguousarray(a, np.int32)
    b = np.ascontiguousarray(b, np.int32)
    var = np.ascontiguousarray(var, np.float64)
    B, n = a.shape
    out = np.empty(B * (4 + 4 * n + 4 + 8), np.uint8)
    lib.eoc_pack_lwe_array(_i32(a), _i32(b), _f64(var), B, n, _u8(out))
    return out.tobytes()


def unpack_lwe_array(data: bytes, B: int, n: int):
    lib = get_lib()
    if lib is None:
        return None
    src = np.frombuffer(data, np.uint8)
    a = np.empty((B, n), np.int32)
    b = np.empty(B, np.int32)
    var = np.empty(B, np.float64)
    bad = lib.eoc_unpack_lwe_array(_u8(src), B, n, _i32(a), _i32(b), _f64(var))
    if bad:
        raise ValueError(f"bad LweSample UID at record {int(bad) - 1}")
    return a, b, var


def pack_tlwe_array(polys: np.ndarray, var: np.ndarray) -> bytes | None:
    """polys: (B, k+1, N) or (B, m)."""
    lib = get_lib()
    if lib is None:
        return None
    polys = np.ascontiguousarray(polys, np.int32)
    B = polys.shape[0]
    m = polys.size // B
    var = np.ascontiguousarray(var, np.float64)
    out = np.empty(B * (4 + 4 * m + 8), np.uint8)
    lib.eoc_pack_tlwe_array(_i32(polys), _f64(var), B, m, _u8(out))
    return out.tobytes()


def unpack_tlwe_array(data: bytes, B: int, m: int):
    lib = get_lib()
    if lib is None:
        return None
    src = np.frombuffer(data, np.uint8)
    polys = np.empty((B, m), np.int32)
    var = np.empty(B, np.float64)
    bad = lib.eoc_unpack_tlwe_array(_u8(src), B, m, _i32(polys), _f64(var))
    if bad:
        raise ValueError(f"bad TLweSample UID at record {int(bad) - 1}")
    return polys, var
