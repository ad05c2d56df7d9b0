"""Native C++ codec vs the numpy fallback — byte-identical."""

import base64

import numpy as np
import pytest

from eoc_tfhe_tpu import native
from eoc_tfhe_tpu.io import tfhe_io


def _fallback_only(monkeypatch):
    monkeypatch.setattr(native, "pack_lwe_array", lambda *a: None)
    monkeypatch.setattr(native, "unpack_lwe_array", lambda *a: None)
    monkeypatch.setattr(native, "pack_tlwe_array", lambda *a: None)
    monkeypatch.setattr(native, "unpack_tlwe_array", lambda *a: None)
    monkeypatch.setattr(native, "b64encode", lambda *a: None)
    monkeypatch.setattr(native, "b64decode", lambda *a: None)


def test_native_builds():
    assert native.get_lib() is not None, "g++ codec build failed"


def test_b64_matches_stdlib_and_reference_truncation():
    rng = np.random.default_rng(0)
    for size in [0, 1, 2, 3, 10, 1000]:
        data = rng.integers(0, 256, size).astype(np.uint8).tobytes()
        assert native.b64encode(data) == base64.b64encode(data).decode()
        assert native.b64decode(base64.b64encode(data).decode()) == data
    # Reference semantics: decode stops at first non-alphabet char
    # (eoc-tfhe-run.cpp:70-90) and tolerates missing padding.
    assert native.b64decode("QUJD!garbage") == b"ABC"
    assert native.b64decode("QUJDRA") == b"ABCD"


def test_lwe_pack_native_vs_fallback(monkeypatch):
    rng = np.random.default_rng(1)
    B, n = 37, 630
    a = rng.integers(-2**31, 2**31, (B, n), dtype=np.int64).astype(np.int32)
    b = rng.integers(-2**31, 2**31, B, dtype=np.int64).astype(np.int32)
    var = rng.random(B)
    got_native = tfhe_io.pack_lwe_samples(a, b, var)
    ra, rb, rv = tfhe_io.unpack_lwe_samples(got_native, B, n)
    np.testing.assert_array_equal(ra, a)
    np.testing.assert_array_equal(rb, b)
    np.testing.assert_array_equal(rv, var)

    _fallback_only(monkeypatch)
    got_np = tfhe_io.pack_lwe_samples(a, b, var)
    assert got_np == got_native
    fa, fb, fv = tfhe_io.unpack_lwe_samples(got_native, B, n)
    np.testing.assert_array_equal(fa, a)
    np.testing.assert_array_equal(fb, b)
    np.testing.assert_array_equal(fv, var)


def test_tlwe_pack_native_vs_fallback(monkeypatch):
    rng = np.random.default_rng(2)
    B, k1, N = 12, 2, 64
    polys = rng.integers(-2**31, 2**31, (B, k1, N), dtype=np.int64).astype(np.int32)
    var = rng.random(B)
    got_native = tfhe_io.pack_tlwe_samples(polys, var)
    rp, rv = tfhe_io.unpack_tlwe_samples(got_native, B, k1 * N)
    np.testing.assert_array_equal(rp, polys.reshape(B, -1))
    np.testing.assert_array_equal(rv, var)

    _fallback_only(monkeypatch)
    assert tfhe_io.pack_tlwe_samples(polys, var) == got_native


def test_bad_uid_raises(monkeypatch):
    data = bytearray(tfhe_io.pack_lwe_samples(
        np.zeros((2, 4), np.int32), np.zeros(2, np.int32), np.zeros(2)))
    data[0] = 99
    with pytest.raises(ValueError, match="record 0"):
        tfhe_io.unpack_lwe_samples(bytes(data), 2, 4)
    _fallback_only(monkeypatch)
    with pytest.raises(ValueError, match="record 0"):
        tfhe_io.unpack_lwe_samples(bytes(data), 2, 4)
