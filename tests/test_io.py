"""tfhe_io codec: round trips and layout invariants (SURVEY.md §7 step 3)."""

import io
import numpy as np
import jax
import pytest

from eoc_tfhe_tpu.core import keys, lwe
from eoc_tfhe_tpu.core.params import (default_128bit_params, default_80bit_params,
                                      test_params as make_test_params)
from eoc_tfhe_tpu.io import tfhe_io

P = make_test_params()


def test_params_sections_roundtrip():
    for params in (default_128bit_params(), default_80bit_params(), P):
        f = io.BytesIO()
        tfhe_io.write_gate_params(f, params)
        f.seek(0)
        back = tfhe_io.read_gate_params(f)
        # Integers round-trip exactly; doubles go through the C++ ostream
        # %.6g text form (reference behavior — 6 significant digits).
        assert (back.n, back.N, back.k, back.l, back.tgsw_params.Bgbit,
                back.ks.t, back.ks.basebit) == (
            params.n, params.N, params.k, params.l, params.tgsw_params.Bgbit,
            params.ks.t, params.ks.basebit)
        for got, want in [
            (back.in_out_params.alpha_min, params.in_out_params.alpha_min),
            (back.in_out_params.alpha_max, params.in_out_params.alpha_max),
            (back.tgsw_params.tlwe_params.alpha_min,
             params.tgsw_params.tlwe_params.alpha_min),
        ]:
            assert got == float(tfhe_io.format_double_cpp(want))
            assert abs(got - want) <= abs(want) * 1e-5


def test_double_formatting_matches_cpp_ostream():
    """%.6g semantics pinned (e.g. 2^-15 prints as 3.05176e-05, the C++
    ostream default — NOT Python repr's full precision)."""
    cases = {
        2.0 ** -15: "3.05176e-05",
        2.0 ** -25: "2.98023e-08",
        0.012467: "0.012467",
        0.0: "0",
        1.0: "1",
        1e20: "1e+20",
    }
    for v, want in cases.items():
        assert tfhe_io.format_double_cpp(v) == want, v


def test_params_section_format():
    f = io.BytesIO()
    tfhe_io.write_lwe_params(f, default_128bit_params().in_out_params)
    text = f.getvalue().decode()
    assert text.startswith("-----BEGIN LWEPARAMS-----\n")
    assert text.endswith("-----END LWEPARAMS-----\n")
    assert "n: 630" in text
    assert "alpha_max: 0.012467" in text


def test_lwe_sample_roundtrip_and_size():
    n = 630
    rng = np.random.default_rng(0)
    a = rng.integers(-(2**31), 2**31, size=n, dtype=np.int64).astype(np.int32)
    f = io.BytesIO()
    tfhe_io.write_lwe_sample(f, a, -12345, 1e-9)
    blob = f.getvalue()
    # UID(4) + 630*4 + 4 + 8 — the reference's on-the-wire LweSample size.
    assert len(blob) == tfhe_io.lwe_sample_num_bytes(n) == 2536
    assert blob[:4] == (42).to_bytes(4, "little")
    f.seek(0)
    a2, b2, v2 = tfhe_io.read_lwe_sample(f, n)
    np.testing.assert_array_equal(a2, a)
    assert b2 == -12345 and abs(v2 - 1e-9) < 1e-20


def test_secret_keyset_roundtrip():
    ks = keys.new_random_gate_bootstrapping_secret_keyset(jax.random.key(1), P)
    blob = tfhe_io.export_secret_keyset(ks, P)
    back, params2 = tfhe_io.import_secret_keyset(blob)
    assert params2 == P
    np.testing.assert_array_equal(np.asarray(back.lwe_key.s), np.asarray(ks.lwe_key.s))
    np.testing.assert_array_equal(np.asarray(back.tgsw_key.key), np.asarray(ks.tgsw_key.key))
    np.testing.assert_array_equal(np.asarray(back.cloud.bk.bk), np.asarray(ks.cloud.bk.bk))
    np.testing.assert_array_equal(np.asarray(back.cloud.bk.ks.ks), np.asarray(ks.cloud.bk.ks.ks))
    # Re-export must be byte-identical (stable codec).
    assert tfhe_io.export_secret_keyset(back, params2) == blob


def test_cloud_keyset_roundtrip():
    ks = keys.new_random_gate_bootstrapping_secret_keyset(jax.random.key(2), P)
    blob = tfhe_io.export_cloud_keyset(ks.cloud, P)
    cloud, params2 = tfhe_io.import_cloud_keyset(blob)
    np.testing.assert_array_equal(np.asarray(cloud.bk.bk), np.asarray(ks.cloud.bk.bk))


def test_base64_reference_semantics():
    # decoder stops at first non-alphabet char, tolerates missing padding
    assert tfhe_io.b64decode("aGVsbG8") == b"hello"
    assert tfhe_io.b64decode("aGVsbG8=====junk") == b"hello"
    assert tfhe_io.b64encode(b"hello") == "aGVsbG8="


# ---------------------------------------------------------------------------
# Golden fixtures: any byte-level change to the serialization layout fails
# here (VERDICT r1 item 5 — layout is pinned, not just self-consistent).
# ---------------------------------------------------------------------------

import os as _os

_DATA = _os.path.join(_os.path.dirname(__file__), "data")


def test_golden_gateparams_bytes():
    f = io.BytesIO()
    tfhe_io.write_gate_params(f, default_128bit_params())
    want = open(_os.path.join(_DATA, "golden_gateparams_128.bin"), "rb").read()
    assert f.getvalue() == want


def test_golden_lwe_sample_bytes():
    rng = np.random.default_rng(12345)
    a = rng.integers(-2**31, 2**31, 630, dtype=np.int64).astype(np.int32)
    f = io.BytesIO()
    tfhe_io.write_lwe_sample(f, a, -123456789, 3.0517578125e-05)
    want = open(_os.path.join(_DATA, "golden_lwesample_630.bin"), "rb").read()
    assert f.getvalue() == want


def test_golden_secret_keyset_bytes():
    """Full keyset export: deterministic threefry keygen + codec, pinned."""
    import jax
    from eoc_tfhe_tpu.core import keys as keys_mod
    ks = keys_mod.new_random_gate_bootstrapping_secret_keyset(
        jax.random.key(2024), P)
    blob = tfhe_io.export_secret_keyset(ks, P)
    want = open(_os.path.join(_DATA, "golden_secret_keyset_toy.bin"), "rb").read()
    assert blob == want
    # and it reads back into a working keyset
    ks2, params2 = tfhe_io.import_secret_keyset(blob)
    np.testing.assert_array_equal(np.asarray(ks2.lwe_key.s),
                                  np.asarray(ks.lwe_key.s))


def test_wasm_pinned_uid_table_and_order():
    """The five record UIDs and the keyset record order are pinned by
    disassembly of the reference wasm (scripts/wasm_pin_codec.py): UID table
    {42,43,169,200,201} at mem 352656; fwrite pointer immediates map them to
    LweSample/LweKey/TGswKey/KeySwitchKey/BootstrappingKey respectively."""
    assert tfhe_io.LWE_SAMPLE_UID == 42
    assert tfhe_io.LWE_KEY_UID == 43
    assert tfhe_io.TGSW_KEY_UID == 169
    assert tfhe_io.KEYSWITCH_KEY_UID == 200
    assert tfhe_io.BOOTSTRAP_KEY_UID == 201
    ks = keys.new_random_gate_bootstrapping_secret_keyset(jax.random.key(7), P)
    blob = tfhe_io.export_secret_keyset(ks, P)
    # After the 5 text sections comes the UID-200 ks record; the stream ends
    # with the LweKey (43) then TGswKey (169) records.
    i = blob.index(b"-----END LWEKSPARAMS-----\n") + len(
        b"-----END LWEKSPARAMS-----\n")
    assert blob[i:i + 4] == (200).to_bytes(4, "little")
    n, N, k = P.n, P.N, P.k
    tail = 4 + 4 * n + 4 + 4 * k * N
    assert blob[-tail:-tail + 4] == (43).to_bytes(4, "little")
    assert blob[-(4 + 4 * k * N):-(4 * k * N)] == (169).to_bytes(4, "little")


def test_seeded_sample_pack_roundtrip():
    """Framework-extension UID-242 seeded records (serving upload format):
    pack/unpack round-trips, the seed expands to a decryptable ciphertext,
    and the UID can never collide with a reference-compat record."""
    import jax
    import jax.numpy as jnp
    from eoc_tfhe_tpu.core import gates
    from eoc_tfhe_tpu.core.keys import new_random_gate_bootstrapping_secret_keyset
    from eoc_tfhe_tpu.core.lwe import SeededLweCiphertext, lwe_seeded_expand
    from eoc_tfhe_tpu.core.params import test_params

    p = test_params()
    ks = new_random_gate_bootstrapping_secret_keyset(jax.random.key(2), p)
    bits = np.array([0, 1, 1, 0], bool)
    ct = gates.encrypt_bit_seeded(jax.random.key(3), jnp.asarray(bits),
                                  ks.lwe_key, p)
    blob = tfhe_io.pack_seeded_lwe_samples(
        np.asarray(ct.seed), np.asarray(ct.b),
        np.asarray(ct.current_variance, np.float64))
    assert len(blob) == 4 * tfhe_io.SEEDED_LWE_SAMPLE_BYTES
    seed, b, var = tfhe_io.unpack_seeded_lwe_samples(blob, 4)
    np.testing.assert_array_equal(seed, np.asarray(ct.seed))
    np.testing.assert_array_equal(b, np.asarray(ct.b))
    np.testing.assert_allclose(var, np.asarray(ct.current_variance))
    got = gates.decrypt_bit(
        lwe_seeded_expand(SeededLweCiphertext(
            seed=jnp.asarray(seed), b=jnp.asarray(b),
            current_variance=jnp.asarray(var, jnp.float32)), p.n),
        ks.lwe_key)
    np.testing.assert_array_equal(np.asarray(got), bits)
    # extension UID stays outside the reference's verified table
    assert tfhe_io.SEEDED_LWE_SAMPLE_UID not in (
        tfhe_io.LWE_SAMPLE_UID, tfhe_io.LWE_KEY_UID, tfhe_io.TGSW_KEY_UID,
        tfhe_io.KEYSWITCH_KEY_UID, tfhe_io.BOOTSTRAP_KEY_UID)
    # a UID-42 stream must not unpack as seeded records
    import pytest as _pytest
    plain = tfhe_io.pack_lwe_samples(
        np.zeros((2, p.n), np.int32), np.zeros(2, np.int32),
        np.zeros(2, np.float64))
    with _pytest.raises(ValueError, match="UID"):
        tfhe_io.unpack_seeded_lwe_samples(plain, 2)
