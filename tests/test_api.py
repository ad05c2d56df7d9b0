"""Reference-parity API tests: the six integration vectors of
``/root/reference/tests/tfhe.test.js`` re-expressed against the Python surface
(SURVEY.md §4 test strategy)."""

import numpy as np
import pytest

from eoc_tfhe_tpu.api.tfhe import Tfhe, TfheSession
from eoc_tfhe_tpu.api.jwt import validate_jwt
from eoc_tfhe_tpu.core.params import test_params as make_test_params

P = make_test_params()


@pytest.fixture(scope="module")
def tfhe():
    t = Tfhe(params=P)
    assert t.generateSecretKey("header.payload", "") is not None
    return t


def test_loader_init(tfhe):
    # JS test 1: module loads. Here: session constructed + key generated.
    assert tfhe is not None


def test_info_and_jwt(tfhe):
    # JS test 2: info + testJWT round.
    assert "TFHE Library" in tfhe.info()
    tfhe.testJWT()


def test_integer_roundtrip_42(tfhe):
    # JS test 3: encrypt/decrypt 42.
    ct = tfhe.encryptInteger(42, "")
    assert tfhe.decryptInteger(ct, "", "e30.e30", "") == 42


def test_string_roundtrip(tfhe):
    # JS test 4: "Hello TFHE!" round trip.
    msg = "Hello TFHE!"
    ct = tfhe.encryptASCIIString(msg, len(msg), "")
    assert tfhe.decryptASCIIString(ct, len(msg), "", "e30.e30", "") == msg


def test_homomorphic_addition(tfhe):
    # JS test 5: 15 + 27 = 42.
    c1 = tfhe.encryptInteger(15, "")
    c2 = tfhe.encryptInteger(27, "")
    s = tfhe.addCiphertexts(c1, c2, "")
    assert tfhe.decryptInteger(s, "", "e30.e30", "") == 42


def test_homomorphic_subtraction_real(tfhe):
    # JS test 6 expects 58 because the reference Lua aliases subtract->add
    # (tfhe.lua:41-43). We implement real subtraction: 50 - 8 = 42.
    c1 = tfhe.encryptInteger(50, "")
    c2 = tfhe.encryptInteger(8, "")
    d = tfhe.subtractCiphertexts(c1, c2, "")
    assert tfhe.decryptInteger(d, "", "e30.e30", "") == 42
    # Parity documentation: the reference's aliased behavior equals addition.
    s = tfhe.addCiphertexts(c1, c2, "")
    assert tfhe.decryptInteger(s, "", "e30.e30", "") == 58


def test_jwt_gate():
    t = Tfhe(params=P)
    assert t.generateSecretKey("", "") is None          # empty token rejected
    assert t.generateSecretKey("no-dot-token", "") is None
    assert t.generateSecretKey(".leading", "") is None
    assert t.generateSecretKey("trailing.", "") is None
    assert t.generateSecretKey("ok.token", "") is not None
    t2 = Tfhe(params=P)
    assert t2.decryptInteger("QUJD", "", "bad token!", "") == -1


def test_validate_jwt_reference_quirks():
    assert validate_jwt("aaa.bbb")
    assert not validate_jwt("")
    assert not validate_jwt("aaa")
    assert not validate_jwt("a.b.c")  # first-dot split: "b.c" has a dot
    assert validate_jwt("HEADER-_=.PAYLOAD-_=")


def test_public_key_export(tfhe):
    # The reference's generatePublicKey is an empty stub; ours exports the
    # cloud keyset for real (SURVEY.md appendix A disposition).
    pk = tfhe.generatePublicKey()
    assert isinstance(pk, str) and len(pk) > 100


def test_session_key_reimport():
    s1 = TfheSession(params=P, seed=7)
    blob = s1.generate_secret_key()
    ct = s1.encrypt_integer(1234)
    s2 = TfheSession(params=P)
    s2.import_secret_key(blob)
    assert s2.decrypt_integer(ct) == 1234


def test_bootstrapped_uint8_arithmetic_api():
    """Session-level TRUE homomorphic 8-bit arithmetic (beyond the
    reference's leveled-only integer ops): encrypt as gate-encoded bit
    ciphertexts, add/subtract via bootstrapped ripple circuits, decrypt."""
    from eoc_tfhe_tpu.api.tfhe import TfheSession
    from eoc_tfhe_tpu.config import FrameworkConfig
    s = TfheSession(params=make_test_params(),
                    config=FrameworkConfig(param_set="test",
                                           eval_key_form="rows"))
    s.generate_secret_key()
    ca = s.encrypt_uint8_bits(50)
    cb = s.encrypt_uint8_bits(8)
    assert s.decrypt_uint8_bits(ca) == 50
    assert s.decrypt_uint8_bits(s.add_uint8_bits(ca, cb)) == 58
    # real subtraction — the reference's Tfhe.subtractCiphertexts aliases to
    # addition (tfhe.lua:41-43); this is the missing capability, done with
    # noise-resetting bootstraps
    assert s.decrypt_uint8_bits(s.subtract_uint8_bits(ca, cb)) == 42
    # wraparound semantics (mod 256, like an 8-bit CPU)
    c200 = s.encrypt_uint8_bits(200)
    c100 = s.encrypt_uint8_bits(100)
    assert s.decrypt_uint8_bits(s.add_uint8_bits(c200, c100)) == 44
    assert s.decrypt_uint8_bits(s.subtract_uint8_bits(c100, c200)) == 156
    # bootstrapped multiplication (no reference analog at all)
    assert s.decrypt_uint8_bits(s.multiply_uint8_bits(ca, cb)) == (50 * 8) % 256
    assert s.decrypt_uint8_bits(s.multiply_uint8_bits(c200, c100)) == (200 * 100) % 256


def test_uint8_compare_select_api():
    """Encrypted comparison / equality / select through the string API:
    results come back as interoperable uint8 0/1 blobs."""
    from eoc_tfhe_tpu.api.tfhe import TfheSession
    from eoc_tfhe_tpu.config import FrameworkConfig
    s = TfheSession(params=make_test_params(),
                    config=FrameworkConfig(param_set="test",
                                           eval_key_form="rows"))
    s.generate_secret_key()
    ca = s.encrypt_uint8_bits(50)
    cb = s.encrypt_uint8_bits(200)
    assert s.decrypt_uint8_bits(s.less_than_uint8_bits(ca, cb)) == 1
    assert s.decrypt_uint8_bits(s.less_than_uint8_bits(cb, ca)) == 0
    assert s.decrypt_uint8_bits(s.equals_uint8_bits(ca, ca)) == 1
    assert s.decrypt_uint8_bits(s.equals_uint8_bits(ca, cb)) == 0
    # select: the encrypted lt flag routes a word — an oblivious min()
    lt = s.less_than_uint8_bits(ca, cb)
    assert s.decrypt_uint8_bits(s.select_uint8_bits(lt, ca, cb)) == 50
    # flag is a real uint8: it composes with arithmetic
    assert s.decrypt_uint8_bits(s.add_uint8_bits(lt, ca)) == 51
