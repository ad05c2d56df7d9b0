"""JWT gate: structural parity checks + real RS256 verification."""

import base64
import hashlib
import json
import random

from eoc_tfhe_tpu.api import jwt


def test_structural_validation_reference_parity():
    assert jwt.validate_jwt("header.payload")
    assert not jwt.validate_jwt("")
    assert not jwt.validate_jwt("nodot")
    assert not jwt.validate_jwt(".payload")
    assert not jwt.validate_jwt("header.")
    # Reference quirk: three-part JWTs fail the structural check because the
    # embedded second dot lands in the "payload" charset scan.
    assert not jwt.validate_jwt("a.b.c")


# -- RS256 ------------------------------------------------------------------

def _miller_rabin(n, rounds=24, rng=random.Random(7)):
    if n % 2 == 0:
        return n == 2
    d, r = n - 1, 0
    while d % 2 == 0:
        d //= 2
        r += 1
    for _ in range(rounds):
        a = rng.randrange(2, n - 1)
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(r - 1):
            x = (x * x) % n
            if x == n - 1:
                break
        else:
            return False
    return True


def _gen_prime(bits, rng):
    while True:
        c = rng.getrandbits(bits) | (1 << (bits - 1)) | 1
        if _miller_rabin(c):
            return c


def _b64url(b: bytes) -> str:
    return base64.urlsafe_b64encode(b).rstrip(b"=").decode()


def _make_rsa_jwt(claims: dict, kid: str = "k1"):
    rng = random.Random(1234)
    p = _gen_prime(512, rng)
    q = _gen_prime(512, rng)
    n, e = p * q, 65537
    d = pow(e, -1, (p - 1) * (q - 1))
    header = {"alg": "RS256", "typ": "JWT", "kid": kid}
    h64 = _b64url(json.dumps(header).encode())
    p64 = _b64url(json.dumps(claims).encode())
    signing_input = f"{h64}.{p64}".encode()
    digest = hashlib.sha256(signing_input).digest()
    k = (n.bit_length() + 7) // 8
    em = (b"\x00\x01" + b"\xff" * (k - 3 - len(jwt._SHA256_DIGESTINFO)
                                   - len(digest))
          + b"\x00" + jwt._SHA256_DIGESTINFO + digest)
    sig = pow(int.from_bytes(em, "big"), d, n).to_bytes(k, "big")
    token = f"{h64}.{p64}.{_b64url(sig)}"
    jwks = json.dumps({"keys": [{
        "kty": "RSA", "kid": kid, "alg": "RS256",
        "n": _b64url(n.to_bytes(k, "big")),
        "e": _b64url(e.to_bytes(3, "big")),
    }]})
    return token, jwks


def test_rs256_verifies_valid_token():
    token, jwks = _make_rsa_jwt({"sub": "weaver", "scope": "tfhe"})
    assert jwt.verify_rs256(token, jwks)


def test_rs256_rejects_tampering():
    token, jwks = _make_rsa_jwt({"sub": "weaver"})
    h64, p64, s64 = token.split(".")
    # altered payload
    bad_payload = _b64url(json.dumps({"sub": "mallory"}).encode())
    assert not jwt.verify_rs256(f"{h64}.{bad_payload}.{s64}", jwks)
    # corrupted signature
    sig = bytearray(base64.urlsafe_b64decode(s64 + "=="))
    sig[0] ^= 1
    assert not jwt.verify_rs256(f"{h64}.{p64}.{_b64url(bytes(sig))}", jwks)
    # wrong key
    _, other_jwks = _make_rsa_jwt({"sub": "x"}, kid="k1")
    other = json.loads(other_jwks)
    other["keys"][0]["n"] = _b64url((1 << 1023).to_bytes(128, "big"))
    assert not jwt.verify_rs256(token, json.dumps(other))
    # malformed inputs never raise
    assert not jwt.verify_rs256("a.b", jwks)
    assert not jwt.verify_rs256(token, "{not json")


def test_rs256_gate_wired_into_api():
    from eoc_tfhe_tpu.api.tfhe import Tfhe
    from eoc_tfhe_tpu.config import FrameworkConfig
    from eoc_tfhe_tpu.core.params import test_params
    token, jwks = _make_rsa_jwt({"sub": "weaver"})
    t = Tfhe(params=test_params(), config=FrameworkConfig(jwt_rs256=True))
    assert t.generateSecretKey("garbage.token", jwks) is None
    key = t.generateSecretKey(token, jwks)
    assert isinstance(key, str) and key
