"""JWT validation gate, parity with the reference wrapper.

The reference's ``validateJWT`` (``/root/reference/ao-tfhe/eoc-tfhe-run.cpp:94-133``)
performs *structural* checks only — the published module documents that it
always returns true for well-formed tokens (``WcCL.../README.md:23-30``).
We reproduce the structural checks bit-for-bit (including the quirk that only
the FIRST dot is considered, so the signature part is lumped into the
payload); real signature verification is intentionally out of the crypto core
(SURVEY.md appendix A).
"""

from __future__ import annotations

_B64URL = set("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-_=")


def validate_jwt(token: str, jwks_base64: str = "") -> bool:
    """Structural JWT validation (reference parity)."""
    if not token:
        return False
    dot = token.find(".")
    if dot in (-1, 0, len(token) - 1):
        return False
    header, payload = token[:dot], token[dot + 1:]

    def is_b64url(s: str) -> bool:
        return bool(s) and all(c in _B64URL for c in s)

    # Reference quirk preserved: only the FIRST dot splits, so for a
    # standard three-part JWT the "payload" is payload.signature, whose
    # embedded '.' fails the character check. The reference tests never
    # assert on the result (tests/tfhe.test.js:56-76).
    return is_b64url(header) and is_b64url(payload)
