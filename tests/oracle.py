"""Independent f64 reference oracle for the TFHE pipeline.

This is a from-the-spec, pure-numpy reimplementation of the reference core's
bootstrapping pipeline using the **Lagrange half-complex f64 FFT** convention
of the FFT processor the reference actually builds (upstream
``fft_processors/nayuki`` — ``ENABLE_NAYUKI_PORTABLE=ON`` at
``/root/reference/build.sh:54-57``, ``config.yml:17-21``; ``fp1024_nayuki``
in the shipped wasm's name section).  It shares NO code with
``eoc_tfhe_tpu`` — every transform, decomposition, rotation, and switch is
re-derived here so the package's exact-integer pipeline can be validated
against an independent implementation (VERDICT.md round 1, item 2: "the
Pallas kernel is checked against the XLA scan, which is checked against the
same polymul primitives" — this file breaks that circularity).

Semantics implemented (upstream files per SURVEY.md §2.2/§3.5):
  * ``LagrangeHalfCPolynomial`` = N/2 complex f64 values: the odd
    frequencies of the 2N-point real FFT of [p, -p] (equivalently, the
    evaluations of p at the primitive 2N-th roots of unity — the roots of
    X^N + 1), `lagrangehalfc_arithmetic.cpp`.
  * ``executeReverseTorus32`` / ``executeReverseInt``: poly -> Lagrange
    domain; ``executeDirectTorus32``: back, with the 2/N-family scaling and
    round-to-int64 -> int32 wraparound.
  * Gadget decomposition with the offset trick (`tgsw-functions.cpp`),
    FFT external product (`tgsw-fft-operations.cpp`), blind rotation +
    extraction (`lwe-bootstrapping-functions-fft.cpp`), key switching with
    the precision offset (`lwe-keyswitch-functions.cpp`), and the gate
    linear parts (`boot-gates.cpp`).

Note on rounding: upstream converts the direct-FFT output via an int64 cast
of a scaled double.  Whether that cast truncates or rounds shifts each
coefficient by <1 LSB of noise, far below the gate margin; this oracle uses
round-to-nearest (``np.rint``).  Agreement with the package is therefore
asserted at the *decryption* level (exactly the reference's own contract)
plus a tight phase-distance bound, not ciphertext equality.
"""

from __future__ import annotations

import numpy as np

_U32 = np.uint32
_I32 = np.int32
_I64 = np.int64


# ---------------------------------------------------------------------------
# Torus numerics (upstream numeric-functions.cpp)
# ---------------------------------------------------------------------------

def mod_switch_to_torus32(mu, Msize: int):
    """phase = mu * (2^32 / Msize), nearest (upstream ``modSwitchToTorus32``)."""
    interv = ((np.uint64(1) << np.uint64(63)) // np.uint64(Msize)) * np.uint64(2)
    phase64 = (np.asarray(mu).astype(np.uint64)) * interv
    return (phase64 >> np.uint64(32)).astype(_U32).astype(_I32)


def mod_switch_from_torus32(phase, Msize: int):
    """Nearest multiple index: round(phase * Msize / 2^32) mod Msize."""
    interv = ((np.uint64(1) << np.uint64(63)) // np.uint64(Msize)) * np.uint64(2)
    half = interv // np.uint64(2)
    phase64 = (np.asarray(phase).astype(_U32).astype(np.uint64) << np.uint64(32)) + half
    return (phase64 // interv).astype(_I64)


# ---------------------------------------------------------------------------
# Lagrange half-complex FFT (upstream fft_processors/nayuki semantics)
# ---------------------------------------------------------------------------

class LagrangeFFT:
    """f64 negacyclic transform pair over N/2 complex points."""

    def __init__(self, N: int):
        self.N = N

    def reverse(self, p: np.ndarray) -> np.ndarray:
        """(..., N) int -> (..., N/2) complex128: odd frequencies of the
        2N-point FFT of [p, -p] (= 2 * p(w^(2j+1)), w = e^{-i pi / N})."""
        N = self.N
        ext = np.concatenate([p, -np.asarray(p, _I64)], axis=-1).astype(np.float64)
        F = np.fft.fft(ext, axis=-1)
        return F[..., 1::2][..., : N // 2]

    def direct_torus32(self, C: np.ndarray) -> np.ndarray:
        """(..., N/2) complex -> (..., N) int32: inverse transform with the
        product scaling (1/2 per multiplication; see :func:`poly_mul`) and
        round + wraparound to Torus32."""
        N = self.N
        S = np.zeros(C.shape[:-1] + (2 * N,), np.complex128)
        odd = np.arange(1, N, 2)
        S[..., odd] = C
        S[..., 2 * N - odd] = np.conj(C)
        x = np.fft.ifft(S, axis=-1).real[..., :N]
        # round to int64, wrap to int32 (exact int32 wraparound semantics)
        return np.rint(x).astype(_I64).astype(_I32)

    def poly_mul(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        """Negacyclic a*b mod (X^N+1, 2^32) via the FFT pipeline."""
        return self.direct_torus32(0.5 * self.reverse(a) * self.reverse(b))


# ---------------------------------------------------------------------------
# Gadget decomposition (upstream tGswTorus32PolynomialDecompH)
# ---------------------------------------------------------------------------

def decompose(polys: np.ndarray, l: int, Bgbit: int) -> np.ndarray:
    """(..., k+1, N) -> (..., (k+1)*l, N) signed digits in [-Bg/2, Bg/2)."""
    Bg = 1 << Bgbit
    halfBg = Bg // 2
    h = [1 << (32 - (p + 1) * Bgbit) for p in range(l)]
    offset = np.uint32(sum(halfBg * hp for hp in h) & 0xFFFFFFFF)
    u = polys.astype(_U32) + offset
    digs = []
    for p in range(l):
        d = ((u >> np.uint32(32 - (p + 1) * Bgbit)) & np.uint32(Bg - 1)).astype(_I32)
        digs.append(d - halfBg)
    out = np.stack(digs, axis=-2)                       # (..., k+1, l, N)
    s = out.shape
    return out.reshape(s[:-3] + (s[-3] * l, s[-1]))


# ---------------------------------------------------------------------------
# Negacyclic monomial rotation (upstream torusPolynomialMulByXai)
# ---------------------------------------------------------------------------

def mul_by_xai(p: np.ndarray, a) -> np.ndarray:
    """X^a * p for (..., N) int32 and scalar/broadcast a in [0, 2N)."""
    N = p.shape[-1]
    ext = np.concatenate([p, -np.asarray(p, _I64).astype(_I32)], axis=-1)
    idx = (np.arange(N) - np.asarray(a)[..., None]) % (2 * N)
    return np.take_along_axis(ext, np.broadcast_to(idx, p.shape[:-1] + (N,)), -1)


# ---------------------------------------------------------------------------
# FFT external product + blind rotation (upstream *-fft-operations.cpp)
# ---------------------------------------------------------------------------

class OracleBootstrap:
    """Independent bootstrap evaluator over raw numpy key material.

    Args:
      bk_rows: (n, kpl, k+1, N) int32 TGSW rows of the bootstrapping key.
      ks:      (n_in, t, base, n_out+1) int32 packed keyswitch key.
      params:  object with .n, .N, .k, .l and nested tgsw/ks fields matching
               eoc_tfhe_tpu.core.params.GateBootstrappingParams (only plain
               ints are read — no package code runs).
    """

    def __init__(self, bk_rows: np.ndarray, ks: np.ndarray, params):
        self.params = params
        self.N = params.tgsw_params.tlwe_params.N
        self.k = params.tgsw_params.tlwe_params.k
        self.l = params.tgsw_params.l
        self.Bgbit = params.tgsw_params.Bgbit
        self.n = params.n
        self.fft = LagrangeFFT(self.N)
        self.bk_fft = self.fft.reverse(np.asarray(bk_rows))  # (n, kpl, k+1, N/2)
        self.ks = np.asarray(ks)
        self.ks_t = params.ks.t
        self.ks_basebit = params.ks.basebit

    def extern_mul_fft(self, acc: np.ndarray, i: int) -> np.ndarray:
        """acc (B, k+1, N) -> bk_i external product, via f64 FFT MACs."""
        digits = decompose(acc, self.l, self.Bgbit)      # (B, kpl, N)
        dfft = self.fft.reverse(digits)                  # (B, kpl, N/2)
        # sum_j dfft[:, j] * bk_fft[i, j, u]  per output poly u
        prod = np.einsum("bjf,juf->buf", dfft, self.bk_fft[i]) * 0.5
        return self.fft.direct_torus32(prod)             # (B, k+1, N)

    def blind_rotate(self, acc: np.ndarray, bara: np.ndarray) -> np.ndarray:
        """(B, k+1, N), (B, n) -> rotated accumulator (tfhe_blindRotate_FFT)."""
        for i in range(self.n):
            ai = bara[:, i]
            d = (mul_by_xai(acc, ai[:, None]).astype(_I64)
                 - acc).astype(_I32)                     # (X^a - 1) acc
            delta = self.extern_mul_fft(d, i)
            acc = (acc.astype(_I64) + delta).astype(_I32)
        return acc

    def bootstrap_woKS(self, mu: int, a: np.ndarray, b: np.ndarray):
        """-> (a_out (B, k*N), b_out (B,)) extracted LWE over the ring key."""
        N, k = self.N, self.k
        Nx2 = 2 * N
        barb = mod_switch_from_torus32(b, Nx2)
        bara = mod_switch_from_torus32(a, Nx2).astype(_I64)  # (B, n)
        B = b.shape[0]
        testvect = np.full((B, N), np.int64(mu), _I32)
        acc = np.zeros((B, k + 1, N), _I32)
        acc[:, k] = mul_by_xai(testvect, (Nx2 - barb) % Nx2)
        acc = self.blind_rotate(acc, bara)
        # tLweExtractLweSample: a_out[j*N + t] = a_j[-t] with negacyclic sign
        a_out = np.empty((B, k * N), _I32)
        for j in range(k):
            pj = acc[:, j]
            row = np.concatenate([pj[:, :1], -pj[:, :0:-1].astype(_I64).astype(_I32)],
                                 axis=1)
            a_out[:, j * N:(j + 1) * N] = row
        return a_out, acc[:, k, 0].copy()

    def keyswitch(self, a: np.ndarray, b: np.ndarray):
        """(B, n_in), (B,) -> (B, n_out), (B,)  (lweKeySwitchTranslate_fromArray)."""
        t, basebit = self.ks_t, self.ks_basebit
        base = 1 << basebit
        prec_offset = np.uint32(1 << (32 - (1 + basebit * t)))
        n_out = self.ks.shape[-1] - 1
        B = b.shape[0]
        a_out = np.zeros((B, n_out), _I64)
        b_out = b.astype(_I64).copy()
        abar = a.astype(_U32) + prec_offset
        for i in range(a.shape[1]):
            for j in range(t):
                aij = ((abar[:, i] >> np.uint32(32 - (j + 1) * basebit))
                       & np.uint32(base - 1)).astype(np.intp)
                entry = self.ks[i, j, aij]               # (B, n_out+1)
                a_out -= entry[:, :n_out]
                b_out -= entry[:, n_out]
        return a_out.astype(_I32), b_out.astype(_I32)

    def bootstrap(self, mu: int, a: np.ndarray, b: np.ndarray):
        u_a, u_b = self.bootstrap_woKS(mu, a, b)
        return self.keyswitch(u_a, u_b)

    # -- gates (boot-gates.cpp linear parts) --------------------------------

    @staticmethod
    def _lin(consts, *cts):
        """(0, const) + sum sign_i * ct_i with int32 wraparound."""
        const, signs = consts
        a = sum(int(s) * ct[0].astype(_I64) for s, ct in zip(signs, cts))
        b = sum(int(s) * ct[1].astype(_I64) for s, ct in zip(signs, cts)) + const
        return a.astype(_I32), b.astype(_I32)

    def nand(self, ca, cb):
        mu = int(mod_switch_to_torus32(1, 8))
        a, b = self._lin((mu, (-1, -1)), ca, cb)
        return self.bootstrap(mu, a, b)

    def xor_(self, ca, cb):
        mu = int(mod_switch_to_torus32(1, 8))
        q = int(mod_switch_to_torus32(1, 4))
        a = (2 * (ca[0].astype(_I64) + cb[0].astype(_I64))).astype(_I32)
        b = (2 * (ca[1].astype(_I64) + cb[1].astype(_I64)) + q).astype(_I32)
        return self.bootstrap(mu, a, b)


    def mux(self, cc, ca, cb):
        """bootsMUX: c ? a : b — two woKS bootstraps + add + keyswitch."""
        mu = int(mod_switch_to_torus32(1, 8))
        neg = int(mod_switch_to_torus32(7, 8)) - (1 << 32)  # -1/8 as int32
        a1 = (cc[0].astype(_I64) + ca[0].astype(_I64)).astype(_I32)
        b1 = (cc[1].astype(_I64) + ca[1].astype(_I64) + neg).astype(_I32)
        a2 = (cb[0].astype(_I64) - cc[0].astype(_I64)).astype(_I32)
        b2 = (cb[1].astype(_I64) - cc[1].astype(_I64) + neg).astype(_I32)
        u1a, u1b = self.bootstrap_woKS(mu, a1, b1)
        u2a, u2b = self.bootstrap_woKS(mu, a2, b2)
        sa = (u1a.astype(_I64) + u2a.astype(_I64)).astype(_I32)
        sb = (u1b.astype(_I64) + u2b.astype(_I64) + mu).astype(_I32)
        return self.keyswitch(sa, sb)

    def and_(self, ca, cb):
        mu = int(mod_switch_to_torus32(1, 8))
        neg = int(mod_switch_to_torus32(7, 8)) - (1 << 32)  # -1/8 as int32
        a, b = self._lin((neg, (1, 1)), ca, cb)
        return self.bootstrap(mu, a, b)


def lwe_phase(a: np.ndarray, b: np.ndarray, s: np.ndarray) -> np.ndarray:
    """b - <a, s> with exact int32 wraparound (upstream lwePhase)."""
    dot = (a.astype(_I64) * s.astype(_I64)).sum(-1)
    return (b.astype(_I64) - dot).astype(_I32)
