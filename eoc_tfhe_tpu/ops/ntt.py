"""Exact CRT-NTT negacyclic polynomial engine — the fast external product.

This is the round-2 replacement for the dense-Toeplitz formulation in
``ops/polymul.py`` on the bootstrapping hot path.  It plays the role of the
reference core's Lagrange half-complex FFT processor (upstream
``lagrangehalfc_arithmetic.cpp`` + ``fft_processors/nayuki`` — selected by the
reference build at ``/root/reference/build.sh:54-57``, ``config.yml:17-21``)
but is *exact* mod 2^32 rather than f64-rounded, and is structured so every
hot contraction is a large int8 MXU matmul.

Why not the Toeplitz matmul: it is O(N^2 * J * limbs) MACs per CMux step
(~7.6e7 int8 MACs/step/sample at the 128-bit set), which caps a v5e chip
below the 10k bootstraps/s target even at full MXU utilization.  Why not a
float FFT: TPUs have no f64, and f32's 24-bit mantissa cannot bound the
~2^48-magnitude intermediate convolution values to < 0.5 absolute error (the
reference needs f64 for exactly this reason).  Why not one big NTT mod a
>32-bit prime: modular multiplication of wide residues does not map to the
int8 MXU path.

The design instead combines four classical pieces, each chosen for the MXU:

1. **Nussbaumer outer split.**  p(X) in Z[X]/(X^N + 1) is written as
   sum_{r<R} X^r p_r(Z), Z = X^R, with p_r in Z[Z]/(Z^F + 1), F = N/R and
   R = 8 (so F = 128 = one full MXU lane/contraction tile at N = 1024).
   Products wrap as X^{s+R} = Z X^s, so the outer product is an R-point
   twisted convolution of inner-ring elements.

2. **Single-stage negacyclic NTT of length F.**  a_hat[f] =
   sum_t psi^{(2f+1) t} a[t] mod p (evaluation at the roots of Z^F + 1,
   psi a 2F-th root of unity mod p).  Because F = 128, the whole transform
   is ONE (.., F) @ (F, F) matmul — the negacyclic twist lives inside the
   matrix, there is no twiddle pass and no multi-stage butterfly, so the MXU
   contraction dimension is always full.

3. **CRT over two ~16-bit NTT primes** (default 40961, 61441; both === 1
   mod 2F for every supported F, both with balanced residues <= 30720 so a
   signed 2x int8-limb split never saturates — deliberately NOT the Fermat
   prime 65537, whose +-32768 balanced edge does not fit two int8 limbs).
   The true integer convolution values are bounded by
   J*N*halfBg*key_limb_max, which the context checks against p1*p2/2; the
   CRT pair then reconstructs them exactly, and an int32 wrap gives the
   result mod 2^32.

4. **Key limb split.**  The torus (key) operand is split into ``key_limbs``
   signed limbs of ``key_limb_bits`` bits (3 x 11 bits at the 128-bit set,
   4 x 8 at the 80-bit set where halfBg is larger) so the bound in (3)
   holds; limb results are recombined with exact int32 shifts.

All modular matmuls split their operands into signed base-256 int8 limbs and
run int8 x int8 -> int32 ``dot_general``s (the MXU's native fast path);
reductions are f32-Barrett (exact for |z| < 2^30.5 — proven in
:func:`balanced_reduce`) with a strict balancing correction wherever an int8
split follows.

Per CMux step per sample at the 128-bit set this costs ~1.2e7 int8 MACs
(forward J*2primes transforms at K=128, outer K=J*R=48 twisted convolution,
inverse U*limbs*2 transforms at K=128) versus ~7.6e7 for the Toeplitz path —
the >5x algorithmic cut VERDICT.md round 1 asked for — while staying exact
mod 2^32 (the Toeplitz path remains as the independent cross-check and the
fallback for odd shapes).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

_I32 = jnp.int32
_I8 = jnp.int8

#: Default CRT prime pair.  Both are NTT-friendly (p - 1 divisible by 2^12+)
#: and small enough that balanced residues (<= (p-1)/2 = 30720) fit a signed
#: two-limb base-256 int8 split (max 32639) with margin.
DEFAULT_PRIMES = (40961, 61441)

#: Default outer split width (subpolynomial count).  8 keeps the inner NTT
#: length at N/8 = 128 for the production N=1024 — one full MXU tile.
DEFAULT_R = 8


# --------------------------------------------------------------------------
# Host-side number theory (numpy / python ints; runs once per context).
# --------------------------------------------------------------------------

def _factorize(n: int) -> list[int]:
    out, d = [], 2
    while d * d <= n:
        while n % d == 0:
            out.append(d)
            n //= d
        d += 1
    if n > 1:
        out.append(n)
    return sorted(set(out))


def _find_generator(p: int) -> int:
    """Smallest generator of (Z/p)^* for prime p."""
    factors = _factorize(p - 1)
    for g in range(2, p):
        if all(pow(g, (p - 1) // q, p) != 1 for q in factors):
            return g
    raise ValueError(f"no generator found for {p}")


def _root_of_unity(p: int, order: int) -> int:
    """A primitive ``order``-th root of unity mod p (requires order | p-1)."""
    if (p - 1) % order:
        raise ValueError(f"{order} does not divide {p}-1")
    g = _find_generator(p)
    w = pow(g, (p - 1) // order, p)
    assert pow(w, order, p) == 1 and pow(w, order // 2, p) == p - 1
    return w


def _balanced_np(x: np.ndarray, p: int) -> np.ndarray:
    """Centered representative of x mod p in [-(p-1)/2, (p-1)/2], int64."""
    r = np.mod(x, p)
    return np.where(r > p // 2, r - p, r).astype(np.int64)


@functools.lru_cache(maxsize=None)
def _ntt_matrices_np(p: int, F: int) -> tuple[np.ndarray, np.ndarray]:
    """(W, Winv) int64 balanced: W[t,f] = psi^{(2f+1)t}, Winv[f,t] =
    F^{-1} psi^{-(2f+1)t} — the single-stage negacyclic NTT pair mod p."""
    psi = _root_of_unity(p, 2 * F)
    t = np.arange(F, dtype=object)[:, None]
    f = np.arange(F, dtype=object)[None, :]
    W = np.vectorize(lambda tt, ff: pow(psi, int((2 * ff + 1) * tt), p))(t, f)
    psi_inv = pow(psi, p - 2, p)
    Finv = pow(F, p - 2, p)
    Winv = np.vectorize(
        lambda ff, tt: (Finv * pow(psi_inv, int((2 * ff + 1) * tt), p)) % p
    )(f.T, t.T)
    return _balanced_np(W.astype(np.int64), p), _balanced_np(Winv.astype(np.int64), p)


# --------------------------------------------------------------------------
# Context
# --------------------------------------------------------------------------

def _choose_key_limbs(J: int, N: int, halfBg: int, primes: tuple[int, ...],
                      cover_bits: int = 32) -> tuple[int, int]:
    """Smallest (limbs, bits) covering ``cover_bits`` with the CRT bound met.

    Exactness requires 2 * J * N * halfBg * limb_max < prod(primes), where
    limb_max = 2^(bits-1) + 1 (top limb can exceed half-base by one after
    the carry chain).  ``cover_bits < 32`` is the rounded-key mode: the key
    is first rounded to its top ``cover_bits`` bits (the reference-style
    f64-FFT noise trade, ``/root/reference/build.sh:54-57``) and the limbs
    then cover only those.
    """
    P = int(np.prod([int(p) for p in primes], dtype=object))
    for limbs in (2, 3, 4, 6, 8):
        bits = -(-cover_bits // limbs)  # ceil
        limb_max = (1 << (bits - 1)) + 1
        if limb_max > 32639:  # must survive a 2x int8 split (split_i8 domain)
            continue
        if 2 * J * N * halfBg * limb_max < P:
            return limbs, bits
    raise ValueError(
        f"no key-limb split satisfies the CRT bound for J={J} N={N} halfBg={halfBg}")


def choose_round_bits(J: int, N: int, halfBg: int,
                      primes: tuple[int, ...] = DEFAULT_PRIMES,
                      limbs: int = 2) -> int:
    """Smallest key-rounding ``rb`` such that ``limbs`` limbs of
    ceil((32-rb)/limbs) bits satisfy the CRT bound — i.e. the cheapest
    rounded-key plan with the requested limb count (the v4 fast-kernel plan
    asks for limbs=2; VERDICT r3 item 1).  Raises if none exists (then use
    more limbs)."""
    P = int(np.prod([int(p) for p in primes], dtype=object))
    for rb in range(0, 24):
        bits = -(-(32 - rb) // limbs)
        limb_max = (1 << (bits - 1)) + 1
        if limb_max <= 32639 and 2 * J * N * halfBg * limb_max < P:
            return rb
    raise ValueError(
        f"no {limbs}-limb rounded plan satisfies the CRT bound for "
        f"J={J} N={N} halfBg={halfBg} primes={primes}")


def choose_rounded_plan(J: int, N: int, halfBg: int, n_steps: int,
                        bk_variance: float,
                        primes: tuple[int, ...] = DEFAULT_PRIMES) -> int:
    """Key-rounding ``rb`` for the fewest-limb plan whose rounding noise is
    acceptable under the COHERENT accumulation model, or 0 (exact).

    r5 on-chip finding (ROOFLINE.md "rounded plan retraction"): the key
    rounding error is FIXED per key, and the gadget digits it convolves
    with are near-identical rotated testvector patterns at every one of the
    n steps — so the per-step contributions add essentially COHERENTLY
    (variance ~n^2, not the independent-digit model's ~n).  Measured at the
    128-bit set: output-phase std 2.98e-2 for the old rb=8 2-limb plan vs
    3.3e-3 exact — ~25x the incoherent sigma, exactly the fully-coherent
    factor sqrt(n=630); single gates ran at ~4.2 sigma and gate-on-
    bootstrap-output circuits flipped bits at ~3e-3/gate.  The acceptance
    test here therefore uses the n^2 model (conservative vs the 1.8x-lower
    measurement) and, at the production sets, rejects every sub-exact plan
    — the exact plan IS the fastest correct plan (the 2-limb capacity
    bound caps limb bits at 12, forcing rb >= 8; see ROOFLINE.md)."""
    inherent = n_steps * J * N * ((2.0 * halfBg) ** 2 / 12.0) * bk_variance
    for limbs in (2, 3, 4):
        try:
            rb = choose_round_bits(J, N, halfBg, primes, limbs)
        except ValueError:
            continue
        if rb == 0:
            return 0
        round_var = (float(n_steps) ** 2 * J * N * float(halfBg ** 2)
                     * (float(1 << (2 * rb)) / 12.0) / float(2 ** 64))
        if round_var <= 2.0 * inherent:
            return rb
    return 0


def round_key(bk, rb: int):
    """Round a torus int32 array to its top ``32 - rb`` bits (nearest, ties
    up): v = (bk >> rb) + bit(rb-1).  Exact err = bk - (v << rb) is uniform
    in [-2^(rb-1), 2^(rb-1)) — accounted as key-rounding noise by
    ``core/bootstrap.bootstrap_woKS``.  Works for jnp and np arrays; rb=0 is
    the identity (returns the input unchanged, full 32-bit key)."""
    if rb == 0:
        return bk
    return (bk >> rb) + ((bk >> (rb - 1)) & 1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class NttContext:
    """Device-ready transform matrices + static plan for one (N, J, halfBg).

    Data fields are arrays (pytree leaves); plan fields are static metadata
    so the context can be closed over / passed through jit.
    """

    Wf8: jax.Array    # (P, 2, F, F) int8 — forward matrix, base-256 limbs [lo, hi]
    Wi8: jax.Array    # (P, 2, F, F) int8 — inverse matrix limbs
    omega: jax.Array  # (P, F) int32 — Z-twist psi^{2f+1} per frequency, balanced

    N: int = dataclasses.field(metadata=dict(static=True))
    R: int = dataclasses.field(metadata=dict(static=True))
    F: int = dataclasses.field(metadata=dict(static=True))
    primes: tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    key_limbs: int = dataclasses.field(metadata=dict(static=True))
    key_limb_bits: int = dataclasses.field(metadata=dict(static=True))
    halfBg: int = dataclasses.field(metadata=dict(static=True))
    J: int = dataclasses.field(metadata=dict(static=True))
    #: Key-rounding bits (0 = exact mod 2^32).  When > 0 the key is rounded
    #: to its top 32-rb bits before the limb split; limb ``l`` carries scale
    #: 2^(rb + bits*l) in the recombination.  The rounding error is bounded
    #: noise, accounted in ``core/bootstrap.bootstrap_woKS`` — the same trade
    #: the reference's f64 FFT makes (its ``executeDirectTorus32`` rounding).
    key_round_bits: int = dataclasses.field(default=0, metadata=dict(static=True))


@functools.lru_cache(maxsize=None)
def _host_plan(N: int, J: int, halfBg: int, R: int, primes: tuple[int, ...],
               round_bits: int = 0):
    F = N // R
    assert R * F == N and F & (F - 1) == 0 and R & (R - 1) == 0, (N, R)
    mats = [_ntt_matrices_np(p, F) for p in primes]
    limbs, bits = _choose_key_limbs(J, N, halfBg, primes,
                                    cover_bits=32 - round_bits)
    omegas = []
    for p in primes:
        psi = _root_of_unity(p, 2 * F)
        om = np.array([pow(psi, 2 * f + 1, p) for f in range(F)], dtype=np.int64)
        omegas.append(_balanced_np(om, p))
    return mats, omegas, limbs, bits


def make_context(N: int, J: int, halfBg: int, R: int | None = None,
                 primes: tuple[int, ...] = DEFAULT_PRIMES,
                 key_round_bits: int = 0) -> NttContext:
    """Build the NTT context for polynomial degree N, gadget width J=kpl,
    digit bound halfBg.  ``key_round_bits > 0`` selects the rounded-key plan
    (key rounded to its top 32-rb bits; fewer limbs; accounted noise)."""
    if R is None:
        R = min(DEFAULT_R, N)  # keep F >= 1; production N=1024 -> F=128
        while N // R < R and R > 1:  # tiny N: prefer F >= R
            R //= 2
    mats, omegas, limbs, bits = _host_plan(N, J, halfBg, R, tuple(primes),
                                           key_round_bits)
    F = N // R

    def limbs8(M: np.ndarray) -> np.ndarray:
        lo = ((M + 128) % 256) - 128
        hi = (M - lo) >> 8
        assert np.abs(hi).max() <= 127, "matrix residues exceed 2-limb int8 range"
        return np.stack([lo, hi]).astype(np.int8)

    # HOST numpy, deliberately: the context is closed over by jitted build
    # graphs, and a closed-over jax.Array constant forces a device->host
    # fetch at LOWERING time — seconds per array through the axon relay and
    # the dominant, bandwidth-variable term of cold keygen (round-5 probe:
    # 9-33 s of `_array_mlir_constant_handler`).  numpy constants lower
    # directly; jnp ops consume them unchanged.
    Wf8 = np.stack([limbs8(W) for W, _ in mats])
    Wi8 = np.stack([limbs8(Wi) for _, Wi in mats])
    omega = np.stack(omegas).astype(np.int32)
    return NttContext(Wf8=Wf8, Wi8=Wi8, omega=omega, N=N, R=R, F=F,
                      primes=tuple(primes), key_limbs=limbs, key_limb_bits=bits,
                      halfBg=halfBg, J=J, key_round_bits=key_round_bits)


def context_for_params(params, rounded: bool = False) -> NttContext:
    """Context for a GateBootstrappingParams (J = kpl, digit bound halfBg).

    ``rounded=True``: the 2-limb rounded-key plan (see :func:`choose_round_bits`)."""
    tg = params.tgsw_params
    rb = 0
    if rounded:
        rb = choose_rounded_plan(tg.kpl, tg.tlwe_params.N, tg.halfBg,
                                 n_steps=params.n,
                                 bk_variance=float(tg.tlwe_params.alpha_min) ** 2,
                                 primes=DEFAULT_PRIMES)
    return make_context(N=tg.tlwe_params.N, J=tg.kpl, halfBg=tg.halfBg,
                        key_round_bits=rb)


# --------------------------------------------------------------------------
# Modular primitives (device)
# --------------------------------------------------------------------------

def balanced_reduce(z: jax.Array, p: int, strict: bool = True) -> jax.Array:
    """Centered z mod p for int32 z with |z| < 2^30.5.

    q = round_f32(z / p) differs from the exact nearest integer by < 1 (the
    f32 representation of z errs by <= 2^30.5 * 2^-24 = 91, and ties
    z/p = k + 1/2 are impossible for odd p), so one conditional correction
    yields the strict balanced representative |r| <= (p-1)/2.  With
    ``strict=False`` the correction is skipped and |r| <= p/2 + 92; callers
    must audit the slack.  NB an int8 split MAY follow a lazy reduce when
    p/2 + 92 <= 32639 (true for every prime <= 65093, incl. both default
    pairs) — the v3 kernel exploits exactly this (pallas_ntt_blindrot2).
    """
    zf = z.astype(jnp.float32)
    q = jnp.round(zf * np.float32(1.0 / p)).astype(_I32)
    r = z - q * jnp.int32(p)
    if strict:
        half = jnp.int32((p - 1) // 2)
        r = r - jnp.int32(p) * (r > half).astype(_I32)
        r = r + jnp.int32(p) * (r < -half).astype(_I32)
    return r


def mul_mod(a: jax.Array, b: jax.Array, p: int) -> jax.Array:
    """Balanced product mod p; requires |a|,|b| <= ~2^15 (|ab| < 2^30.5)."""
    return balanced_reduce((a * b).astype(_I32), p)


def split_i8(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Signed base-256 split of int32 with |x| <= 32639: x = lo + 256*hi."""
    lo = (((x + 128) & 255) - 128).astype(_I32)
    hi = (x - lo) >> 8
    return lo.astype(_I8), hi.astype(_I8)


def signed_limbs(x: jax.Array, bits: int, count: int) -> jax.Array:
    """Split int32 into ``count`` signed base-2^bits limbs, stacked on a new
    leading axis.  Exact: sum_i limbs[i] << (bits*i) == x (no wrap needed —
    the top limb carries the full remainder, |top| <= 2^(31-bits*(count-1))+1).
    Overflow-safe carry: (x - l) >> bits == (x >> bits) + (m >= half)."""
    base, half = 1 << bits, 1 << (bits - 1)
    out, c = [], jnp.asarray(x, _I32)
    for _ in range(count - 1):
        m = c & jnp.int32(base - 1)
        borrow = (m >= half).astype(_I32)
        out.append(m - borrow * jnp.int32(base))
        c = (c >> bits) + borrow
    out.append(c)
    return jnp.stack(out)


def _dot8(a8: jax.Array, b8: jax.Array) -> jax.Array:
    """int8 x int8 -> int32 contraction of a8's last dim with b8's first."""
    return jax.lax.dot_general(a8, b8, (((a8.ndim - 1,), (0,)), ((), ())),
                               preferred_element_type=_I32)


def mod_matmul(x: jax.Array, W8: jax.Array, p: int, xmax: int,
               strict: bool = True) -> jax.Array:
    """Balanced ( x @ W ) mod p with int8-limb MXU matmuls.

    Args:
      x:  (..., K) int32, |x| <= xmax (xmax <= 32639).
      W8: (2, K, M) int8 limbs [lo, hi] of a balanced residue matrix.
    Returns (..., M) int32 balanced mod p.

    Overflow audit (K <= 1024): 1-limb path |P0 + 256*P1| <=
    K*127*128*(1+256) < 2^29.1.  2-limb path: partials <= K*2^14 = 2^24;
    256*B(P01+P10) <= 2^23; |c16| <= (p-1)/2 so c16*B(P11) <= 2^29.9;
    total < 2^30.3 — inside balanced_reduce's 2^30.5 domain.
    """
    assert xmax <= 32639
    Wlo, Whi = W8[0], W8[1]
    K = x.shape[-1]
    # 1-limb path domain: |P0 + 256*P1| <= K*xmax*127*257; must stay inside
    # balanced_reduce's 2^30.5 (r5 review: at F=K=1024, xmax=127 the old
    # audit silently wrapped int32 — unreachable with shipped N=1024 params
    # but latent for larger-N contexts).  Out-of-domain inputs fall through
    # to the 2-limb split, which is valid for any xmax here.
    if xmax <= 127 and K * xmax * 127 * 257 < 2 ** 30.5:
        x8 = x.astype(_I8)
        z = _dot8(x8, Wlo) + (_dot8(x8, Whi) << 8)
        return balanced_reduce(z, p, strict)
    # 2-limb path domain: Pmid sum <= 2*K*127^2 must fit the reduce too
    assert 2 * K * 127 * 127 < 2 ** 30.5, (
        f"mod_matmul contraction width K={K} exceeds the int8-limb domain")
    xlo, xhi = split_i8(x)
    P00 = _dot8(xlo, Wlo)
    Pmid = balanced_reduce(_dot8(xlo, Whi) + _dot8(xhi, Wlo), p, strict=True)
    P11 = balanced_reduce(_dot8(xhi, Whi), p, strict=True)
    c16 = int(_balanced_np(np.int64(1 << 16), p))
    z = P00 + (Pmid << 8) + P11 * jnp.int32(c16)
    return balanced_reduce(z, p, strict)


# --------------------------------------------------------------------------
# Transforms
# --------------------------------------------------------------------------

def to_subpolys(x: jax.Array, R: int) -> jax.Array:
    """(..., N) -> (..., R, F): subpoly r holds coefficients of X^(tR+r)."""
    N = x.shape[-1]
    return jnp.swapaxes(x.reshape(x.shape[:-1] + (N // R, R)), -1, -2)


def from_subpolys(x: jax.Array) -> jax.Array:
    """(..., R, F) -> (..., N): inverse of :func:`to_subpolys`."""
    R, F = x.shape[-2:]
    return jnp.swapaxes(x, -1, -2).reshape(x.shape[:-2] + (R * F,))


def ntt_forward(x: jax.Array, ctx: NttContext, xmax: int) -> jax.Array:
    """Negacyclic NTT along the last axis, all primes: (..., F) ->
    (P, ..., F) balanced residues."""
    outs = [mod_matmul(x, ctx.Wf8[i], p, xmax) for i, p in enumerate(ctx.primes)]
    return jnp.stack(outs)


def ntt_inverse_prime(xhat: jax.Array, ctx: NttContext, prime_idx: int) -> jax.Array:
    """Inverse negacyclic NTT along the last axis for one prime."""
    p = ctx.primes[prime_idx]
    return mod_matmul(xhat, ctx.Wi8[prime_idx], p, xmax=(p - 1) // 2)


def crt_pair(r: jax.Array, ctx: NttContext) -> jax.Array:
    """Exact integer from balanced residues r[(p1, p2), ...] (|V| < p1p2/2),
    as int32 (values are bounded by the context's CRT check)."""
    p1, p2 = ctx.primes
    inv = pow(p1, p2 - 2, p2)
    invb = jnp.int32(int(_balanced_np(np.int64(inv), p2)))
    t = balanced_reduce((r[1] - r[0]) * invb, p2)
    return (r[0] + t * jnp.int32(p1)).astype(_I32)


# --------------------------------------------------------------------------
# Key preparation
# --------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class NttKey:
    """NTT-domain bootstrapping key: per step i and prime, the outer-twisted
    contraction tensor T with T[i, pr, limb, f, (j, r1), (u, s)] such that

        c_hat[u, limb, s, f] = sum_{j, r1} d_hat[j, r1, f] * T[..., (j,r1), (u,s)]

    equals the NTT of sum_j digits_j (*) key_limb[j, u, limb] (the Z-twist
    omega_f on wrapped outer products folded in).  Stored as 2 int8 limbs.
    """

    T8: jax.Array  # (n, P, L, 2, F, J*R, U*R) int8
    variance: jax.Array  # () float32 — per-row noise variance of the raw key


def prepare_key_ntt(bk_rows: jax.Array, ctx: NttContext,
                    variance: jax.Array | float = 0.0) -> NttKey:
    """(n, J, U, N) int32 TGSW rows -> :class:`NttKey` (device-side, jitted).

    ~n * P * L * F * JR * UR bytes * 2 = ~0.7 GB at the 128-bit set — the
    price of making every hot-loop contraction a dense int8 matmul.
    """
    n, J, U, N = bk_rows.shape
    R, F, L, bits = ctx.R, ctx.F, ctx.key_limbs, ctx.key_limb_bits
    assert J == ctx.J and N == ctx.N

    @jax.jit
    def build(bk_rows):
        kl = signed_limbs(round_key(bk_rows, ctx.key_round_bits), bits, L)
        sub = to_subpolys(kl, R)                         # (L, n, J, U, R, F)
        limb_max = (1 << (bits - 1)) + 1
        bhat = ntt_forward(sub, ctx, xmax=limb_max)      # (P, L, n, J, U, R, F)

        outs = []
        for pi, p in enumerate(ctx.primes):
            om = ctx.omega[pi]                           # (F,)
            rolls = []
            for r1 in range(R):
                rolled = jnp.roll(bhat[pi], r1, axis=-2)  # s-axis: out[s]=in[(s-r1)%R]
                if r1:
                    tw = mul_mod(rolled, om, p)
                    smask = (jnp.arange(R) < r1)[:, None]
                    rolled = jnp.where(smask, tw, rolled)
                rolls.append(rolled)
            Tp = jnp.stack(rolls, axis=-3)               # (L, n, J, U, r1, s, F)
            outs.append(Tp)
        T = jnp.stack(outs)                              # (P, L, n, J, U, r1, s, F)
        # -> (n, P, L, F, J, r1, U, s) -> (n, P, L, F, J*R, U*R)
        T = jnp.transpose(T, (2, 0, 1, 7, 3, 5, 4, 6))
        T = T.reshape(n, len(ctx.primes), L, F, J * R, U * R)
        lo, hi = split_i8(T)
        return jnp.stack([lo, hi], axis=3)               # (n, P, L, 2, F, JR, UR)

    return NttKey(T8=build(bk_rows),
                  variance=jnp.asarray(variance, jnp.float32))


def prepare_key_ntt_np(bk_rows: np.ndarray, ctx: NttContext,
                       variance: float = 0.0,
                       as_numpy: bool = False) -> NttKey:
    """Host-side (numpy) :func:`prepare_key_ntt` — bit-identical output.

    One-time key preparation does not need a device compile; int64 numpy
    keeps every intermediate exact (|W|<=p/2, residues < 2^16, F<=128 =>
    products < 2^38 << 2^63).  ``as_numpy=True`` keeps T8 on the host (for
    callers that only want a relayout of it, e.g. the Pallas kernel form).
    """
    bk = np.asarray(bk_rows)
    n, J, U, N = bk.shape
    R, F, L, bits = ctx.R, ctx.F, ctx.key_limbs, ctx.key_limb_bits

    # signed_limbs (base 2^bits, borrow-carried like the device version)
    out, c = [], round_key(bk.astype(np.int64), ctx.key_round_bits)
    base, half = 1 << bits, 1 << (bits - 1)
    for _ in range(L - 1):
        m = c & (base - 1)
        borrow = (m >= half).astype(np.int64)
        out.append(m - borrow * base)
        c = (c >> bits) + borrow
    out.append(c)
    kl = np.stack(out)                                   # (L, n, J, U, N)

    sub = np.swapaxes(kl.reshape(kl.shape[:-1] + (F, R)), -1, -2)  # (...,R,F)

    outs = []
    for p in ctx.primes:
        W, _ = _ntt_matrices_np(p, F)                    # (F, F) balanced
        # f64 matmul is exact here (|sub| <= 2^10+1, |W| <= p/2 < 2^15,
        # F <= 128 => |sum| < 2^32 << 2^53) and hits BLAS; the int64 path
        # has no BLAS kernel and is ~100x slower at n=630.
        prod = sub.astype(np.float64) @ W.astype(np.float64)
        bhat = _balanced_np(prod.astype(np.int64), p)    # (L, n, J, U, R, F)
        psi = _root_of_unity(p, 2 * F)
        om = _balanced_np(np.array([pow(psi, 2 * f + 1, p)
                                    for f in range(F)], dtype=np.int64), p)
        rolls = []
        for r1 in range(R):
            rolled = np.roll(bhat, r1, axis=-2)
            if r1:
                tw = _balanced_np(rolled * om, p)
                smask = (np.arange(R) < r1)[:, None]
                rolled = np.where(smask, tw, rolled)
            rolls.append(rolled)
        outs.append(np.stack(rolls, axis=-3))            # (L,n,J,U,r1,s,F)
    T = np.stack(outs)                                   # (P,L,n,J,U,r1,s,F)
    T = np.transpose(T, (2, 0, 1, 7, 3, 5, 4, 6))
    T = T.reshape(n, len(ctx.primes), L, F, J * R, U * R)
    lo = ((T + 128) % 256) - 128
    hi = (T - lo) >> 8
    T8 = np.stack([lo, hi], axis=3).astype(np.int8)      # (n,P,L,2,F,JR,UR)
    return NttKey(T8=T8 if as_numpy else jnp.asarray(T8),
                  variance=jnp.asarray(variance, jnp.float32))


def prepare_kernel_key_fast_np(bk_rows: np.ndarray, ctx: NttContext) -> np.ndarray:
    """(n, J, U, N) int32 TGSW rows -> fused-kernel key layout
    (n, P, F, J*R, 2*L*U*R) int8 — bit-identical to
    ``pallas_ntt_blindrot.prepare_kernel_key_np(prepare_key_ntt_np(...).T8)``
    but ~10x faster: int32/f64 only (no int64 object math), the r1-roll/twist
    expansion realized as a Z-shift extension + sliding-window *view* (one
    twist multiply instead of R rolls), and a single strided transpose-copy
    per prime.

    The Z-shift identity: T[.., r1, s] = NTT(Z^{wrap} p_{(s-r1) mod R}) =
    ext[s - r1 + R] where ext = [om * bhat | bhat] on the subpoly axis —
    because multiplying a subpolynomial by Z is, in NTT domain, the pointwise
    omega twist (om[f] = psi^{2f+1}).
    """
    bk = np.asarray(bk_rows)
    n, J, U, N = bk.shape
    R, F, L, bits = ctx.R, ctx.F, ctx.key_limbs, ctx.key_limb_bits
    S = R
    P = len(ctx.primes)

    # signed limbs (base 2^bits), borrow-carried — int32 throughout
    out = []
    c = round_key(bk.astype(np.int32, copy=True), ctx.key_round_bits)
    base, half = 1 << bits, 1 << (bits - 1)
    for _ in range(L - 1):
        m = c & (base - 1)
        borrow = (m >= half).astype(np.int32)
        out.append((m - borrow * base).astype(np.int16))
        c = (c >> bits) + borrow
    out.append(c.astype(np.int16))                       # |top| <= 2^10+1
    kl = np.stack(out)                                   # (L, n, J, U, N) i16
    sub = np.swapaxes(kl.reshape(L, n, J, U, F, R), -1, -2)  # (L,n,J,U,R,F)
    sub2 = sub.reshape(-1, F).astype(np.float64)

    def bal_f64(z, p):
        """Balanced z mod p for f64 z holding exact integers |z| < 2^52."""
        q = np.rint(z * (1.0 / p))
        return (z - q * p).astype(np.int16)              # |r| <= p/2 < 2^15

    T8k = np.empty((n, P, F, J * R, 2, L, U, R), dtype=np.int8)
    for pi, p in enumerate(ctx.primes):
        W, _ = _ntt_matrices_np(p, F)
        # f64 matmul exact: |sub| <= 2^10+1, |W| <= p/2 < 2^15, F <= 128
        prod = sub2 @ W.astype(np.float64)               # |.| < 2^32 exact
        bhat = bal_f64(prod, p).reshape(L, n, J, U, R, F)
        psi = _root_of_unity(p, 2 * F)
        om = np.array([pow(psi, 2 * f + 1, p) for f in range(F)], np.int64)
        om32 = _balanced_np(om, p).astype(np.int32)
        tw = bhat.astype(np.int32) * om32                # |.| < 2^30
        twb = bal_f64(tw.astype(np.float64), p)
        ext = np.concatenate([twb, bhat], axis=-2)       # (L,n,J,U,2R,F) i16
        # windows: win[.., i, f, s] = ext[.., i + s, f]; T[r1, s] = ext[R-r1+s]
        win = np.lib.stride_tricks.sliding_window_view(ext, R, axis=-2)
        V = win[..., 1:R + 1, :, :][..., ::-1, :, :]     # (L,n,J,U,r1,F,s)
        Vt = np.ascontiguousarray(
            np.transpose(V, (1, 5, 2, 4, 0, 3, 6)))     # (n,F,J,r1,L,U,s) i16
        # int8 limbs via byte views (little-endian): lo is the low byte as
        # int8; hi is the high byte plus a borrow when the low byte >= 128.
        bytes_ = Vt.reshape(-1).view(np.int8)
        lo = bytes_[0::2].reshape(Vt.shape)
        hib = bytes_[1::2].reshape(Vt.shape)
        T8k[:, pi, :, :, 0] = lo.reshape(n, F, J * R, L, U, R)
        T8k[:, pi, :, :, 1] = (hib + (lo < 0)).reshape(n, F, J * R, L, U, R)
    return np.ascontiguousarray(
        T8k.reshape(n, P, F, J * R, 2 * L * U * R))


# --------------------------------------------------------------------------
# External product + blind rotation (XLA path)
# --------------------------------------------------------------------------

def external_product_ntt(digits: jax.Array, T8_step: jax.Array,
                         ctx: NttContext) -> jax.Array:
    """Exact  sum_j digits[..., j, :] (negacyclic*) key_row[j, u, :]  mod 2^32.

    Args:
      digits:  (B, J, N) int32 gadget digits, |d| <= halfBg.
      T8_step: (P, L, 2, F, J*R, U*R) int8 — one step of :class:`NttKey`.
    Returns (B, U, N) int32.
    """
    B, J, N = digits.shape
    R, F, L = ctx.R, ctx.F, ctx.key_limbs
    P = len(ctx.primes)
    U = T8_step.shape[-1] // R

    sub = to_subpolys(digits, R)                          # (B, J, R, F)
    dhat = ntt_forward(sub, ctx, xmax=ctx.halfBg)         # (P, B, J, R, F)
    # (P, F, B, J*R)
    dhat = jnp.transpose(dhat, (0, 4, 1, 2, 3)).reshape(P, F, B, J * R)
    dlo, dhi = split_i8(dhat)

    def outer(d8, W8):  # (P,F,B,K) x (P,L,F,K,M) -> (P,L,F,B,M)
        return jax.lax.dot_general(
            jnp.broadcast_to(d8[:, None], (P, L, F, B, J * R)), W8,
            (((4,), (3,)), ((0, 1, 2), (0, 1, 2))), preferred_element_type=_I32)

    Tlo, Thi = T8_step[:, :, 0], T8_step[:, :, 1]
    vlimbs = []
    for pi, p in enumerate(ctx.primes):
        P00 = outer(dlo, Tlo)[pi]
        Pm = balanced_reduce(outer(dlo, Thi)[pi] + outer(dhi, Tlo)[pi], p)
        P11 = balanced_reduce(outer(dhi, Thi)[pi], p)
        c16 = int(_balanced_np(np.int64(1 << 16), p))
        chat = balanced_reduce(P00 + (Pm << 8) + P11 * jnp.int32(c16), p)
        # (L, F, B, U*R) -> (L, B, U, R, F)
        chat = jnp.transpose(chat.reshape(L, F, B, U, R), (0, 2, 3, 4, 1))
        vlimbs.append(ntt_inverse_prime(chat, ctx, pi))   # (L, B, U, R, F)
    V = crt_pair(jnp.stack(vlimbs), ctx)                  # (L, B, U, R, F)

    out = jnp.zeros((B, U, R, F), _I32)
    for li in range(L):
        # limb li carries scale 2^(round_bits + bits*li); int32 wrap = mod 2^32
        sh = ctx.key_round_bits + ctx.key_limb_bits * li
        out = (out + (V[li] << jnp.int32(sh))).astype(_I32)
    return from_subpolys(out)                             # (B, U, N)


def blind_rotate_ntt(acc0: jax.Array, bara: jax.Array, key: NttKey,
                     params, ctx: NttContext,
                     rotation_impl: str = "auto", unroll: int = 1) -> jax.Array:
    """``tfhe_blindRotate`` with the NTT external product.

    Args:
      acc0: (B, k+1, N) int32; bara: (n, B) int32 in [0, 2N).
    """
    from ..core.tgsw import decompose_h
    from . import rotate
    tg = params.tgsw_params

    def step(acc, xs):
        T8_step, bara_i = xs
        d = rotate.mul_by_xai(acc, bara_i[:, None], impl=rotation_impl) - acc
        digits = decompose_h(d.astype(_I32), tg)          # (B, kpl, N)
        delta = external_product_ntt(digits, T8_step, ctx)
        return (acc + delta).astype(_I32), None

    acc, _ = jax.lax.scan(step, acc0, (key.T8, bara), unroll=unroll)
    return acc
