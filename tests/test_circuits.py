"""BASELINE configs[2]: gate set chained into an 8-bit ripple-carry adder."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eoc_tfhe_tpu.core import gates, keys, bootstrap
from eoc_tfhe_tpu.core.params import test_params as make_test_params
from eoc_tfhe_tpu.circuits.adder import ripple_carry_add

P = make_test_params()


@pytest.fixture(scope="module")
def keyset():
    return keys.new_random_gate_bootstrapping_secret_keyset(jax.random.key(5), P)


@pytest.fixture(scope="module")
def ek(keyset):
    return bootstrap.prepare_eval_key(keyset.cloud)


def _bits(vals, nbits):
    vals = np.asarray(vals)
    return np.stack([(vals >> i) & 1 for i in range(nbits)]).astype(bool)


def _from_bits(bits):
    return sum((bits[i].astype(np.int64) << i) for i in range(bits.shape[0]))


def test_ripple_carry_adder_8bit(keyset, ek):
    nbits = 8
    a_vals = np.array([13, 200, 255, 0])
    b_vals = np.array([29, 55, 1, 0])
    a_bits = _bits(a_vals, nbits)
    b_bits = _bits(b_vals, nbits)
    ca = gates.encrypt_bit(jax.random.key(21), jnp.asarray(a_bits), keyset.lwe_key, P)
    cb = gates.encrypt_bit(jax.random.key(22), jnp.asarray(b_bits), keyset.lwe_key, P)
    s_bits, carry = ripple_carry_add(ca, cb, ek, P)
    got_bits = gates.decrypt_bit(s_bits, keyset.lwe_key)
    got_carry = gates.decrypt_bit(carry, keyset.lwe_key)
    want = a_vals + b_vals
    np.testing.assert_array_equal(_from_bits(got_bits), want & 0xFF)
    np.testing.assert_array_equal(got_carry, (want >> nbits) & 1)


@pytest.mark.slow
def test_ripple_carry_adder_128bit_params():
    """The 8-bit adder at the real 128-bit parameter set (VERDICT r1 item 3:
    a toy-params-only bug cannot pass CI). CPU: ~tens of minutes — marked
    slow; on the attached TPU (EOC_TESTS_TPU=1) it runs in seconds."""
    from eoc_tfhe_tpu.core.params import default_128bit_params
    p128 = default_128bit_params()
    ks = keys.new_random_gate_bootstrapping_secret_keyset(jax.random.key(6), p128)
    ek128 = bootstrap.prepare_eval_key_ntt(ks.cloud, p128)
    nbits = 8
    a_vals = np.array([170, 255])
    b_vals = np.array([85, 1])
    a_bits = _bits(a_vals, nbits)
    b_bits = _bits(b_vals, nbits)
    ca = gates.encrypt_bit(jax.random.key(23), jnp.asarray(a_bits), ks.lwe_key, p128)
    cb = gates.encrypt_bit(jax.random.key(24), jnp.asarray(b_bits), ks.lwe_key, p128)
    s_bits, carry = ripple_carry_add(ca, cb, ek128, p128)
    want = a_vals + b_vals
    np.testing.assert_array_equal(
        _from_bits(gates.decrypt_bit(s_bits, ks.lwe_key)), want & 0xFF)
    np.testing.assert_array_equal(
        gates.decrypt_bit(carry, ks.lwe_key), (want >> nbits) & 1)


def test_ripple_borrow_subtractor_8bit(keyset, ek):
    from eoc_tfhe_tpu.circuits.adder import ripple_borrow_sub
    nbits = 8
    a_vals = np.array([50, 13, 255, 7])
    b_vals = np.array([8, 29, 255, 200])
    ca = gates.encrypt_bit(jax.random.key(31), jnp.asarray(_bits(a_vals, nbits)),
                           keyset.lwe_key, P)
    cb = gates.encrypt_bit(jax.random.key(32), jnp.asarray(_bits(b_vals, nbits)),
                           keyset.lwe_key, P)
    d_bits, borrow = ripple_borrow_sub(ca, cb, ek, P)
    got = _from_bits(np.asarray(gates.decrypt_bit(d_bits, keyset.lwe_key)))
    got_borrow = np.asarray(gates.decrypt_bit(borrow, keyset.lwe_key))
    want = (a_vals - b_vals) % 256            # two's-complement wraparound
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(got_borrow, a_vals < b_vals)
    # the real homomorphic subtraction the reference's aliased
    # Tfhe.subtractCiphertexts never performs (tfhe.lua:41-43)
    assert got[0] == 42                       # 50 - 8


def test_compare_and_equality_8bit(keyset, ek):
    from eoc_tfhe_tpu.circuits.adder import compare_lt, equals
    nbits = 8
    a_vals = np.array([5, 200, 77, 0])
    b_vals = np.array([9, 100, 77, 0])
    ca = gates.encrypt_bit(jax.random.key(33), jnp.asarray(_bits(a_vals, nbits)),
                           keyset.lwe_key, P)
    cb = gates.encrypt_bit(jax.random.key(34), jnp.asarray(_bits(b_vals, nbits)),
                           keyset.lwe_key, P)
    lt = gates.decrypt_bit(compare_lt(ca, cb, ek, P), keyset.lwe_key)
    np.testing.assert_array_equal(np.asarray(lt), a_vals < b_vals)
    eq = gates.decrypt_bit(equals(ca, cb, ek, P), keyset.lwe_key)
    np.testing.assert_array_equal(np.asarray(eq), a_vals == b_vals)


def test_select_word_8bit(keyset, ek):
    from eoc_tfhe_tpu.circuits.adder import select_word
    nbits = 8
    a_vals = np.array([11, 22])
    b_vals = np.array([33, 44])
    sel = np.array([True, False])
    ca = gates.encrypt_bit(jax.random.key(35), jnp.asarray(_bits(a_vals, nbits)),
                           keyset.lwe_key, P)
    cb = gates.encrypt_bit(jax.random.key(36), jnp.asarray(_bits(b_vals, nbits)),
                           keyset.lwe_key, P)
    c = gates.encrypt_bit(jax.random.key(37), jnp.asarray(sel),
                          keyset.lwe_key, P)
    out = select_word(c, ca, cb, ek, P)
    got = _from_bits(np.asarray(gates.decrypt_bit(out, keyset.lwe_key)))
    np.testing.assert_array_equal(got, np.where(sel, a_vals, b_vals))


def test_random_circuit_differential_fuzz(keyset, ek):
    """Randomized gate-DAG differential test: a seeded random circuit of
    every bootstrapped kind (2-input set + MUX) plus the linear gates,
    evaluated homomorphically and on plaintexts, must agree wire-for-wire
    at every level — composition/noise-reset confidence beyond the per-gate
    truth tables (each gate output becomes a later gate's input, so any
    noise-budget violation or phase drift surfaces as a decrypt flip)."""
    rng = np.random.default_rng(2025)
    two_in = {
        "nand": lambda x, y: ~(x & y), "and_": lambda x, y: x & y,
        "or_": lambda x, y: x | y, "nor": lambda x, y: ~(x | y),
        "xor_": lambda x, y: x ^ y, "xnor": lambda x, y: ~(x ^ y),
        "andny": lambda x, y: ~x & y, "andyn": lambda x, y: x & ~y,
        "orny": lambda x, y: ~x | y, "oryn": lambda x, y: x | ~y,
    }
    B = 4          # every wire carries a batch of 4 independent circuits
    n_wires = 6
    plain = list(rng.integers(0, 2, (n_wires, B)).astype(bool))
    enc = [gates.encrypt_bit(jax.random.key(100 + i), jnp.asarray(p),
                             keyset.lwe_key, P)
           for i, p in enumerate(plain)]

    for step in range(24):
        op = rng.choice(list(two_in) + ["mux", "maj", "not_", "copy"])
        i, j, k = rng.integers(0, len(plain), 3)
        if op == "mux":
            e = gates.mux(enc[i], enc[j], enc[k], ek, P)
            p = np.where(plain[i], plain[j], plain[k])
        elif op == "maj":
            e = gates.maj(enc[i], enc[j], enc[k], ek, P)
            p = (plain[i].astype(int) + plain[j] + plain[k]) >= 2
        elif op == "not_":
            e, p = gates.not_(enc[i]), ~plain[i]
        elif op == "copy":
            e, p = gates.copy(enc[i]), plain[i]
        else:
            e = getattr(gates, op)(enc[i], enc[j], ek, P)
            p = two_in[op](plain[i], plain[j])
        got = np.asarray(gates.decrypt_bit(e, keyset.lwe_key))
        np.testing.assert_array_equal(
            got, p, err_msg=f"step {step}: {op}({i},{j},{k}) diverged")
        enc.append(e)
        plain.append(p)


def test_maj_truth_table(keyset, ek):
    """3-input majority gate over all 8 input combinations, batched."""
    combos = np.array([[a, b, c] for a in (0, 1) for b in (0, 1)
                       for c in (0, 1)], bool)
    ca = gates.encrypt_bit(jax.random.key(61), jnp.asarray(combos[:, 0]),
                          keyset.lwe_key, P)
    cb = gates.encrypt_bit(jax.random.key(62), jnp.asarray(combos[:, 1]),
                          keyset.lwe_key, P)
    cc = gates.encrypt_bit(jax.random.key(63), jnp.asarray(combos[:, 2]),
                          keyset.lwe_key, P)
    got = gates.decrypt_bit(gates.maj(ca, cb, cc, ek, P), keyset.lwe_key)
    np.testing.assert_array_equal(got, combos.sum(1) >= 2)


@pytest.mark.parametrize("op", ["add", "sub"])
def test_fast_modes_agree_with_classic(keyset, ek, op):
    """fast / raw / classic ripple modes decrypt to identical words and
    carries on random inputs (the carry-save identity is exact)."""
    from eoc_tfhe_tpu.circuits.adder import ripple_borrow_sub
    rng = np.random.default_rng(97)
    a_vals = rng.integers(0, 256, 8)
    b_vals = rng.integers(0, 256, 8)
    ca = gates.encrypt_bit(jax.random.key(64), jnp.asarray(_bits(a_vals, 8)),
                          keyset.lwe_key, P)
    cb = gates.encrypt_bit(jax.random.key(65), jnp.asarray(_bits(b_vals, 8)),
                          keyset.lwe_key, P)
    fn = ripple_carry_add if op == "add" else ripple_borrow_sub
    want = (a_vals + b_vals) % 256 if op == "add" else (a_vals - b_vals) % 256
    want_flag = (a_vals + b_vals) >= 256 if op == "add" else a_vals < b_vals
    for mode in ("fast", "raw", "classic"):
        s, flag = fn(ca, cb, ek, P, mode=mode)
        np.testing.assert_array_equal(
            _from_bits(gates.decrypt_bit(s, keyset.lwe_key)), want,
            err_msg=f"{op} mode={mode}")
        np.testing.assert_array_equal(
            gates.decrypt_bit(flag, keyset.lwe_key), want_flag,
            err_msg=f"{op} mode={mode} flag")


def test_fast_adder_variance_rails(keyset, ek):
    """The tracked noise rails are exact for the fast adder:

    * raw-mode sum bits carry the LINEAR variance (inputs + 4x the MAJ
      output — strictly more than a fresh bootstrap output);
    * fast-mode (refreshed) sum bits land at exactly the fresh
      bootstrap+keyswitch output variance, same as the classic path.
    """
    rng = np.random.default_rng(11)
    a_vals = rng.integers(0, 256, 4)
    b_vals = rng.integers(0, 256, 4)
    ca = gates.encrypt_bit(jax.random.key(66), jnp.asarray(_bits(a_vals, 8)),
                          keyset.lwe_key, P)
    cb = gates.encrypt_bit(jax.random.key(67), jnp.asarray(_bits(b_vals, 8)),
                          keyset.lwe_key, P)
    s_raw, cy = ripple_carry_add(ca, cb, ek, P, mode="raw")
    s_fast, _ = ripple_carry_add(ca, cb, ek, P, mode="fast")
    s_classic, _ = ripple_carry_add(ca, cb, ek, P, mode="classic")
    v_raw = np.asarray(s_raw.current_variance)
    v_fast = np.asarray(s_fast.current_variance)
    v_classic = np.asarray(s_classic.current_variance)
    v_cy = np.asarray(cy.current_variance)
    # the MAJ carry is a fresh bootstrap output: same variance as any gate
    np.testing.assert_allclose(v_cy, v_classic[0], rtol=1e-6)
    # refreshed sums == fresh outputs; raw sums strictly above
    np.testing.assert_allclose(v_fast, v_classic, rtol=1e-6)
    assert (v_raw > v_fast).all()
    # raw bit i>0: var(a)+var(b)+var(carry=fresh)+4*var(maj output)
    va = np.asarray(ca.current_variance)[1:]
    vb = np.asarray(cb.current_variance)[1:]
    np.testing.assert_allclose(v_raw[1:], va + vb + 5.0 * v_cy[None, :],
                               rtol=1e-6)


def test_half_adder_fast(keyset, ek):
    """Half adder in one AND bootstrap: sum is exactly linear."""
    combos = np.array([[a, b] for a in (0, 1) for b in (0, 1)], bool)
    ca = gates.encrypt_bit(jax.random.key(70), jnp.asarray(combos[:, 0]),
                          keyset.lwe_key, P)
    cb = gates.encrypt_bit(jax.random.key(71), jnp.asarray(combos[:, 1]),
                          keyset.lwe_key, P)
    from eoc_tfhe_tpu.circuits.adder import half_adder_fast
    s, c = half_adder_fast(ca, cb, ek, P)
    np.testing.assert_array_equal(gates.decrypt_bit(s, keyset.lwe_key),
                                  combos[:, 0] ^ combos[:, 1])
    np.testing.assert_array_equal(gates.decrypt_bit(c, keyset.lwe_key),
                                  combos[:, 0] & combos[:, 1])


def test_ripple_mul_8bit(keyset, ek):
    """Bootstrapped 8x8 multiplier (mod 256) vs plaintext on random values,
    including edge cases 0, 1, 255."""
    from eoc_tfhe_tpu.circuits.adder import ripple_mul
    rng = np.random.default_rng(31)
    a_vals = np.concatenate([[0, 1, 255, 255], rng.integers(0, 256, 4)])
    b_vals = np.concatenate([[7, 255, 255, 0], rng.integers(0, 256, 4)])
    ca = gates.encrypt_bit(jax.random.key(72), jnp.asarray(_bits(a_vals, 8)),
                          keyset.lwe_key, P)
    cb = gates.encrypt_bit(jax.random.key(73), jnp.asarray(_bits(b_vals, 8)),
                          keyset.lwe_key, P)
    p_bits, flag = ripple_mul(ca, cb, ek, P)
    assert flag is None
    np.testing.assert_array_equal(
        _from_bits(gates.decrypt_bit(p_bits, keyset.lwe_key)),
        (a_vals * b_vals) % 256)
    # every output bit is a fresh (refreshed) bootstrap output
    v = np.asarray(p_bits.current_variance)
    s_classic, _ = ripple_carry_add(ca, cb, ek, P, mode="classic")
    np.testing.assert_allclose(v, np.asarray(s_classic.current_variance),
                               rtol=1e-6)


def test_ripple_mode_validation(keyset, ek):
    """Unknown mode strings raise instead of silently running unrefreshed."""
    from eoc_tfhe_tpu.circuits.adder import ripple_borrow_sub
    ca = gates.encrypt_bit(jax.random.key(80), jnp.asarray(_bits([3], 8)),
                          keyset.lwe_key, P)
    with pytest.raises(ValueError, match="unknown ripple mode"):
        ripple_carry_add(ca, ca, ek, P, mode="Fast")
    with pytest.raises(ValueError, match="unknown ripple mode"):
        ripple_borrow_sub(ca, ca, ek, P, mode="")


def test_ripple_16bit(keyset, ek):
    """The ripple circuits are n-bit generic: 16-bit add and subtract
    (fast mode) against plaintext."""
    rng = np.random.default_rng(5)
    a_vals = rng.integers(0, 1 << 16, 4)
    b_vals = rng.integers(0, 1 << 16, 4)
    ca = gates.encrypt_bit(jax.random.key(90), jnp.asarray(_bits(a_vals, 16)),
                          keyset.lwe_key, P)
    cb = gates.encrypt_bit(jax.random.key(91), jnp.asarray(_bits(b_vals, 16)),
                          keyset.lwe_key, P)
    s, cy = ripple_carry_add(ca, cb, ek, P)
    np.testing.assert_array_equal(
        _from_bits(gates.decrypt_bit(s, keyset.lwe_key)),
        (a_vals + b_vals) % (1 << 16))
    np.testing.assert_array_equal(gates.decrypt_bit(cy, keyset.lwe_key),
                                  (a_vals + b_vals) >= (1 << 16))


def test_oblivious_max_reduction(keyset, ek):
    """Composition of the comparison surface: encrypted max() over four
    words via compare_lt + select_word chains — every intermediate stays
    encrypted and the data path is value-independent."""
    from eoc_tfhe_tpu.circuits.adder import compare_lt, select_word
    vals = np.array([[13, 200, 77, 146]])
    cts = [gates.encrypt_bit(jax.random.key(95 + i),
                            jnp.asarray(_bits(vals[:, i], 8)),
                            keyset.lwe_key, P)
           for i in range(4)]

    def emax(x, y):
        lt = compare_lt(x, y, ek, P)         # x < y
        return select_word(lt, y, x, ek, P)  # lt ? y : x

    m = emax(emax(cts[0], cts[1]), emax(cts[2], cts[3]))
    np.testing.assert_array_equal(
        _from_bits(gates.decrypt_bit(m, keyset.lwe_key)), [200])
