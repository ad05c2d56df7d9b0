"""Llama-family inference tier: forward/decode consistency, checkpoint and
tokenizer codecs (the reference's AO-Llama / convert-model / generate-tokenizer
capabilities, SURVEY.md §2.1, §2.3)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eoc_tfhe_tpu.models import llama, checkpoint, tokenizer

CFG = llama.LlamaConfig(dim=32, hidden_dim=64, n_layers=2, n_heads=4,
                        n_kv_heads=2, vocab_size=96, max_seq_len=32)


@pytest.fixture(scope="module")
def params():
    return llama.init_params(jax.random.key(0), CFG)


def _np_reference_forward(params, tokens, cfg):
    """Straight-line numpy reference (f32 everywhere, no scan/cache)."""
    p = {k: np.asarray(v, np.float64) for k, v in params.items()}
    B, T = tokens.shape
    hd = cfg.head_dim
    cos, sin = map(np.asarray, llama.rope_tables(cfg))

    def rms(x, g):
        return x / np.sqrt((x * x).mean(-1, keepdims=True) + cfg.norm_eps) * g

    def rope(x):
        xr = x.reshape(*x.shape[:-1], -1, 2)
        x0, x1 = xr[..., 0], xr[..., 1]
        c, s = cos[None, :T, None], sin[None, :T, None]
        return np.stack([x0 * c - x1 * s, x0 * s + x1 * c], -1).reshape(x.shape)

    x = p["tok_embeddings"][tokens]
    for li in range(cfg.n_layers):
        h = rms(x, p["attention_norm"][li])
        q = (h @ p["wq"][li]).reshape(B, T, cfg.n_heads, hd)
        k = (h @ p["wk"][li]).reshape(B, T, cfg.n_kv_heads, hd)
        v = (h @ p["wv"][li]).reshape(B, T, cfg.n_kv_heads, hd)
        q, k = rope(q), rope(k)
        rep = cfg.n_heads // cfg.n_kv_heads
        k = np.repeat(k, rep, 2)
        v = np.repeat(v, rep, 2)
        att = np.einsum("bthd,bshd->bhts", q, k) / np.sqrt(hd)
        att = np.where(np.tril(np.ones((T, T), bool)), att, -np.inf)
        w = np.exp(att - att.max(-1, keepdims=True))
        w /= w.sum(-1, keepdims=True)
        o = np.einsum("bhts,bshd->bthd", w, v).reshape(B, T, cfg.dim)
        x = x + o @ p["wo"][li]
        h = rms(x, p["ffn_norm"][li])
        g = h @ p["w1"][li]
        x = x + ((g / (1 + np.exp(-g))) * (h @ p["w3"][li])) @ p["w2"][li]
    x = rms(x, p["norm"])
    return x @ p.get("output", p["tok_embeddings"]).T


def test_forward_matches_numpy_reference(params):
    tokens = jax.random.randint(jax.random.key(1), (2, 7), 0, CFG.vocab_size)
    got = np.asarray(llama.forward(params, tokens, CFG,
                                   compute_dtype=jnp.float32))
    want = _np_reference_forward(params, np.asarray(tokens), CFG)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_decode_matches_forward(params):
    """Cached single-token decode gives the same logits as full forward."""
    B, T = 2, 6
    tokens = jax.random.randint(jax.random.key(2), (B, T), 0, CFG.vocab_size)
    full = np.asarray(llama.forward(params, tokens, CFG,
                                    compute_dtype=jnp.float32))
    cache = llama.init_kv_cache(CFG, B, jnp.float32)
    for t in range(T):
        logits, cache = llama.decode_step(params, cache, jnp.int32(t),
                                          tokens[:, t], CFG,
                                          compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(logits), full[:, t], atol=2e-4)


def test_generate_greedy_deterministic(params):
    prompt = jax.random.randint(jax.random.key(3), (2, 4), 0, CFG.vocab_size)
    gen = jax.jit(lambda p, t: llama.generate(p, t, 5, CFG,
                                              compute_dtype=jnp.float32))
    out1 = np.asarray(gen(params, prompt))
    out2 = np.asarray(gen(params, prompt))
    assert out1.shape == (2, 5)
    np.testing.assert_array_equal(out1, out2)
    assert (out1 >= 0).all() and (out1 < CFG.vocab_size).all()


@pytest.mark.parametrize("version", [0, 1])
@pytest.mark.parametrize("shared", [True, False])
def test_checkpoint_roundtrip(tmp_path, version, shared):
    cfg = llama.LlamaConfig(dim=16, hidden_dim=40, n_layers=2, n_heads=2,
                            n_kv_heads=1, vocab_size=48, max_seq_len=16,
                            shared_classifier=shared)
    params = llama.init_params(jax.random.key(4), cfg)
    path = str(tmp_path / f"model_v{version}.bin")
    checkpoint.save_llama2c(path, params, cfg, version=version)
    cfg2, params2 = checkpoint.load_llama2c(path)
    assert cfg2 == cfg
    for k, v in params.items():
        np.testing.assert_array_equal(np.asarray(v, np.float32), params2[k],
                                      err_msg=k)
    # Logits agree through a full forward pass.
    toks = jax.random.randint(jax.random.key(5), (1, 5), 0, cfg.vocab_size)
    a = np.asarray(llama.forward(params, toks, cfg, compute_dtype=jnp.float32))
    b = np.asarray(llama.forward(
        {k: jnp.asarray(v) for k, v in params2.items()}, toks, cfg,
        compute_dtype=jnp.float32))
    np.testing.assert_allclose(a, b, atol=1e-5)


@pytest.mark.parametrize("shared", [True, False])
def test_checkpoint_v2_q80_roundtrip(tmp_path, shared):
    """v2 Q8_0 container: loads back within quantization error and runs.

    Format per reference ``convert-model.py`` ``version2_export``
    (256-byte header w/ group_size, fp32 norms, int8+scales tensors)."""
    cfg = llama.LlamaConfig(dim=16, hidden_dim=32, n_layers=2, n_heads=2,
                            n_kv_heads=1, vocab_size=48, max_seq_len=16,
                            shared_classifier=shared)
    params = llama.init_params(jax.random.key(4), cfg)
    path = str(tmp_path / "model_v2.bin")
    checkpoint.save_llama2c(path, params, cfg, version=2, group_size=16)
    cfg2, params2 = checkpoint.load_llama2c(path)
    assert cfg2 == cfg
    for k, v in params.items():
        v = np.asarray(v, np.float32)
        if k in ("attention_norm", "ffn_norm", "norm"):
            np.testing.assert_array_equal(v, params2[k], err_msg=k)
        else:
            # Q8_0: |err| <= scale/2 <= max|w|/254 per group.
            tol = np.abs(v).max() / 127.0
            np.testing.assert_allclose(params2[k], v, atol=tol, err_msg=k)
    toks = jax.random.randint(jax.random.key(5), (1, 5), 0, cfg.vocab_size)
    out = llama.forward({k: jnp.asarray(v) for k, v in params2.items()},
                        toks, cfg, compute_dtype=jnp.float32)
    assert np.isfinite(np.asarray(out)).all()


def test_quantize_q80_matches_reference_semantics():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(8, 64)).astype(np.float32)
    q, scale, err = checkpoint.quantize_q80(w, 32)
    assert q.dtype == np.int8 and np.abs(q).max() <= 127
    deq = (q.astype(np.float32) * scale[:, None]).reshape(w.shape)
    assert np.abs(deq - w).max() == pytest.approx(err)
    assert err < 0.05


def test_tokenizer_bin_roundtrip(tmp_path):
    tok = tokenizer.byte_tokenizer(300)
    path = str(tmp_path / "tok.bin")
    tok.save(path)
    tok2 = tokenizer.Tokenizer.load(path)
    assert tok2.tokens == tok.tokens
    assert tok2.scores == pytest.approx(tok.scores)
    s = "Hello TFHE!"
    ids = tok2.encode(s, bos=True)
    assert ids[0] == tokenizer.BOS_ID
    # encode prepends the SentencePiece dummy-prefix space; decode(bos=True)
    # strips it (llama2.c run.c encode/decode conventions).
    assert tok2.decode(ids[1:], bos=True) == s
    assert tok2.decode(ids[1:]) == " " + s


def test_tokenizer_greedy_merges():
    # Vocab with a merged token "ab" scoring higher than singles.
    tokens = [b"<unk>", b"\n<s>\n", b"\n</s>\n", b"a", b"b", b"ab", b"c"]
    scores = [0.0, 0.0, 0.0, -2.0, -2.0, -1.0, -2.0]
    tok = tokenizer.Tokenizer(tokens, scores)
    assert tok.encode("abc") == [5, 6]
    assert tok.decode([5, 6]) == "abc"


def test_param_specs_cover_params(params):
    specs = llama.llama_param_specs(CFG)
    for k in params:
        assert k in specs, k


def test_sharded_forward_tp(params):
    """TP-sharded forward on the virtual device mesh matches unsharded."""
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    from jax.sharding import Mesh, NamedSharding
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(1, 4), ("dp", "tp"))
    specs = llama.llama_param_specs(CFG)
    sharded = {k: jax.device_put(v, NamedSharding(mesh, specs[k]))
               for k, v in params.items()}
    tokens = jax.random.randint(jax.random.key(6), (2, 5), 0, CFG.vocab_size)
    want = np.asarray(llama.forward(params, tokens, CFG,
                                    compute_dtype=jnp.float32))
    with mesh:
        got = np.asarray(jax.jit(
            lambda p, t: llama.forward(p, t, CFG, compute_dtype=jnp.float32)
        )(sharded, tokens))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_hf_conversion_matches_transformers(tmp_path):
    """scripts/convert_model.py --hf parity: logits match transformers."""
    torch = pytest.importorskip("torch")
    tfm = pytest.importorskip("transformers")
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import convert_model

    hf_cfg = tfm.LlamaConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=96,
        max_position_embeddings=32, rms_norm_eps=1e-5,
        tie_word_embeddings=False)
    torch.manual_seed(0)
    model = tfm.LlamaForCausalLM(hf_cfg)
    model_dir = str(tmp_path / "hf")
    model.save_pretrained(model_dir)

    cfg, params = convert_model.from_hf(model_dir)
    toks = np.array([[3, 17, 42, 5, 80]])
    with torch.no_grad():
        want = model(torch.tensor(toks)).logits.numpy()
    got = np.asarray(llama.forward(
        {k: jnp.asarray(v) for k, v in params.items()}, jnp.asarray(toks),
        cfg, compute_dtype=jnp.float32))
    np.testing.assert_allclose(got, want, atol=3e-4)

    # And through the .bin round trip.
    out = str(tmp_path / "m.bin")
    convert_model.main(["--hf", model_dir, "--out", out])
    cfg2, params2 = checkpoint.load_llama2c(out)
    got2 = np.asarray(llama.forward(
        {k: jnp.asarray(v) for k, v in params2.items()}, jnp.asarray(toks),
        cfg2, compute_dtype=jnp.float32))
    np.testing.assert_allclose(got2, want, atol=3e-4)


# ---------------------------------------------------------------------------
# Checked-in golden fixtures (round-2 VERDICT item 8): a tiny llama2.c
# checkpoint in all three container versions + tokenizer + pinned outputs,
# generated once by scripts/gen_llama_goldens.py and committed — decoder and
# codecs are regression-locked without torch or network access.
# ---------------------------------------------------------------------------

_DATA = os.path.join(os.path.dirname(__file__), "data")
_GOLD_CFG = llama.LlamaConfig(dim=32, hidden_dim=64, n_layers=2, n_heads=4,
                              n_kv_heads=2, vocab_size=280, max_seq_len=32)


def test_golden_tokenizer_ids():
    tok = tokenizer.Tokenizer.load(os.path.join(_DATA, "llama_tiny_tok.bin"))
    gold = np.load(os.path.join(_DATA, "llama_tiny_golden.npz"))
    ids = tok.encode("hello world")
    np.testing.assert_array_equal(np.asarray(ids, np.int32),
                                  gold["token_ids"])
    # multi-level greedy merges: h+e, l+l, ll+o, he+llo -> one 'hello' token
    assert tok.decode(ids) == " hello world"


def test_golden_checkpoint_versions_agree():
    c0, p0 = checkpoint.load_llama2c(os.path.join(_DATA, "llama_tiny_v0.bin"))
    c1, p1 = checkpoint.load_llama2c(os.path.join(_DATA, "llama_tiny_v1.bin"))
    for k in p0:
        np.testing.assert_allclose(p0[k], p1[k], atol=0, rtol=0)
    c2, p2 = checkpoint.load_llama2c(os.path.join(_DATA, "llama_tiny_v2.bin"))
    for k in p0:   # Q8_0 v2: quantized weights within group-scale error
        np.testing.assert_allclose(np.asarray(p2[k], np.float32),
                                   np.asarray(p0[k], np.float32),
                                   atol=2e-2, rtol=0)
    assert (c0.dim, c0.vocab_size) == (32, 280) == (c2.dim, c2.vocab_size)


def test_golden_forward_logits_and_generate():
    """Module vs goldens produced by the INDEPENDENT numpy oracle
    (tests/llama_oracle.py — own v0 parser, float64 math; VERDICT r3
    item 9): f32 compute matches to float32 roundoff, the default bf16
    MXU path within bf16 precision, greedy generation exactly."""
    gold = np.load(os.path.join(_DATA, "llama_tiny_golden.npz"))
    cfg, p = checkpoint.load_llama2c(os.path.join(_DATA, "llama_tiny_v0.bin"))
    p = {k: jnp.asarray(v) for k, v in p.items()}
    prompt = jnp.asarray(gold["token_ids"][None].astype(np.int32))
    logits32 = np.asarray(llama.forward(p, prompt, cfg,
                                        compute_dtype=jnp.float32))
    np.testing.assert_allclose(logits32, gold["logits"], atol=1e-5, rtol=0)
    logits_bf = np.asarray(llama.forward(p, prompt, cfg))
    np.testing.assert_allclose(logits_bf, gold["logits"], atol=5e-3, rtol=0)
    gen = np.asarray(llama.generate(p, prompt, 8, cfg))
    np.testing.assert_array_equal(gen, gold["generated"])


def test_oracle_is_independent_and_agrees():
    """The oracle parses the container itself and reproduces the module's
    f32 forward to ~1e-7 — breaking the round-3 self-generated-golden
    circularity."""
    import llama_oracle as orc
    path = os.path.join(_DATA, "llama_tiny_v0.bin")
    cfg_o, w = orc.load_v0(path)
    gold = np.load(os.path.join(_DATA, "llama_tiny_golden.npz"))
    ids = gold["token_ids"].tolist()
    lo = orc.forward(cfg_o, w, ids)
    cfg, p = checkpoint.load_llama2c(path)
    p = {k: jnp.asarray(v) for k, v in p.items()}
    lm = np.asarray(llama.forward(p, jnp.asarray([ids], jnp.int32), cfg,
                                  compute_dtype=jnp.float32))[0]
    assert np.abs(lo - lm).max() < 1e-5
    # and the checked-in goldens are byte-for-byte the oracle's output
    np.testing.assert_array_equal(np.asarray(lo, np.float32)[None],
                                  gold["logits"])


def test_prefill_matches_decode_loop():
    """Single-pass prefill == per-token decode-loop ingestion: identical
    cache continuation and identical greedy continuations (the AO-Llama
    backend's prompt path, models/ao_llama._feed)."""
    cfg, p = checkpoint.load_llama2c(os.path.join(_DATA, "llama_tiny_v0.bin"))
    p = {k: jnp.asarray(v) for k, v in p.items()}
    gold = np.load(os.path.join(_DATA, "llama_tiny_golden.npz"))
    ids = gold["token_ids"].astype(np.int32)
    toks = jnp.asarray(ids[None])

    logits_pf, cache_pf = llama.prefill(p, toks, cfg)
    # loop ingestion
    cache = llama.init_kv_cache(cfg, 1)
    for t, tok in enumerate(ids):
        logits_lp, cache = llama.decode_step(
            p, cache, jnp.int32(t), jnp.asarray([tok], jnp.int32), cfg)
    np.testing.assert_allclose(np.asarray(logits_pf), np.asarray(logits_lp),
                               atol=2e-2)
    # greedy continuation from each path agrees with the oracle golden
    for logits, c in ((logits_pf, cache_pf), (logits_lp, cache)):
        got = []
        pos = len(ids)
        for _ in range(8):
            tok = int(np.argmax(np.asarray(logits[0])))
            got.append(tok)
            logits, c = llama.decode_step(p, c, jnp.int32(pos),
                                          jnp.asarray([tok], jnp.int32), cfg)
            pos += 1
        np.testing.assert_array_equal(np.asarray(got, np.int32),
                                      gold["generated"][0])
