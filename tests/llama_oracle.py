"""Independent numpy Llama decoder oracle (VERDICT r3 item 9).

A from-the-spec reimplementation of the llama2.c forward pass that shares
NO code with ``eoc_tfhe_tpu.models.llama`` or ``models.checkpoint``: it
parses the legacy v0 ``.bin`` container itself (the format the reference's
``/root/reference/scripts/convert-model.py`` ``legacy_export`` writes) and
computes RMSNorm / adjacent-pair RoPE / GQA attention / SwiGLU in float64
numpy, straight from the public llama2.c ``run.c`` semantics.

The golden fixtures ``tests/data/llama_tiny_golden.npz`` (logits,
generated) are produced by THIS module (scripts/gen_llama_goldens.py), so
the module under test is validated against independently generated numbers
— not against itself.
"""

from __future__ import annotations

import struct

import numpy as np


def load_v0(path: str):
    """Parse a legacy llama2.c v0 checkpoint -> (config dict, weights dict).

    v0 layout (little-endian, from llama2.c export): 7 int32 header (dim,
    hidden_dim, n_layers, n_heads, n_kv_heads, vocab_size [negated when the
    classifier is untied], max_seq_len), then fp32 tensors: tok_embeddings
    (V, D); per tensor type grouped over layers: rms_att (D), wq (D, D),
    wk (KD, D), wv (KD, D), wo (D, D), rms_ffn (D), w1 (H, D), w2 (D, H),
    w3 (H, D); final rms (D); freq_cis real then imag (S, hd/2); [wcls].
    Matrices keep the torch (out, in) orientation here; the oracle applies
    them as x @ W.T.
    """
    with open(path, "rb") as f:
        dim, hid, L, nh, nkv, vocab, msl = struct.unpack("<iiiiiii",
                                                         f.read(28))
        shared = vocab > 0
        vocab = abs(vocab)
        hd = dim // nh
        kd = nkv * hd

        def rd(*shape):
            n = int(np.prod(shape))
            arr = np.frombuffer(f.read(4 * n), dtype="<f4").astype(np.float64)
            return arr.reshape(shape)

        w = {"tok_embeddings": rd(vocab, dim)}
        w["rms_att"] = rd(L, dim)
        w["wq"] = rd(L, dim, dim)
        w["wk"] = rd(L, kd, dim)
        w["wv"] = rd(L, kd, dim)
        w["wo"] = rd(L, dim, dim)
        w["rms_ffn"] = rd(L, dim)
        w["w1"] = rd(L, hid, dim)
        w["w2"] = rd(L, dim, hid)
        w["w3"] = rd(L, hid, dim)
        w["rms_final"] = rd(dim)
        w["freq_cos"] = rd(msl, hd // 2)
        w["freq_sin"] = rd(msl, hd // 2)
        w["wcls"] = w["tok_embeddings"] if shared else rd(vocab, dim)

    cfg = dict(dim=dim, hidden_dim=hid, n_layers=L, n_heads=nh, n_kv_heads=nkv,
               vocab_size=vocab, max_seq_len=msl, head_dim=hd, eps=1e-5)
    return cfg, w


def _rmsnorm(x, g, eps):
    return x / np.sqrt(np.mean(x * x, axis=-1, keepdims=True) + eps) * g


def _rope(x, cos, sin):
    """x: (T, H, hd); cos/sin: (T, hd/2). llama2.c adjacent-pair rotation."""
    x0 = x[..., 0::2]
    x1 = x[..., 1::2]
    c = cos[:, None, :]
    s = sin[:, None, :]
    out = np.empty_like(x)
    out[..., 0::2] = x0 * c - x1 * s
    out[..., 1::2] = x0 * s + x1 * c
    return out


def _softmax(z):
    z = z - z.max(axis=-1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=-1, keepdims=True)


def forward(cfg, w, tokens):
    """Causal full-sequence forward. tokens: (T,) ints -> (T, V) logits."""
    T = len(tokens)
    D, hd = cfg["dim"], cfg["head_dim"]
    nh, nkv = cfg["n_heads"], cfg["n_kv_heads"]
    rep = nh // nkv
    cos, sin = w["freq_cos"][:T], w["freq_sin"][:T]
    x = w["tok_embeddings"][np.asarray(tokens)]            # (T, D)

    for li in range(cfg["n_layers"]):
        h = _rmsnorm(x, w["rms_att"][li], cfg["eps"])
        q = (h @ w["wq"][li].T).reshape(T, nh, hd)
        k = (h @ w["wk"][li].T).reshape(T, nkv, hd)
        v = (h @ w["wv"][li].T).reshape(T, nkv, hd)
        q = _rope(q, cos, sin)
        k = _rope(k, cos, sin)
        kf = np.repeat(k, rep, axis=1)                     # GQA head sharing
        vf = np.repeat(v, rep, axis=1)
        # scores[h, t, s] with causal mask s <= t
        scores = np.einsum("thd,shd->hts", q, kf) / np.sqrt(hd)
        mask = np.tril(np.ones((T, T), bool))
        scores = np.where(mask[None], scores, -np.inf)
        att = _softmax(scores)
        ctx = np.einsum("hts,shd->thd", att, vf).reshape(T, D)
        x = x + ctx @ w["wo"][li].T

        h = _rmsnorm(x, w["rms_ffn"][li], cfg["eps"])
        g = h @ w["w1"][li].T
        g = g / (1.0 + np.exp(-g))                         # silu
        x = x + (g * (h @ w["w3"][li].T)) @ w["w2"][li].T

    x = _rmsnorm(x, w["rms_final"], cfg["eps"])
    return x @ w["wcls"].T                                 # (T, V)


def generate_greedy(cfg, w, prompt, n_new):
    """Greedy decoding by full-recompute (no KV cache — the oracle trades
    speed for obviousness). prompt: list of ints -> list of n_new ints."""
    toks = list(prompt)
    out = []
    for _ in range(n_new):
        logits = forward(cfg, w, toks)
        nxt = int(np.argmax(logits[-1]))
        out.append(nxt)
        toks.append(nxt)
    return out
