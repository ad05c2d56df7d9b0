"""TPU-native Llama-family inference — the AO-Llama / llama.cpp equivalent.

The reference ships llama.cpp (tag b3233) inside the same wasm module as the
TFHE core, driven through the AO-Llama Lua bindings
(``/root/reference/build.sh:30-39``; 245 ggml/llama names in the shipped
``process.wasm`` — SURVEY.md §2.3), with model weights converted to the
llama2.c ``.bin`` format by ``/root/reference/scripts/convert-model.py``.

This module is the idiomatic TPU re-design of that capability:

  * weights are a **layer-stacked pytree** (every per-layer tensor carries a
    leading L axis) so the decoder body is one ``lax.scan`` over layers —
    one compiled layer body instead of L unrolled copies;
  * attention/FFN matmuls run in **bfloat16 on the MXU** with float32
    accumulation; norms and rotary math stay float32;
  * generation is fully ``jit``-compiled: static-shape KV cache, a
    ``lax.scan`` over decode steps, no data-dependent Python control flow;
  * tensor parallelism is a sharding annotation, not code: see
    :func:`llama_param_specs` (heads/FFN sharded over the mesh "tp" axis,
    GSPMD inserts the collectives).

RoPE follows the llama2.c convention (adjacent even/odd pairs), matching the
checkpoints produced by the reference's converter; the HF permutation is
undone at conversion time (scripts/convert_model.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    dim: int
    hidden_dim: int
    n_layers: int
    n_heads: int
    n_kv_heads: int
    vocab_size: int
    max_seq_len: int
    norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    shared_classifier: bool = True

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads


def init_params(key: jax.Array, cfg: LlamaConfig, dtype=jnp.float32) -> dict:
    """Random small-init parameter pytree (layer-stacked)."""
    ks = jax.random.split(key, 12)
    D, H, L = cfg.dim, cfg.hidden_dim, cfg.n_layers
    KD = cfg.n_kv_heads * cfg.head_dim
    s = 0.02

    def w(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * s).astype(dtype)

    return {
        "tok_embeddings": w(ks[0], (cfg.vocab_size, D)),
        "attention_norm": jnp.ones((L, D), dtype),
        "wq": w(ks[1], (L, D, D)),
        "wk": w(ks[2], (L, D, KD)),
        "wv": w(ks[3], (L, D, KD)),
        "wo": w(ks[4], (L, D, D)),
        "ffn_norm": jnp.ones((L, D), dtype),
        "w1": w(ks[5], (L, D, H)),
        "w2": w(ks[6], (L, H, D)),
        "w3": w(ks[7], (L, D, H)),
        "norm": jnp.ones((D,), dtype),
        **({} if cfg.shared_classifier else {"output": w(ks[8], (cfg.vocab_size, D))}),
    }


def llama_param_specs(cfg: LlamaConfig) -> dict:
    """PartitionSpecs for tensor parallelism over a mesh "tp" axis.

    Megatron-style: QKV/w1/w3 column-sharded, wo/w2 row-sharded, so each
    layer needs exactly one all-reduce per block (inserted by GSPMD).
    """
    return {
        "tok_embeddings": P(None, None),
        "attention_norm": P(None, None),
        "wq": P(None, None, "tp"),
        "wk": P(None, None, "tp"),
        "wv": P(None, None, "tp"),
        "wo": P(None, "tp", None),
        "ffn_norm": P(None, None),
        "w1": P(None, None, "tp"),
        "w2": P(None, "tp", None),
        "w3": P(None, None, "tp"),
        "norm": P(None),
        "output": P(None, None),
    }


def _rmsnorm(x, g, eps):
    x = x.astype(jnp.float32)
    return (x * jax.lax.rsqrt(jnp.mean(x * x, -1, keepdims=True) + eps)) * g


def rope_tables(cfg: LlamaConfig, dtype=jnp.float32):
    """(max_seq_len, head_dim/2) cos/sin tables, llama2.c pair convention."""
    hd = cfg.head_dim
    freqs = 1.0 / (cfg.rope_theta ** (np.arange(0, hd, 2)[: hd // 2] / hd))
    t = np.arange(cfg.max_seq_len)
    ang = np.outer(t, freqs)
    return jnp.asarray(np.cos(ang), dtype), jnp.asarray(np.sin(ang), dtype)


def _apply_rope(x, cos, sin):
    """x: (B, T, H, hd); cos/sin: (T, hd/2). Adjacent-pair rotation."""
    xr = x.astype(jnp.float32).reshape(*x.shape[:-1], -1, 2)
    x0, x1 = xr[..., 0], xr[..., 1]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    out = jnp.stack([x0 * c - x1 * s, x0 * s + x1 * c], axis=-1)
    return out.reshape(x.shape)


def _attn(q, k, v, mask):
    """q: (B,T,Hq,hd), k/v: (B,S,Hkv,hd) -> (B,T,Hq,hd). GQA by head repeat."""
    B, T, Hq, hd = q.shape
    Hkv = k.shape[2]
    rep = Hq // Hkv
    if rep > 1:
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    scores = jnp.einsum("bthd,bshd->bhts", q, k,
                        preferred_element_type=jnp.float32) / np.sqrt(hd)
    scores = jnp.where(mask, scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhts,bshd->bthd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def _block(x, lp, cfg: LlamaConfig, cos, sin, kv_cache, pos, mask,
           compute_dtype):
    """One decoder layer. kv_cache: None or (k,v) each (B, S, Hkv, hd)."""
    B, T, D = x.shape
    hd = cfg.head_dim

    h = _rmsnorm(x, lp["attention_norm"], cfg.norm_eps).astype(compute_dtype)
    q = (h @ lp["wq"]).reshape(B, T, cfg.n_heads, hd)
    k = (h @ lp["wk"]).reshape(B, T, cfg.n_kv_heads, hd)
    v = (h @ lp["wv"]).reshape(B, T, cfg.n_kv_heads, hd)
    q = _apply_rope(q, cos, sin).astype(compute_dtype)
    k = _apply_rope(k, cos, sin).astype(compute_dtype)

    if kv_cache is not None:
        ck, cv = kv_cache
        ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, pos, 0, 0))
        cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, pos, 0, 0))
        att = _attn(q, ck.astype(compute_dtype), cv.astype(compute_dtype), mask)
        new_cache = (ck, cv)
    else:
        att = _attn(q, k, v, mask)
        new_cache = (k, v)      # this call's keys/values (prefill collects)
    x = x + (att.reshape(B, T, D) @ lp["wo"]).astype(jnp.float32)

    h = _rmsnorm(x, lp["ffn_norm"], cfg.norm_eps).astype(compute_dtype)
    gate = jax.nn.silu((h @ lp["w1"]).astype(jnp.float32)).astype(compute_dtype)
    x = x + ((gate * (h @ lp["w3"])) @ lp["w2"]).astype(jnp.float32)
    return x, new_cache


def _layer_params(params: dict) -> dict:
    return {k: params[k] for k in ("attention_norm", "wq", "wk", "wv", "wo",
                                   "ffn_norm", "w1", "w2", "w3")}


def forward(params: dict, tokens: jax.Array, cfg: LlamaConfig,
            compute_dtype=jnp.bfloat16) -> jax.Array:
    """Full-sequence causal forward: (B, T) int32 -> (B, T, V) f32 logits."""
    B, T = tokens.shape
    cos, sin = rope_tables(cfg)
    cos, sin = cos[:T], sin[:T]
    x = params["tok_embeddings"][tokens].astype(jnp.float32)
    mask = jnp.tril(jnp.ones((T, T), bool))[None, None]

    def body(x, lp):
        x, _ = _block(x, lp, cfg, cos, sin, None, 0, mask, compute_dtype)
        return x, None

    x, _ = jax.lax.scan(body, x, _layer_params(params))
    x = _rmsnorm(x, params["norm"], cfg.norm_eps)
    out_w = params.get("output", params["tok_embeddings"])
    return (x.astype(compute_dtype) @ out_w.astype(compute_dtype).T
            ).astype(jnp.float32)


def prefill(params: dict, tokens: jax.Array, cfg: LlamaConfig,
            compute_dtype=jnp.bfloat16):
    """One full-sequence pass that POPULATES the KV cache: (B, Tp) int32 ->
    (last-position logits (B, V) f32, cache (L, 2, B, S, Hkv, hd)).

    Prompt ingestion as a single batched causal forward (big MXU matmuls
    over the whole prompt) instead of Tp sequential ``decode_step`` calls —
    the standard prefill/decode split of production LLM serving.  The
    returned cache is ``init_kv_cache``-shaped, so ``decode_step`` continues
    from position Tp; results are identical to the per-token loop
    (tests/test_llama.py).
    """
    B, T = tokens.shape
    assert T <= cfg.max_seq_len
    S = cfg.max_seq_len
    cos, sin = rope_tables(cfg)
    cos_t, sin_t = cos[:T], sin[:T]
    x = params["tok_embeddings"][tokens].astype(jnp.float32)
    mask = jnp.tril(jnp.ones((T, T), bool))[None, None]
    pad = [(0, 0), (0, S - T), (0, 0), (0, 0)]

    def body(x, lp):
        x, (k, v) = _block(x, lp, cfg, cos_t, sin_t, None, 0, mask,
                           compute_dtype)
        kc = jnp.pad(k.astype(compute_dtype), pad)
        vc = jnp.pad(v.astype(compute_dtype), pad)
        return x, jnp.stack([kc, vc])

    x, cache = jax.lax.scan(body, x, _layer_params(params))
    x = _rmsnorm(x[:, -1], params["norm"], cfg.norm_eps)
    out_w = params.get("output", params["tok_embeddings"])
    logits = (x.astype(compute_dtype) @ out_w.astype(compute_dtype).T
              ).astype(jnp.float32)
    return logits, cache


def init_kv_cache(cfg: LlamaConfig, batch: int, dtype=jnp.bfloat16):
    """(L, 2, B, S, Hkv, hd) stacked cache for the layer scan."""
    shape = (cfg.n_layers, 2, batch, cfg.max_seq_len, cfg.n_kv_heads,
             cfg.head_dim)
    return jnp.zeros(shape, dtype)


def decode_step(params: dict, cache: jax.Array, pos: jax.Array,
                tokens: jax.Array, cfg: LlamaConfig,
                compute_dtype=jnp.bfloat16):
    """One token for the whole batch. tokens: (B,) int32; pos: scalar int32.

    Returns (logits (B, V), new cache).
    """
    B = tokens.shape[0]
    cos_t, sin_t = rope_tables(cfg)
    cos = jax.lax.dynamic_slice_in_dim(cos_t, pos, 1)
    sin = jax.lax.dynamic_slice_in_dim(sin_t, pos, 1)
    x = params["tok_embeddings"][tokens][:, None, :].astype(jnp.float32)
    # Causal over the cache: key position s visible iff s <= pos.
    mask = (jnp.arange(cfg.max_seq_len) <= pos)[None, None, None, :]

    def body(x, layer):
        lp, kv = layer
        x, (ck, cv) = _block(x, lp, cfg, cos, sin, (kv[0], kv[1]), pos, mask,
                             compute_dtype)
        return x, jnp.stack([ck, cv])

    x, new_cache = jax.lax.scan(body, x, (_layer_params(params), cache))
    x = _rmsnorm(x, params["norm"], cfg.norm_eps)
    out_w = params.get("output", params["tok_embeddings"])
    logits = (x[:, 0].astype(compute_dtype) @ out_w.astype(compute_dtype).T
              ).astype(jnp.float32)
    return logits, new_cache


def generate(params: dict, prompt: jax.Array, n_new: int, cfg: LlamaConfig,
             temperature: float = 0.0, key: jax.Array | None = None,
             compute_dtype=jnp.bfloat16) -> jax.Array:
    """jit-compilable greedy/temperature generation.

    prompt: (B, Tp) int32. Returns (B, n_new) int32. The whole prefill +
    decode loop is one traced program (``lax.scan`` over steps).
    """
    B, Tp = prompt.shape
    assert Tp + n_new <= cfg.max_seq_len
    cache = init_kv_cache(cfg, B, compute_dtype)
    if key is None:
        key = jax.random.key(0)

    def prefill_body(carry, t):
        cache, _ = carry
        logits, cache = decode_step(params, cache, t, prompt[:, t], cfg,
                                    compute_dtype)
        return (cache, logits), None

    (cache, logits), _ = jax.lax.scan(
        prefill_body, (cache, jnp.zeros((B, cfg.vocab_size), jnp.float32)),
        jnp.arange(Tp))

    def pick(logits, k):
        if temperature == 0.0:
            return jnp.argmax(logits, -1).astype(jnp.int32)
        return jax.random.categorical(k, logits / temperature).astype(jnp.int32)

    def step(carry, i):
        cache, logits, k = carry
        k, sub = jax.random.split(k)
        tok = pick(logits, sub)
        logits, cache = decode_step(params, cache, Tp + i, tok, cfg,
                                    compute_dtype)
        return (cache, logits, k), tok

    (_, _, _), toks = jax.lax.scan(step, (cache, logits, key),
                                   jnp.arange(n_new, dtype=jnp.int32))
    return toks.T  # (B, n_new)
