#!/usr/bin/env python
"""Convert Llama-family checkpoints to llama2.c ``.bin`` for this framework.

Equivalent of the reference's model-export pipeline
(``/root/reference/scripts/convert-model.py``: Meta/HF/llama2.c inputs ->
v0/v1 fp32 ``.bin``), re-targeted at this repo's JAX loader
(``eoc_tfhe_tpu.models.checkpoint``). Inputs:

  * ``--hf <dir>``     HuggingFace Llama directory (config.json + torch
                       weights; loaded with transformers on CPU)
  * ``--bin <file>``   an existing llama2.c .bin (v0/v1) — round-trips
                       through this framework's loader (format conversion)

The HF path undoes the HF rotary permutation on wq/wk so RoPE follows the
llama2.c adjacent-pair convention used by :mod:`eoc_tfhe_tpu.models.llama`
(same ``permute_reverse`` the reference converter applies).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def permute_reverse(w: np.ndarray, n_heads: int, dim1: int, dim2: int) -> np.ndarray:
    """Undo HF's rotary-dim interleave: (out, in) torch-oriented weight."""
    return (w.reshape(n_heads, 2, dim1 // n_heads // 2, dim2)
            .swapaxes(1, 2).reshape(dim1, dim2))


def from_hf(model_dir: str):
    import json
    import os

    import torch  # CPU-only is fine
    from eoc_tfhe_tpu.models.llama import LlamaConfig

    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    cfg = LlamaConfig(
        dim=hf["hidden_size"], hidden_dim=hf["intermediate_size"],
        n_layers=hf["num_hidden_layers"], n_heads=hf["num_attention_heads"],
        n_kv_heads=hf.get("num_key_value_heads", hf["num_attention_heads"]),
        vocab_size=hf["vocab_size"],
        max_seq_len=hf.get("max_position_embeddings", 2048),
        norm_eps=hf.get("rms_norm_eps", 1e-5),
        rope_theta=hf.get("rope_theta", 10000.0),
        shared_classifier=hf.get("tie_word_embeddings", False),
    )

    from transformers import AutoModelForCausalLM
    model = AutoModelForCausalLM.from_pretrained(model_dir,
                                                 torch_dtype=torch.float32)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    del model

    D, L = cfg.dim, cfg.n_layers
    kvdim = cfg.n_kv_heads * cfg.head_dim

    def lyr(fmt):
        return [sd[fmt.format(i)] for i in range(L)]

    params = {
        "tok_embeddings": sd["model.embed_tokens.weight"],
        "attention_norm": np.stack(lyr("model.layers.{}.input_layernorm.weight")),
        "wq": np.stack([permute_reverse(w, cfg.n_heads, D, D).T
                        for w in lyr("model.layers.{}.self_attn.q_proj.weight")]),
        "wk": np.stack([permute_reverse(w, cfg.n_kv_heads, kvdim, D).T
                        for w in lyr("model.layers.{}.self_attn.k_proj.weight")]),
        "wv": np.stack([w.T for w in lyr("model.layers.{}.self_attn.v_proj.weight")]),
        "wo": np.stack([w.T for w in lyr("model.layers.{}.self_attn.o_proj.weight")]),
        "ffn_norm": np.stack(lyr("model.layers.{}.post_attention_layernorm.weight")),
        "w1": np.stack([w.T for w in lyr("model.layers.{}.mlp.gate_proj.weight")]),
        "w2": np.stack([w.T for w in lyr("model.layers.{}.mlp.down_proj.weight")]),
        "w3": np.stack([w.T for w in lyr("model.layers.{}.mlp.up_proj.weight")]),
        "norm": sd["model.norm.weight"],
    }
    if not cfg.shared_classifier:
        params["output"] = sd["lm_head.weight"]
    return cfg, params


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--hf", help="HuggingFace Llama model directory")
    src.add_argument("--bin", help="existing llama2.c .bin to re-export")
    ap.add_argument("--out", required=True, help="output .bin path")
    ap.add_argument("--version", type=int, default=0, choices=[0, 1])
    args = ap.parse_args(argv)

    from eoc_tfhe_tpu.models import checkpoint

    if args.hf:
        cfg, params = from_hf(args.hf)
    else:
        cfg, params = checkpoint.load_llama2c(args.bin)
    checkpoint.save_llama2c(args.out, params, cfg, version=args.version)
    print(f"wrote {args.out} (v{args.version}, dim={cfg.dim}, "
          f"layers={cfg.n_layers}, vocab={cfg.vocab_size})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
