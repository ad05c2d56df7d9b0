"""Generate the checked-in llama golden fixtures (run ONCE; outputs live in
tests/data/ and are committed so the decoder + codecs are regression-locked
without torch or network access — round-2 VERDICT item 8).

Produces:
  tests/data/llama_tiny_v0.bin / _v1.bin / _v2.bin   (llama2.c containers)
  tests/data/llama_tiny_tok.bin                      (tokenizer.bin codec)
  tests/data/llama_tiny_golden.npz                   (pinned logits + ids)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")

import jax
import jax.numpy as jnp

from eoc_tfhe_tpu.models import checkpoint, llama, tokenizer

DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tests", "data")

CFG = llama.LlamaConfig(dim=32, hidden_dim=64, n_layers=2, n_heads=4,
                        n_kv_heads=2, vocab_size=280, max_seq_len=32)


def main():
    params = llama.init_params(jax.random.key(0), CFG)
    params = {k: np.asarray(v) for k, v in params.items()}

    for version in (0, 1, 2):
        path = os.path.join(DATA, f"llama_tiny_v{version}.bin")
        checkpoint.save_llama2c(path, params, CFG, version=version)
        print(f"wrote {path} ({os.path.getsize(path)} bytes)")

    # Tiny score-BPE tokenizer inside the model vocab (280): the llama2.c
    # special ids + all 256 bytes + merges with positive scores so greedy
    # BPE has real work to do.
    toks = [b"<unk>", b"\n<s>\n", b"\n</s>\n"] + [bytes([i]) for i in range(256)]
    scores = [0.0] * len(toks)
    for merge, sc in [(b"he", 1.0), (b"ll", 1.1), (b"llo", 2.0), (b"hell", 2.5),
                      (b" wo", 1.2), (b"rld", 1.5), (b"hello", 3.0)]:
        toks.append(merge)
        scores.append(sc)
    while len(toks) < 280:
        toks.append(b"")
        scores.append(-1e9)
    tok = tokenizer.Tokenizer(toks, scores)
    tok_path = os.path.join(DATA, "llama_tiny_tok.bin")
    tok.save(tok_path)
    print(f"wrote {tok_path}")

    ids = tok.encode("hello world")
    # Golden logits/generation come from the INDEPENDENT numpy oracle
    # (tests/llama_oracle.py — shares no code with models/llama.py or
    # models/checkpoint.py; VERDICT r3 item 9), parsing the v0 container
    # itself and computing the forward in float64.
    sys.path.insert(0, os.path.join(os.path.dirname(DATA)))
    sys.path.insert(0, DATA.rsplit("/", 1)[0])
    import llama_oracle as orc
    cfg_o, w = orc.load_v0(os.path.join(DATA, "llama_tiny_v0.bin"))
    logits = np.asarray(orc.forward(cfg_o, w, ids), np.float32)[None]
    gen = np.asarray([orc.generate_greedy(cfg_o, w, ids, 8)], np.int32)

    np.savez(os.path.join(DATA, "llama_tiny_golden.npz"),
             token_ids=np.asarray(ids, np.int32),
             logits=logits.astype(np.float32),
             generated=gen.astype(np.int32))
    print("token ids:", ids)
    print("generated:", gen.tolist())
    print("logits shape:", logits.shape, "norm:", float(np.linalg.norm(logits)))


if __name__ == "__main__":
    main()
