#!/usr/bin/env python3
"""Publish a llama model + tokenizer as a chunked linked list of data items.

TPU-native analog of ``/root/reference/scripts/publish-model``: same tag
schema (Onchain-Llama / Model-Chunk / Tokenizer / Next chain, Model-Size +
Tokenizer-Size on the head), pluggable store backend. The default backend
is a local content-addressed directory (zero-egress environment); point a
real uploader at :class:`eoc_tfhe_tpu.models.publish.Store` for Arweave/S3.

Usage:
  python scripts/publish_model.py -m model.bin -t tokenizer.bin \
      [-s CHUNK_MB] [-o OUT_DIR]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eoc_tfhe_tpu.models.publish import (DEFAULT_CHUNK_MB, LocalStore,
                                         publish_model)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-m", "--model", default="./model.bin")
    ap.add_argument("-t", "--tokenizer", default="./tokenizer.bin")
    ap.add_argument("-s", "--chunk-mb", type=int, default=DEFAULT_CHUNK_MB)
    ap.add_argument("-o", "--out", default="./published-model")
    args = ap.parse_args()

    with open(args.model, "rb") as f:
        model = f.read()
    with open(args.tokenizer, "rb") as f:
        tok = f.read()
    store = LocalStore(args.out)
    head = publish_model(store, model, tok,
                         chunk_size=args.chunk_mb * 1024 * 1024)
    print(f"Uploaded tokenizer and {-(-len(model) // (args.chunk_mb * 2**20))} "
          f"model chunk(s).")
    print(f"Upload complete. Last Model Chunk ID: {head}.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
