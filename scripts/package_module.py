#!/usr/bin/env python3
"""Package the framework as a publishable module artifact.

The reference's publish pipeline uploads its compiled ``process.wasm`` to
Arweave with AO module tags (``scripts/publish-module.mjs:19-28``:
``Module-Format: wasm64-unknown-emscripten-draft_2024_02_15``,
``Memory-Limit: 1-gb``, ``Compute-Limit: 9000000000000``). The TPU-native
analog packages the Python module tree plus a manifest with equivalent
resource tags; the upload step is a pluggable stub (this environment is
zero-egress — wire a Turbo/S3/GCS uploader where deployment allows).

Usage: python scripts/package_module.py [outdir]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import tarfile
import time


def build_artifact(repo_root: str, outdir: str) -> dict:
    os.makedirs(outdir, exist_ok=True)
    tar_path = os.path.join(outdir, "eoc_tfhe_tpu-module.tar.gz")
    with tarfile.open(tar_path, "w:gz") as tf:
        for dirpath, dirnames, filenames in os.walk(os.path.join(repo_root, "eoc_tfhe_tpu")):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    tf.add(full, arcname=os.path.relpath(full, repo_root))
    digest = hashlib.sha256(open(tar_path, "rb").read()).hexdigest()
    manifest = {
        "name": "eoc_tfhe_tpu",
        "artifact": os.path.basename(tar_path),
        "sha256": digest,
        "created": int(time.time()),
        # AO-tag analogs (publish-module.mjs:19-28):
        "tags": [
            {"name": "Module-Format", "value": "python-jax-tpu-v1"},
            {"name": "Input-Encoding", "value": "JSON-1"},
            {"name": "Output-Encoding", "value": "JSON-1"},
            {"name": "Memory-Limit", "value": "16-gb-hbm"},
            {"name": "Compute-Limit", "value": "9000000000000"},
        ],
    }
    mpath = os.path.join(outdir, "manifest.json")
    json.dump(manifest, open(mpath, "w"), indent=2)
    return manifest


def upload_stub(manifest: dict) -> None:
    """Placeholder for the Arweave/Turbo upload (network egress required)."""
    print("upload: skipped (no network backend configured); manifest:")
    print(json.dumps(manifest, indent=2))


if __name__ == "__main__":
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(root, "dist")
    upload_stub(build_artifact(root, out))
