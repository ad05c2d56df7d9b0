"""Module packaging pipeline (the reference's L6 publish analog,
scripts/publish-module.mjs): artifact build, manifest tags, digest, and
round-trip extraction — everything short of the network upload (zero-egress
environment; the uploader is the documented pluggable stub)."""

import importlib.util
import json
import os
import sys
import tarfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_packager():
    spec = importlib.util.spec_from_file_location(
        "package_module", os.path.join(REPO, "scripts", "package_module.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_build_artifact_manifest_and_roundtrip(tmp_path):
    pk = _load_packager()
    manifest = pk.build_artifact(REPO, str(tmp_path))
    tags = {t["name"]: t["value"] for t in manifest["tags"]}
    # AO-tag analogs of publish-module.mjs:19-28
    assert tags["Compute-Limit"] == "9000000000000"
    assert "Module-Format" in tags and "Memory-Limit" in tags
    tar_path = tmp_path / manifest["artifact"]
    assert tar_path.exists()
    import hashlib
    assert hashlib.sha256(tar_path.read_bytes()).hexdigest() == manifest["sha256"]
    # the artifact contains the full package and imports after extraction
    with tarfile.open(tar_path) as tf:
        names = tf.getnames()
        tf.extractall(tmp_path / "x", filter="data")
    assert "eoc_tfhe_tpu/core/bootstrap.py" in names
    assert "eoc_tfhe_tpu/lua.py" in names
    assert (tmp_path / "x" / "eoc_tfhe_tpu" / "__init__.py").exists()
    m2 = json.load(open(tmp_path / "manifest.json"))
    assert m2["sha256"] == manifest["sha256"]
