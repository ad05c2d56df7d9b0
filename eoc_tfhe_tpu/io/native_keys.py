"""Sharded native key checkpoint format (pod-scale bootstrapping keys).

The reference's only persistence is the sequential tfhe_io text/binary
stream (SURVEY.md §5 checkpoint row) — fine for one wasm instance, wrong
for a pod where each host should write/read only its own key shards. This
is the flat safetensors-style layout that SURVEY.md §5 names:

    <dir>/MANIFEST.json          — schema, per-tensor dtype/shape/spec
    <dir>/<tensor>.shard<k>.bin  — raw little-endian bytes of shard k

Shards are cut along each tensor's sharded axes per its
``jax.sharding.NamedSharding``; replicated tensors write one shard.  Loads
use ``jax.make_array_from_callback`` so every process materializes only the
bytes its devices need (single-controller or multi-host).  Works for any
pytree of jax arrays — EvalKey, CloudKeySet, NttKey — via
:func:`save_pytree` / :func:`load_pytree`; the EvalKey wrappers pin the
framework's canonical layout.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_SCHEMA = "eoc-tfhe-tpu/native-keys/v1"


def _spec_tuple(sharding) -> tuple:
    if isinstance(sharding, NamedSharding):
        out = []
        for e in sharding.spec:
            if e is None:
                out.append(None)
            elif isinstance(e, (tuple, list)):
                out.append(tuple(e))
            else:
                out.append((e,))
        return tuple(out)
    return ()


def _axis_sizes(mesh: Mesh, names) -> int:
    n = 1
    for a in names:
        n *= mesh.shape[a]
    return n


def _shard_grid(shape, spec, mesh: Mesh):
    """Yield (shard_index, tuple_of_slices) covering the array."""
    dims = []
    for d, size in enumerate(shape):
        names = spec[d] if d < len(spec) and spec[d] else ()
        parts = _axis_sizes(mesh, names) if names else 1
        assert size % parts == 0, (shape, spec, d)
        dims.append((parts, size // parts))
    total = int(np.prod([p for p, _ in dims]))
    for k in range(total):
        idx, rem = [], k
        for parts, _ in reversed(dims):
            idx.append(rem % parts)
            rem //= parts
        idx = idx[::-1]
        sl = tuple(slice(i * blk, (i + 1) * blk) for i, (parts, blk)
                   in zip(idx, dims))
        yield k, sl


def save_pytree(path: str, tree, mesh: Mesh | None = None) -> dict:
    """Write a pytree of (possibly sharded) arrays; returns the manifest."""
    os.makedirs(path, exist_ok=True)
    leaves, treedef = jax.tree.flatten(tree)
    names = [f"t{i}" for i in range(len(leaves))]
    manifest = {"schema": _SCHEMA, "treedef": str(treedef), "tensors": {}}
    for name, leaf in zip(names, leaves):
        arr = leaf
        spec = ()
        if mesh is not None and hasattr(arr, "sharding") and isinstance(
                arr.sharding, NamedSharding):
            spec = _spec_tuple(arr.sharding)
        host = np.asarray(arr)   # gathers; per-shard write below slices it
        entry = {"dtype": str(host.dtype), "shape": list(host.shape),
                 "spec": [list(e) if e else None for e in spec] or None,
                 "shards": 0}
        use_mesh = mesh if (mesh is not None and spec) else None
        if use_mesh is None:
            fn = os.path.join(path, f"{name}.shard0.bin")
            with open(fn, "wb") as f:
                f.write(np.ascontiguousarray(host).tobytes())
            entry["shards"] = 1
        else:
            k = -1
            for k, sl in _shard_grid(host.shape, spec, use_mesh):
                with open(os.path.join(path, f"{name}.shard{k}.bin"), "wb") as f:
                    f.write(np.ascontiguousarray(host[sl]).tobytes())
            entry["shards"] = k + 1
        manifest["tensors"][name] = entry
    with open(os.path.join(path, "MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def load_pytree(path: str, tree_like, mesh: Mesh | None = None):
    """Load arrays saved by :func:`save_pytree` into the structure of
    ``tree_like`` (a pytree with the same treedef; leaf values ignored).
    With a mesh, sharded tensors are materialized shard-by-shard on the
    right devices via ``jax.make_array_from_callback``."""
    with open(os.path.join(path, "MANIFEST.json")) as f:
        manifest = json.load(f)
    assert manifest["schema"] == _SCHEMA, manifest.get("schema")
    leaves, treedef = jax.tree.flatten(tree_like)
    out = []
    for i, _ in enumerate(leaves):
        e = manifest["tensors"][f"t{i}"]
        shape = tuple(e["shape"])
        dtype = np.dtype(e["dtype"])
        spec = tuple(tuple(x) if x else None for x in (e["spec"] or []))
        if e["shards"] > 1 and (mesh is None or not spec):
            # a multi-shard tensor cannot be read as shard0-only — that
            # yields 1/shards of the elements and an opaque reshape error
            # far from the cause (r5 review)
            raise ValueError(
                f"tensor t{i} was saved as {e['shards']} shards; pass the "
                f"mesh it was sharded over to load_pytree")
        if mesh is None or not spec or e["shards"] == 1 and not any(spec):
            data = np.fromfile(os.path.join(path, f"t{i}.shard0.bin"),
                               dtype=dtype).reshape(shape)
            out.append(jax.numpy.asarray(data))
            continue
        sharding = NamedSharding(mesh, P(*[
            (s if len(s) > 1 else s[0]) if s else None for s in spec]))
        shard_map_ = {tuple((sl.start, sl.stop) for sl in sl_t): k
                     for k, sl_t in _shard_grid(shape, spec, mesh)}
        if len(shard_map_) != e["shards"]:
            raise ValueError(
                f"mesh mismatch for tensor t{i}: manifest has "
                f"{e['shards']} shards, current mesh would read "
                f"{len(shard_map_)}")

        def cb(index, *, _shape=shape, _dtype=dtype, _spec=spec, _i=i,
               _smap=shard_map_):
            key = tuple((sl.start if sl.start is not None else 0,
                         sl.stop if sl.stop is not None else dim)
                        for sl, dim in zip(index, _shape))
            k = _smap[key]
            fn = os.path.join(path, f"t{_i}.shard{k}.bin")
            blk = tuple(b - a for a, b in key)
            return np.fromfile(fn, dtype=_dtype).reshape(blk)

        out.append(jax.make_array_from_callback(shape, sharding, cb))
    return jax.tree.unflatten(treedef, out)
