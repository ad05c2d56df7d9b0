"""Device meshes and sharding policies for batched bootstrapping.

The reference has no parallelism of any kind (single-threaded wasm,
SURVEY.md §2.4); this module is new first-class capability per the north
star: batch-sharded bootstrapping over a ("dp", "tp") mesh with the
bootstrapping key replicated and the key-switch table row-sharded (psum
reduction over "tp").

Axis semantics:
  dp — data parallel over the ciphertext batch (primary axis; gate
       bootstrapping is embarrassingly parallel per sample).
  tp — tensor parallel over the key-switch table's contraction rows (and,
       later, TGSW row splits of the external product).

Multi-host: build the mesh with ("dcn", "ici") device ordering via
``jax.experimental.mesh_utils.create_hybrid_device_mesh`` so dp crosses DCN
and tp stays on ICI; see :func:`make_mesh`.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int | None = None, tp: int = 1, devices=None) -> Mesh:
    """Create a (dp, tp) mesh. Defaults: all devices on dp, tp=1.

    On multi-host slices, pass the global device list (jax.devices()) after
    ``jax.distributed.initialize``; dp is laid out across hosts (DCN) and tp
    within a host (ICI) because jax.devices() orders host-major.
    """
    devices = list(devices if devices is not None else jax.devices())
    if dp is None:
        dp = len(devices) // tp
    assert dp * tp == len(devices), (dp, tp, len(devices))
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis over dp; replicate over tp."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_lwe_batch(ct, mesh: Mesh):
    """Place a batched LweCiphertext with the batch axis sharded over dp."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), ct)


def replicate(tree, mesh: Mesh):
    """Replicate key material (bootstrapping key, ks table) on every device."""
    s = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)
