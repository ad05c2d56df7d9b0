"""Multi-host runtime: process-group init, hybrid DCN/ICI meshes, scaling.

The reference is a single-threaded wasm instance; its only "distributed"
mechanism is host-level AO message passing (SURVEY.md §2.4). For the TPU
framework, multi-host is first-class: ``jax.distributed`` forms the process
group, meshes are laid out so the data-parallel axis crosses DCN at its
outer positions while tensor-parallel stays inside a host's ICI domain, and
the scaling harness measures per-chip throughput at 1 chip / 1 host /
N hosts (BASELINE.md target: >= 85% efficiency at >= 2 hosts).
"""

from __future__ import annotations

import os
import time

import jax
import numpy as np
from jax.sharding import Mesh

from .mesh import make_mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Join (or skip) the multi-host process group.

    Resolution order: explicit args, then the standard env vars
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``
    or their cloud-TPU equivalents auto-detected by jax), else single-process
    no-op. Returns True when a multi-process group is (already) active.
    Idempotent: a second call is a no-op.
    """
    # Do NOT touch jax.process_count() before jax.distributed.initialize —
    # it initialises the XLA backend, after which joining is impossible.
    # The distributed client handle tells us whether a group is active
    # without initialising anything.
    from jax._src import distributed as _jdist
    if getattr(_jdist.global_state, "client", None) is not None:
        return jax.process_count() > 1
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    num_processes = num_processes if num_processes is not None else (
        int(env_np) if env_np else None)
    env_pid = os.environ.get("JAX_PROCESS_ID")
    process_id = process_id if process_id is not None else (
        int(env_pid) if env_pid else None)
    if coordinator_address is None and num_processes is None:
        return False  # single-process mode; nothing to join
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_count() > 1


def make_hybrid_mesh(tp: int = 1, dp: int | None = None,
                     devices=None) -> Mesh:
    """(dp, tp) mesh with dp outer-most across DCN (hosts) and tp inside ICI.

    Single-host (or virtual-farm) fallback is the flat :func:`make_mesh`.
    Multi-host: ``mesh_utils.create_hybrid_device_mesh`` builds the device
    grid so slow DCN hops only occur on the outer dp positions — collectives
    over "tp" (keyswitch psum, external-product splits) ride ICI only.
    """
    devices = list(devices if devices is not None else jax.devices())
    n_hosts = len({d.process_index for d in devices})
    if n_hosts <= 1:
        return make_mesh(dp=dp, tp=tp, devices=devices)
    from jax.experimental import mesh_utils
    per_host = len(devices) // n_hosts
    assert per_host % tp == 0, (
        f"tp={tp} must divide devices/host={per_host} (tp crosses hosts "
        "otherwise — keyswitch psum would ride DCN)")
    dp_local = per_host // tp
    want_dp = dp if dp is not None else n_hosts * dp_local
    assert want_dp == n_hosts * dp_local, (
        f"dp={dp} inconsistent with {n_hosts} hosts x {dp_local} local")
    # TPU slices carry a distinguishing slice_index; CPU/GPU hosts don't —
    # there the process is the DCN granule (multi-process CPU test,
    # VERDICT r3 item 5).
    slice_ids = {getattr(d, "slice_index", None) for d in devices}
    granule_is_process = len(slice_ids) != n_hosts
    arr = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(dp_local, tp), dcn_mesh_shape=(n_hosts, 1),
        devices=devices, process_is_granule=granule_is_process)
    return Mesh(arr.reshape(n_hosts * dp_local, tp), ("dp", "tp"))


def scaling_report(run_fn, batch_sizes, mesh: Mesh, iters: int = 3) -> dict:
    """Measure throughput/chip on ``mesh`` vs a single-device baseline.

    ``run_fn(mesh_or_none, B) -> callable()`` returns a nullary compiled
    step of batch B; this harness times it and computes scaling efficiency
    = (throughput/chip on mesh) / (throughput/chip single-device).
    """
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    out = {"devices": n_dev, "points": []}
    for B in batch_sizes:
        base = _time_throughput(run_fn(None, B), B, iters)
        multi = _time_throughput(run_fn(mesh, B * n_dev), B * n_dev, iters)
        eff = (multi / n_dev) / base if base else float("nan")
        out["points"].append({
            "batch_per_device": B,
            "single_dev_per_s": base,
            "mesh_per_s": multi,
            "per_chip_per_s": multi / n_dev,
            "scaling_efficiency": eff,
        })
    return out


def _time_throughput(step, B: int, iters: int) -> float:
    step()  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = (time.perf_counter() - t0) / iters
    return B / dt
