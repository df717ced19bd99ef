"""Multi-host setup: jax.distributed + hybrid ICI/DCN meshes.

The reference has no inter-node code at all (SURVEY.md §2.5); this is the
net-new TPU-native scaling layer. Design:

  * `initialize()` wraps jax.distributed.initialize with env autodetect
    (TPU pods set the coordinator variables; explicit args for CPU/GPU
    test rigs).
  * `make_hybrid_mesh()` builds a 2D ("hosts", "rows") mesh where the
    "rows" axis rides ICI within a pod slice and "hosts" crosses DCN.
    SpMV row-shards over the flattened axes; the halo exchange pattern
    (narrow after RCM) keeps DCN traffic to the band overlap only.
  * Simulation: under XLA_FLAGS=--xla_force_host_platform_device_count=N
    a single process presents N CPU devices; `make_hybrid_mesh` reshapes
    them the same way, so multi-host schedules compile and run in tests.
"""

from __future__ import annotations

import os

import numpy as np


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed when running multi-process.

    Returns True if distributed mode is active, False for single-process
    (the common single-host benchmark path; everything still works on
    the local devices). Safe to call twice.
    """
    import jax

    if num_processes is None:
        num_processes = int(os.environ.get("TPU_SPMV_NUM_PROCESSES", "0")) or None
    if coordinator_address is None:
        coordinator_address = os.environ.get("TPU_SPMV_COORDINATOR") or None
    if process_id is None:
        pid = os.environ.get("TPU_SPMV_PROCESS_ID")
        process_id = int(pid) if pid is not None else None

    if num_processes in (None, 1) and coordinator_address is None:
        return False  # single-process
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    except RuntimeError as e:
        if "already initialized" in str(e):
            return True
        raise


def make_hybrid_mesh(
    axis_hosts: str = "hosts",
    axis_rows: str = "rows",
    num_hosts: int | None = None,
):
    """(hosts, rows) mesh: rows within a host slice (ICI), hosts over DCN.

    Single-host (or simulated-CPU) setups get hosts=1 by default;
    num_hosts overrides the shape so single-process simulations (virtual
    CPU devices) can exercise the exact (hosts, rows) schedule a pod
    would compile. Row sharding uses PartitionSpec((axis_hosts,
    axis_rows)) so the row axis spans both — see dist.sharding.
    spmv_sharded's tuple-axis support.
    """
    import jax
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices())
    if num_hosts is None:
        num_hosts = max(jax.process_count(), 1)
    per_host = devices.shape[0] // num_hosts
    mesh_devices = devices[: num_hosts * per_host].reshape(num_hosts, per_host)
    return Mesh(mesh_devices, (axis_hosts, axis_rows))


def row_spec(axis_hosts: str = "hosts", axis_rows: str = "rows"):
    """PartitionSpec sharding rows over both mesh axes (hosts-major)."""
    from jax.sharding import PartitionSpec as P

    return P((axis_hosts, axis_rows))
