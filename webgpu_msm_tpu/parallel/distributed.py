"""Multi-host runtime: jax.distributed init + pod-slice MSM orchestration.

The reference's communication substrate is Web Workers + SharedArrayBuffer +
COOP/COEP headers (SURVEY.md §5.8); the TPU-native equivalent is JAX's
multi-host process model: one process per host, `jax.distributed.initialize`
as the "enable shared memory" layer, and a global mesh whose collectives
ride ICI within a slice and DCN across slices.

Usage (one process per host, e.g. under a pod launcher):

    from webgpu_msm_tpu.parallel import distributed
    distributed.init()                    # env-driven (TPU pods auto-detect)
    mesh = distributed.global_mesh()
    wsums = msm_window_sums_sharded(..., mesh=mesh)

Each host feeds only its local shard of the point stream
(`host_local_slice`); the all-gather + group-law tree combine in
msm_sharded.py is topology-agnostic — XLA routes it over ICI/DCN.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from .msm_sharded import AXIS


def init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the multi-host runtime.

    On TPU pods all arguments auto-detect from the environment; pass them
    explicitly for CPU/GPU clusters (the jax.distributed contract).
    No-op when already initialized or single-process.
    """
    if jax.process_count() > 1:
        return  # already initialized by the launcher
    if coordinator_address is None and num_processes is None:
        try:
            jax.distributed.initialize()
        except Exception:
            # single-host / no coordinator configured: run single-process
            return
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def global_mesh() -> "jax.sharding.Mesh":
    """1-D mesh over every device in the job (all hosts)."""
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (AXIS,))


def host_local_slice(n_global: int) -> slice:
    """The [start, stop) range of the global point vector this host feeds.

    With points sharded over the global device axis, each host owns the
    contiguous range covering its local devices (addressable shards)."""
    per_host = n_global // jax.process_count()
    start = jax.process_index() * per_host
    return slice(start, start + per_host)


def scaling_efficiency(t_1chip: float, t_n: float, n_devices: int) -> float:
    """Throughput scaling efficiency vs linear (BASELINE.md >=80% target)."""
    return (t_1chip / t_n) / n_devices
