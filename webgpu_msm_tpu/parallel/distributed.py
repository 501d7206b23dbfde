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

import os
from typing import Optional

import jax
import numpy as np

from .msm_sharded import AXIS

_INITIALIZED = False

# Environment variables that indicate a multi-process launch is configured
# (jax.distributed auto-detect sources + the explicit JAX coordinator vars).
_COORDINATOR_ENV = (
    "JAX_COORDINATOR_ADDRESS",
    "COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",
)


def init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the multi-host runtime.

    On TPU pods all arguments auto-detect from the environment; pass them
    explicitly for CPU/GPU clusters (the jax.distributed contract). Must run
    before anything touches the local XLA backend — so this tracks "already
    initialized" with a module flag rather than jax.process_count(), which
    would itself initialize the backend and make a subsequent
    jax.distributed.initialize() fail (round-1 advice finding).
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    explicit = coordinator_address is not None or num_processes is not None
    env_configured = any(os.environ.get(v) for v in _COORDINATOR_ENV)
    if not explicit and not env_configured:
        # Single-host / no coordinator configured: stay single-process, but
        # probe auto-detect (TPU pod metadata) without masking real failures
        # — initialize() raises RuntimeError only when it cannot detect a
        # coordinator at all.
        try:
            jax.distributed.initialize()
        except Exception:
            return
        _INITIALIZED = True
        return
    # A coordinator IS configured: failure here means the pod launch is
    # broken; do not swallow it (every process silently running single-host
    # is a wrong answer, not a fallback).
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _INITIALIZED = True


def global_mesh() -> "jax.sharding.Mesh":
    """1-D mesh over every device in the job (all hosts)."""
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (AXIS,))


def host_local_slice(n_global: int) -> slice:
    """The [start, stop) range of the global point vector this host feeds.

    With points sharded over the global device axis, each host owns the
    contiguous range covering its local devices (addressable shards).
    n_global must divide evenly across processes — dropping the remainder
    would silently compute the wrong MSM (round-1 finding); callers pad the
    global input (identity points / zero scalars) to a multiple of
    process_count * n_chunks * chunk_len first."""
    pc = jax.process_count()
    if n_global % pc != 0:
        raise ValueError(
            f"n_global={n_global} is not divisible by process_count={pc}; "
            "pad the input with identity points (0, 1, 0) and zero scalars"
        )
    per_host = n_global // pc
    start = jax.process_index() * per_host
    return slice(start, start + per_host)


def scaling_efficiency(t_1chip: float, t_n: float, n_devices: int) -> float:
    """Throughput scaling efficiency vs linear (BASELINE.md >=80% target)."""
    return (t_1chip / t_n) / n_devices
