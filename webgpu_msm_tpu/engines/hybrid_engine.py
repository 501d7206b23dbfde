"""Heterogeneous co-compute: host CPU engine + TPU engine in parallel.

The reference's `cpuWorkRatio` variant (submission.ts:96-154, DESIGN.md:7-34):
the point vector is split at `cpu_work_ratio`; the CPU share runs the native
C++ Pippenger on a host thread while the TPU share runs the device pipeline
(JAX dispatch is async, so both genuinely overlap — the analog of running
gpuIntraBucketReduction in a dedicated worker, gpu_worker.ts). The partials
are joined with one native affine add (point_add_affine, lib.rs:240-251).
"""
from __future__ import annotations

import concurrent.futures
from typing import Sequence

from ..config import MSMConfig
from ..oracle.curve import ExtPoint
from . import cpu_engine, tpu_engine


def msm_affine(
    points: Sequence[ExtPoint], scalars: Sequence[int], config: MSMConfig
) -> tuple[int, int]:
    ratio = config.cpu_work_ratio
    n = len(points)
    n_cpu = int(n * ratio)
    if n_cpu <= 0:
        return tpu_engine.msm_affine(points, scalars, config)
    if n_cpu >= n:
        return cpu_engine.msm_affine(points, scalars, config)

    # each engine resolves its own window size: the device optimum (w=16
    # at 2^20) would be pathological for the serial CPU running sum
    w = config.resolved_window_size_native(n)
    n_threads = cpu_engine.resolved_threads(config, co_compute=True)
    with concurrent.futures.ThreadPoolExecutor(max_workers=1) as pool:
        cpu_future = pool.submit(
            cpu_engine.msm_window_partial,
            points[:n_cpu],
            scalars[:n_cpu],
            w,
            n_threads,
        )
        tpu_result = tpu_engine.msm_affine(points[n_cpu:], scalars[n_cpu:], config)
        cpu_result = cpu_future.result()
    return cpu_engine.add_affine(cpu_result, tpu_result)


def msm_affine_wire(
    points_be, scalars_be, config: MSMConfig
) -> tuple[int, int]:
    """Wire-format co-compute: numpy array split, vectorized marshalling on
    both halves, affine join — the cpuWorkRatio split applied to the
    reference's primary input form (submission.ts:96-154)."""
    import numpy as np

    from ..utils import convert

    # Range-validated conversion (not a silent astype): direct callers with
    # u64-word arrays must get an error, not truncated-to-u32 wrong answers —
    # the same round-3 bug class api._wire_fast_path_ok guards against.
    points_be = np.ascontiguousarray(
        convert.as_u32_array(points_be, "wire points")
    ).reshape(-1, 32)
    scalars_be = np.ascontiguousarray(
        convert.as_u32_array(scalars_be, "wire scalars")
    ).reshape(-1, 8)
    n = points_be.shape[0]
    n_cpu = int(n * config.cpu_work_ratio)
    if n_cpu <= 0:
        return tpu_engine.msm_affine_wire(points_be, scalars_be, config)
    if n_cpu >= n:
        w = config.resolved_window_size_native(n)
        return cpu_engine.msm_wire(
            points_be, scalars_be, w,
            n_threads=cpu_engine.resolved_threads(config, co_compute=False),
        )
    w = config.resolved_window_size_native(n)
    n_threads = cpu_engine.resolved_threads(config, co_compute=True)
    with concurrent.futures.ThreadPoolExecutor(max_workers=1) as pool:
        cpu_future = pool.submit(
            cpu_engine.msm_wire,
            points_be[:n_cpu],
            scalars_be[:n_cpu],
            w,
            n_threads,
        )
        tpu_result = tpu_engine.msm_affine_wire(
            points_be[n_cpu:], scalars_be[n_cpu:], config
        )
        cpu_result = cpu_future.result()
    return cpu_engine.add_affine(cpu_result, tpu_result)
