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

    w = config.resolved_window_size(n)
    with concurrent.futures.ThreadPoolExecutor(max_workers=1) as pool:
        cpu_future = pool.submit(
            cpu_engine.msm_window_partial, points[:n_cpu], scalars[:n_cpu], w
        )
        tpu_result = tpu_engine.msm_affine(points[n_cpu:], scalars[n_cpu:], config)
        cpu_result = cpu_future.result()
    return cpu_engine.add_affine(cpu_result, tpu_result)
