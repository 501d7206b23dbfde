"""Native C++ CPU MSM engine (the reference's msm-wasm/arkworks analog).

Wraps `runtime/csrc/msm_cpu.cpp` via ctypes: 4x64-limb Montgomery Pippenger
parallelized over windows with OpenMP (the reference's rayon par_chunks,
msm-wasm/lib.rs:106-121). Used standalone (`engine="cpu"`, the cpuWorkRatio=1
variant, SURVEY.md §3.3) and as the host half of co-compute splits.
"""
from __future__ import annotations

import ctypes
from typing import Sequence

import numpy as np

from ..config import MSMConfig
from ..oracle import field as ofield
from ..oracle.curve import ExtPoint
from ..runtime import load


def _limbs4(v: int) -> list[int]:
    return [(v >> (64 * i)) & 0xFFFFFFFFFFFFFFFF for i in range(4)]


def msm_window_partial(
    points: Sequence[ExtPoint],
    scalars: Sequence[int],
    window_size: int,
    n_threads: int = 0,
) -> tuple[int, int]:
    """Full native MSM over the given slice -> plain affine (x, y)."""
    lib = load()
    n = len(points)
    pts = np.empty((n, 3, 4), dtype=np.uint64)
    for i, p in enumerate(points):
        if p.z != 1:
            zi = ofield.finv(p.z)
            x, y = p.x * zi % ofield.P, p.y * zi % ofield.P
            t = x * y % ofield.P
        else:
            x, y, t = p.x % ofield.P, p.y % ofield.P, p.t % ofield.P
        pts[i, 0] = _limbs4(x)
        pts[i, 1] = _limbs4(y)
        pts[i, 2] = _limbs4(t)
    sc = np.empty((n, 4), dtype=np.uint64)
    for i, s in enumerate(scalars):
        sc[i] = _limbs4(int(s) % (1 << 256))
    out = np.zeros(8, dtype=np.uint64)
    rc = lib.msm_run(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        sc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        n,
        window_size,
        n_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
    )
    if rc != 0:
        raise RuntimeError(f"msm_run failed with code {rc}")
    x = sum(int(out[i]) << (64 * i) for i in range(4))
    y = sum(int(out[4 + i]) << (64 * i) for i in range(4))
    return x, y


def add_affine(p1: tuple[int, int], p2: tuple[int, int]) -> tuple[int, int]:
    """Affine join of two partial MSM results (lib.rs:240-251 analog)."""
    lib = load()
    a = np.array(_limbs4(p1[0]) + _limbs4(p1[1]), dtype=np.uint64)
    b = np.array(_limbs4(p2[0]) + _limbs4(p2[1]), dtype=np.uint64)
    out = np.zeros(8, dtype=np.uint64)
    rc = lib.point_add_affine(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
    )
    if rc != 0:
        raise RuntimeError(f"point_add_affine failed with code {rc}")
    x = sum(int(out[i]) << (64 * i) for i in range(4))
    y = sum(int(out[4 + i]) << (64 * i) for i in range(4))
    return x, y


def _be_rows_to_limbs4(be_rows: np.ndarray) -> np.ndarray:
    """[n, 8] big-endian u32 rows -> [n, 4] little-endian u64 limbs."""
    w = be_rows[:, ::-1].astype(np.uint64)  # LE word order
    return w[:, 0::2] | (w[:, 1::2] << np.uint64(32))


def msm_wire(
    points_be: np.ndarray,  # [n, 32] u32 BE rows: x || y || t || z (z == 1)
    scalars_be: np.ndarray,  # [n, 8] u32 BE rows
    window_size: int,
    n_threads: int = 0,
) -> tuple[int, int]:
    """Wire-format native MSM: fully vectorized numpy marshalling.

    The list path (`msm_window_partial`) marshals per point in Python —
    ~200k bigint iterations at a 2^20/0.2 co-compute split before the
    native code even starts (round-1 finding). Here the whole marshal is a
    few array ops, like the TPU wire path.
    """
    lib = load()
    points_be = np.ascontiguousarray(points_be, dtype=np.uint32).reshape(-1, 32)
    scalars_be = np.ascontiguousarray(scalars_be, dtype=np.uint32).reshape(-1, 8)
    n = points_be.shape[0]
    pts = np.empty((n, 3, 4), dtype=np.uint64)
    for c, sl in enumerate((slice(0, 8), slice(8, 16), slice(16, 24))):
        pts[:, c, :] = _be_rows_to_limbs4(points_be[:, sl])
    sc = np.ascontiguousarray(_be_rows_to_limbs4(scalars_be))
    out = np.zeros(8, dtype=np.uint64)
    rc = lib.msm_run(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        sc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        n,
        window_size,
        n_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
    )
    if rc != 0:
        raise RuntimeError(f"msm_run failed with code {rc}")
    x = sum(int(out[i]) << (64 * i) for i in range(4))
    y = sum(int(out[4 + i]) << (64 * i) for i in range(4))
    return x, y


def resolved_threads(config: MSMConfig, co_compute: bool) -> int:
    """cpu_threads, or all hardware threads (all-but-one in co-compute mode
    — the reference's idle-thread reservation, lib.rs:144-169)."""
    if config.cpu_threads is not None:
        return config.cpu_threads
    import os

    hw = os.cpu_count() or 1
    return max(1, hw - 1) if co_compute else hw


def msm_affine(
    points: Sequence[ExtPoint], scalars: Sequence[int], config: MSMConfig
) -> tuple[int, int]:
    w = config.resolved_window_size_native(len(points))
    return msm_window_partial(
        points, scalars, w, n_threads=resolved_threads(config, co_compute=False)
    )
