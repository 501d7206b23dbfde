"""Typed configuration for the MSM engines.

The reference configures via URL query parameters (`windowSize`,
`cpuWorkRatio`; submission.ts:29-32,96-98) plus compile-time constants
(`consts.ts`, the 128 MB VRAM cap in gpu.ts:21). Here the same knobs are a
dataclass with the same auto-default rule for the window size
(`getBestWindowSize`, submission.ts:18-23).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

SUPPORTED_WINDOW_SIZES = tuple(range(8, 17)) + (20,)  # split.rs:17-26


def best_window_size(n_points: int) -> int:
    """Auto window size: 11 for <=2^16, 12 for 2^17..2^19, 13 for >=2^20.

    Mirrors submission.ts:18-23.
    """
    if n_points <= (1 << 16):
        return 11
    if n_points < (1 << 20):
        return 12
    return 13


def best_window_size_signed(n_points: int) -> int:
    """Auto window size for signed (balanced) digits.

    Signed digits halve the bucket range (|digit| <= 2^(w-1)), which halves
    the bucket-reduction and histogram cost at the same w. Larger windows
    were swept at 2^20 on v5e (bench.py --window, packed-gather pipeline):
    w=13 2.19M pts/s, w=14 2.15M, w=15 2.07M, w=16 2.00M — the K-
    proportional costs (gather, scan, sort) shrink slowly past w=13 while
    the B-proportional costs (histogram, bucket assembly, reduction)
    double per +1. The unsigned auto rule stays optimal."""
    return best_window_size(n_points)


def default_chunking(n_points: int) -> Tuple[int, int]:
    """Pick (n_chunks, chunk_len) with n_chunks * chunk_len >= n_points.

    The accumulation scan runs `chunk_len` sequential steps of vector width
    `n_chunks` (per window); we want width large enough to fill the VPU and
    few enough steps to bound sequential latency — the TPU analog of the
    reference's VRAM-model batch sizing (gpu.ts:71-85).
    """
    if n_points <= 0:
        raise ValueError("n_points must be positive")
    # Power-of-two sizes for XLA-friendly static shapes, biased toward wide
    # chunks (more VPU lanes per step, fewer sequential steps). One batch is
    # capped at 2^18 points; larger inputs stream in batches whose bucket
    # arrays are added (gpu.ts:78-85 VRAM-model analog: staged flushes are
    # O(batch * n_windows) points of HBM).
    bits = max(1, math.ceil(math.log2(n_points)))
    bits = min(bits, 18)
    n_chunks = 1 << min(math.ceil(bits * 0.6), 13)
    n_chunks = min(n_chunks, 1 << bits)
    chunk_len = (1 << bits) // n_chunks
    return n_chunks, chunk_len


@dataclasses.dataclass(frozen=True)
class MSMConfig:
    """Configuration for a single MSM computation."""

    window_size: Optional[int] = None  # None -> best_window_size(n)
    # Host/device co-compute split in [0, 1]: fraction of points handled by
    # the native CPU engine (the reference's cpuWorkRatio, DESIGN.md:7-34).
    # Default 0: measured sweep (benchmark.py --ratio-sweep; DESIGN.md
    # "Co-compute split, measured") shows TPU-only wins at every split on a
    # 1-core-per-chip host; re-sweep on many-core hosts.
    cpu_work_ratio: float = 0.0
    # Accumulation chunking; None -> default_chunking(n).
    n_chunks: Optional[int] = None
    chunk_len: Optional[int] = None
    # Signed (balanced) digit decomposition: halves the bucket range by
    # negating points on the fly (free on Edwards curves), enabling larger
    # windows. Requires scalars < 2^254; the engine checks and falls back.
    signed_digits: bool = True
    # Native-engine thread count. None = all hardware threads for the
    # cpu-only engine, all-but-one under co-compute — the analog of the
    # reference's idle-thread reservation (msm-wasm run_with_idle,
    # lib.rs:144-169), which parks rayon threads so the GPU driver thread
    # stays responsive.
    cpu_threads: Optional[int] = None
    # Multi-chip: how window/bucket partials are combined across devices.
    #   "window_sums": all-gather per-window sums (tiny payload; default)
    #   "buckets":     all-gather full bucket arrays, combine locally
    # (SURVEY.md §5.8: both modes are first-class.)
    collective_mode: str = "window_sums"

    def resolved_window_size(self, n_points: int) -> int:
        if self.window_size is not None:
            w = self.window_size
        elif self.signed_digits:
            w = best_window_size_signed(n_points)
        else:
            w = best_window_size(n_points)
        if w not in SUPPORTED_WINDOW_SIZES:
            raise ValueError(f"unsupported window size {w}; supported: {SUPPORTED_WINDOW_SIZES}")
        return w

    def resolved_chunking(self, n_points: int) -> Tuple[int, int]:
        if self.n_chunks is not None and self.chunk_len is not None:
            return self.n_chunks, self.chunk_len
        return default_chunking(n_points)
