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

# The reference's Rust splitter supported {8..16, 20} (split.rs:17-26);
# this engine's window split / bucket pipeline is generic in w, so the gap
# (17, 18, 19) is supported too — swept at 2^20 in round 5 (DESIGN.md
# "Window sweep beyond 16"): K only drops by 1 per step from w=17 while B
# doubles, so none of them beat w=16.
SUPPORTED_WINDOW_SIZES = tuple(range(8, 21))


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
    """Auto window size for signed (balanced) digits on the DEVICE engine.

    Round-4 sweep on v5e (bench.py --window, single-batch chunking — the
    2^18 batch cap used in earlier rounds made w=13 look optimal at 2^20
    because B-proportional per-batch costs were paid 4x):

        2^16: w13 2.32M > w15 1.32M > w16 0.84M   pts/s
        2^18: w13 2.11M > w15 1.91M > w16 1.73M
        2^20: w16 2.93M > w15 2.85M > w13 2.68M

    With the whole input in one batch, the O(K*B) bucket costs are one-time
    and big windows win once n is large enough to amortize them; below that
    the K-proportional gather/scan/sort costs dominate. Full rule from the
    sweep: 2^16: w12 2.44M (w11 2.02, w13 2.32); 2^17: w13 2.79M (w12
    2.73); 2^18: w13 (w12 2.00); 2^19: w13 2.67M (w15 2.64, w16 2.46)."""
    if n_points >= (1 << 20):
        return 16
    if n_points <= (1 << 16):
        return 12
    return 13


def default_chunking(n_points: int) -> Tuple[int, int]:
    """Pick (n_chunks, chunk_len) with n_chunks * chunk_len >= n_points.

    The accumulation scan runs `chunk_len` sequential steps of vector width
    `n_chunks` (per window); we want width large enough to fill the VPU and
    few enough steps to bound sequential latency — the TPU analog of the
    reference's VRAM-model batch sizing (gpu.ts:71-85).
    """
    if n_points <= 0:
        raise ValueError("n_points must be positive")
    # Power-of-two sizes for XLA-friendly static shapes. One batch is
    # capped at 2^20 points; larger inputs stream in batches whose bucket
    # arrays are added (gpu.ts:78-85 VRAM-model analog: staged flushes are
    # O(batch * n_windows) points of HBM — ~5.4 GB at 2^20/w=13, inside a
    # v5e's 16 GB). Round 4 measured the old 2^18 cap costing ~20% at
    # 2^20: the per-batch fixed costs (histogram, bucket assembly, carry
    # add — all O(K*B) or O(K*M)) amortize over the whole input in one
    # batch, and (C, L) = (2048, 512) beat wider/shorter shapes
    # ((4096,256): −2.2%, (8192,128): −4.1%; bench.py --chunks sweep).
    bits = max(1, math.ceil(math.log2(n_points)))
    bits = min(bits, 20)
    n_chunks = 1 << min(math.ceil(bits * 0.6), 11)
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
    # Convert window sums to affine ON DEVICE (batched Fermat inverse,
    # field_ops.finv_mont — the reference WGSL library's field_inverse
    # capability, FieldModulus.ts:119-164). Off by default: the host pays
    # one bigint inverse per MSM either way, so this is a capability-parity
    # flag, not a performance knob.
    device_affine: bool = False
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

    def resolved_window_size_native(self, n_points: int) -> int:
        """Window size for the NATIVE CPU engine (standalone or the CPU half
        of a co-compute split). The device optimum moved to w=16 at 2^20
        (one-time vectorized bucket costs), but a serial CPU pays the full
        2^(w-1) running sum per window per thread — the reference's
        arkworks-tuned 11/12/13 rule (submission.ts:18-23) stays right for
        it. The two engines compute independent partial MSMs, so each
        resolves its own w."""
        if self.window_size is not None:
            return self.window_size
        return best_window_size(n_points)

    def resolved_chunking(self, n_points: int) -> Tuple[int, int]:
        if self.n_chunks is not None and self.chunk_len is not None:
            return self.n_chunks, self.chunk_len
        return default_chunking(n_points)

    def resolved_wire_plan(self, n_points: int) -> Tuple[int, int, int]:
        """(window, n_chunks, chunk_len) for HOST-FED (wire) inputs.

        The single-job wall clock on host-fed inputs is transfer-bound
        (~1.5 s for 2^20 x||y rows on this link vs ~0.36 s compute), so
        the wall-optimal plan streams the input in <=2^18-point batches
        whose transfers overlap the previous batch's compute (gpu.ts:
        146-155 staging, measured round 2/4) — and with per-batch bucket
        costs paid once per batch, w=13 stays optimal there. Device-
        resident inputs use resolved_window_size/resolved_chunking
        instead (single batch, w=16 at 2^20: +35% device throughput).
        Explicit window_size / chunking overrides win.
        """
        if self.window_size is not None:
            w = self.window_size
        elif n_points <= (1 << 16):
            w = 12 if self.signed_digits else best_window_size(n_points)
        else:
            w = 13
        if self.n_chunks is not None and self.chunk_len is not None:
            return w, self.n_chunks, self.chunk_len
        bits = max(1, math.ceil(math.log2(max(n_points, 1))))
        bits = min(bits, 18)
        n_chunks = 1 << min(math.ceil(bits * 0.6), 13)
        n_chunks = min(n_chunks, 1 << bits)
        return w, n_chunks, (1 << bits) // n_chunks
