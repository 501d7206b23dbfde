"""Scaling-efficiency measurement + ICI collective cost model.

BASELINE.md targets >=80% scaling efficiency to N hosts; no multi-chip
hardware is reachable from this environment (one v5e chip via tunnel), so
this module provides the two measurable proxies (round-3 verdict #6):

1. **Analytic collective cost model** — exact payload bytes per device for
   each collective mode (SURVEY.md §5.8 payload choice) against the
   measured single-chip compute time, under a stated ICI bandwidth
   assumption. On TPU v5e the ICI moves ~45 GB/s per link per direction
   (public spec: 1,600 Gbit/s aggregate over 4 links); a 1-D ring
   all-gather of per-device payload S costs ~S*(D-1)/BW plus the log-depth
   group-law tree (log2(D) vectorized point adds over the gathered axis).

2. **Virtual-mesh weak-scaling trend** — the sharded pipeline executed at
   D = 1, 2, 4, 8 with fixed points/device on the host-platform device
   mesh. CAVEAT: virtual CPU devices time-share one physical host, so
   wall-clock "efficiency" on this mesh measures the host's core count,
   NOT ICI behavior; it is recorded to pin the collective *correctness*
   and dispatch overhead trend, and labeled as such.

`python -m webgpu_msm_tpu.parallel.scaling` prints both tables
(`benchmark.py --scaling` shells out to it with a virtual-device env).
"""
from __future__ import annotations

import time
from dataclasses import dataclass

import numpy as np

# Stated assumption for the analytic model (see module docstring).
ICI_BYTES_PER_S = 45e9
POINT_COORD_BYTES = 4 * 16 * 4  # [4, 16] u32 digit planes per point


def payload_bytes(window_size: int, signed_digits: bool, mode: str) -> int:
    """Per-device collective payload for one sharded MSM combine."""
    from ..ops import pippenger, windows

    K = windows.n_windows(window_size)
    if mode == "window_sums":
        return K * POINT_COORD_BYTES
    B = pippenger.n_buckets(window_size, signed_digits)
    return K * B * POINT_COORD_BYTES


def modeled_efficiency(
    compute_s: float,
    payload: int,
    n_devices: int,
    tree_add_s_per_level: float = 0.0,
    ici_bytes_per_s: float = ICI_BYTES_PER_S,
) -> float:
    """Weak-scaling efficiency = t_compute / (t_compute + t_collective).

    all_gather on a 1-D ring: each device receives (D-1) payloads; the
    group-law combine adds log2(D) vectorized point-add levels.
    """
    if n_devices == 1:
        return 1.0
    t_coll = payload * (n_devices - 1) / ici_bytes_per_s
    t_tree = tree_add_s_per_level * max(1, (n_devices - 1).bit_length())
    return compute_s / (compute_s + t_coll + t_tree)


@dataclass
class ScalingRow:
    n_devices: int
    n_points: int
    wall_s: float
    # Efficiency relative to the SMALLEST D that actually ran (recorded in
    # base_devices — round-4 advice: when d_values omits 1 or devices are
    # short, "vs D=1" would silently mean something else).
    efficiency_vs_base: float
    base_devices: int = 1


def weak_scaling_trend(
    d_values=(1, 2, 4, 8),
    *,
    window_size: int = 8,
    n_chunks: int = 8,
    chunk_len: int = 8,
    mode: str = "window_sums",
    iters: int = 3,
) -> list[ScalingRow]:
    """Run the sharded MSM at fixed points/device for each D (on whatever
    devices the current backend exposes) and time it."""
    import jax
    import jax.numpy as jnp

    from ..engines.tpu_engine import marshal_points, marshal_scalars
    from ..ops import curve_ops
    from ..utils import fixtures
    from .msm_sharded import default_mesh, msm_window_sums_sharded

    rows: list[ScalingRow] = []
    t1 = None
    base_d = None
    for D in d_values:
        if D > len(jax.devices()):
            break
        n = D * n_chunks * chunk_len
        pts = fixtures.distinct_points(min(n, 256), seed=11)
        pts = [pts[i % len(pts)] for i in range(n)]
        scalars = fixtures.random_scalars(n, seed=12)
        planes = marshal_points(pts, n)
        words = marshal_scalars(scalars, n)
        niels = curve_ops.to_niels_planes(jnp.asarray(planes))
        sw = jnp.asarray(words)
        mesh = default_mesh(D)

        def run():
            out = msm_window_sums_sharded(
                niels, sw, window_size=window_size, n_chunks=n_chunks,
                chunk_len=chunk_len, mesh=mesh, mode=mode,
            )
            out.block_until_ready()

        run()  # compile
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        wall = float(np.median(times))
        if t1 is None:
            t1 = wall
            base_d = D
        rows.append(ScalingRow(D, n, wall, t1 / wall, base_devices=base_d))
    return rows


def print_report(
    compute_s: float = 0.358,  # measured 2^20 device_s, round 4 (w=16)
    window_size: int = 16,
    signed_digits: bool = True,
) -> None:
    print("== Analytic ICI model (v5e, 45 GB/s/link/direction assumption) ==")
    print(f"single-chip compute_s={compute_s} (2^20, measured)")
    for mode in ("window_sums", "buckets"):
        pl = payload_bytes(window_size, signed_digits, mode)
        effs = ", ".join(
            f"D={d}: {modeled_efficiency(compute_s, pl, d):.4f}"
            for d in (2, 4, 8, 16, 64)
        )
        print(f"mode={mode:12s} payload/device={pl/1e6:9.3f} MB  -> {effs}")

    print("\n== Virtual-mesh weak-scaling trend (CPU devices time-share one")
    print("   host; NOT an ICI measurement — records dispatch/collective")
    print("   overhead trend only) ==")
    for r in weak_scaling_trend():
        print(
            f"D={r.n_devices}  n={r.n_points:6d}  wall={r.wall_s*1e3:9.1f} ms"
            f"  eff(vs D={r.base_devices})={r.efficiency_vs_base:.3f}"
        )


if __name__ == "__main__":
    import jax

    # this environment force-registers the axon TPU plugin; the virtual
    # CPU mesh needs an explicit platform pin before first backend touch
    jax.config.update("jax_platforms", "cpu")
    print_report()
