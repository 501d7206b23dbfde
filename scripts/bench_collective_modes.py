#!/usr/bin/env python
"""Multi-chip payload choice, measured: "window_sums" vs "buckets".

SURVEY.md §5.8: both collective payloads must be first-class. This measures
both modes on the 8-virtual-device CPU mesh (the only multi-device fabric
available here) at two per-device scales, prints the payload bytes each
mode moves, and the ICI-model crossover reasoning recorded in DESIGN.md.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/bench_collective_modes.py
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")


def main():
    from webgpu_msm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from webgpu_msm_tpu.engines.tpu_engine import marshal_points, marshal_scalars
    from webgpu_msm_tpu.ops import curve_ops, windows
    from webgpu_msm_tpu.ops.pippenger import n_buckets
    from webgpu_msm_tpu.parallel import default_mesh, msm_window_sums_sharded
    from webgpu_msm_tpu.utils import fixtures

    D = len(jax.devices())
    mesh = default_mesh(D)
    POINT_BYTES = 4 * 16 * 4  # [4,16] u32 planes

    for (W, C, L) in [(8, 16, 16), (10, 32, 32)]:
        n_dev = C * L
        n = D * n_dev
        K = windows.n_windows(W)
        B = n_buckets(W, True)
        pts = fixtures.distinct_points(min(n, 512), seed=7)
        pts = [pts[i % len(pts)] for i in range(n)]
        scalars = fixtures.random_scalars(n, seed=8)
        planes = marshal_points(pts, n)
        words = marshal_scalars(scalars, n)
        niels = curve_ops.to_niels_planes(jnp.asarray(planes))
        sw = jnp.asarray(words)

        print(f"\nW={W} n/device={n_dev} D={D} K={K} B={B}")
        print(f"  window_sums payload/device: {K*POINT_BYTES/1024:8.1f} KiB"
              f"   buckets payload/device: {K*B*POINT_BYTES/1024/1024:8.2f} MiB")
        results = {}
        for mode in ("window_sums", "buckets"):
            fn = lambda p, s: msm_window_sums_sharded(
                p, s, window_size=W, n_chunks=C, chunk_len=L, mesh=mesh,
                mode=mode, signed_digits=True,
            )
            t0 = time.perf_counter()
            out = fn(niels, sw)
            out.block_until_ready()
            compile_s = time.perf_counter() - t0
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = fn(niels, sw)
                out.block_until_ready()
                times.append(time.perf_counter() - t0)
            results[mode] = np.asarray(out)
            print(f"  {mode:12s}: {min(times)*1e3:9.1f} ms   "
                  f"(compile {compile_s:.0f}s)")
        assert np.array_equal(results["window_sums"], results["buckets"]), \
            "modes disagree!"
        print("  modes bit-identical: True")


if __name__ == "__main__":
    main()
