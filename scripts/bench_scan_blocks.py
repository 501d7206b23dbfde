#!/usr/bin/env python
"""Sweep accumulate_scan cell geometry (block_rows x steps) on real TPU.

The kernel's grid is (width_blocks, L/steps); block_rows fixes the sublane
count per cell and steps the in-register unroll. This script backs the
block_rows=16 / steps=4 defaults in ops/pallas/padd_kernels.py.

Usage: python scripts/bench_scan_blocks.py [L] [W]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from webgpu_msm_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from webgpu_msm_tpu.ops.pallas import padd_kernels as pk


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 40960
    rng = np.random.default_rng(0)
    pts = jax.device_put(jnp.asarray(
        rng.integers(0, 1 << 32, size=(3, 8, L, W), dtype=np.uint64).astype(
            np.uint32)))
    ids = jax.device_put(jnp.asarray(
        rng.integers(0, 4096, size=(L, W), dtype=np.int64).astype(np.uint32)))

    rows = W // pk.LANES
    for block_rows in (8, 16, 32):
        if rows % block_rows:
            continue
        for steps in (1, 2, 4, 8, 16):
            if L % steps:
                continue
            fn = jax.jit(
                lambda p, i, br=block_rows, s=steps: pk.accumulate_scan(
                    p, i, block_rows=br, steps=s))
            try:
                out = fn(pts, ids)
                jax.block_until_ready(out)
                np.asarray(out[0].ravel()[0])
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    out = fn(pts, ids)
                    np.asarray(out[0].ravel()[0])
                    ts.append(time.perf_counter() - t0)
                print(f"block_rows={block_rows:3d} steps={steps:3d}: "
                      f"{np.median(ts)*1e3:8.2f} ms")
            except Exception as e:  # noqa: BLE001
                print(f"block_rows={block_rows:3d} steps={steps:3d}: "
                      f"FAILED {str(e)[:120]}")


if __name__ == "__main__":
    main()
