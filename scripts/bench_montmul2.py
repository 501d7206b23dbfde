"""Isolated kmont_mul throughput at varying chain counts / block shapes.

Measures lane-montmuls/s for a kernel that just multiplies: the gap between
this and the accumulation scan's effective rate shows scan-structure
overhead; the gap to the raw op-issue peak (~6T lane-ops/s, bench_vpu_ops)
shows register-spill cost.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from webgpu_msm_tpu.ops.pallas import field_kernels as fk


def make_kernel(n_chains, n_rounds):
    def kernel(a_ref, b_ref, o_ref):
        chains = []
        for c in range(n_chains):
            chains.append([a_ref[c, d] for d in range(16)])
        b = [b_ref[0, d] for d in range(16)]
        for r in range(n_rounds):
            for c in range(n_chains):
                chains[c] = fk.kmont_mul(chains[c], b)
        for c in range(n_chains):
            for d in range(16):
                o_ref[c, d] = chains[c][d]

    return kernel


def bench(n_chains, n_rounds, rows, grid, iters=3):
    a = jnp.ones((n_chains, 16, rows, 128), dtype=jnp.uint32)
    b = jnp.full((1, 16, rows, 128), 3, dtype=jnp.uint32)
    spec = lambda n: pl.BlockSpec(
        (n, 16, rows, 128), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM
    )
    f = jax.jit(
        lambda a, b: pl.pallas_call(
            make_kernel(n_chains, n_rounds),
            grid=(grid,),
            in_specs=[spec(n_chains), spec(1)],
            out_specs=spec(n_chains),
            out_shape=jax.ShapeDtypeStruct((n_chains, 16, rows, 128), jnp.uint32),
        )(a, b)
    )
    r = f(a, b)
    np.asarray(r.ravel()[0])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(f(a, b).ravel()[0])
        ts.append(time.perf_counter() - t0)
    t = np.median(ts)
    lane_mms = n_chains * n_rounds * rows * 128 * grid
    return t, lane_mms


def main():
    print(f"backend={jax.default_backend()}")
    for rows, n_chains, n_rounds, grid in [
        (8, 1, 8, 2048),
        (8, 4, 8, 1024),
        (16, 1, 8, 1024),
        (16, 4, 8, 512),
        (8, 8, 8, 512),
    ]:
        t, mm = bench(n_chains, n_rounds, rows, grid)
        print(
            f"rows={rows:3d} chains={n_chains} rounds={n_rounds} grid={grid}: "
            f"{t*1e3:8.2f} ms -> {mm/t/1e9:6.3f} G lane-montmuls/s"
        )


if __name__ == "__main__":
    main()
