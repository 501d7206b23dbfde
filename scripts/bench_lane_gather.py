#!/usr/bin/env python
"""Throughput of the in-kernel LANE-axis dynamic gather on TPU.

The bit-subset-table MSM organization (DESIGN.md "gather wall") selects one
of 2^b subset-sum table entries per (block, bit-plane) with
`jnp.take_along_axis(tab, idx, axis=1)` inside the kernel. Its viability
hinges on that gather lowering to a hardware lane permute (~vector-op cost)
rather than an O(lanes) select tree. This measures the marginal cost of a
[8, 1024] lane gather against u32 adds at production-like shapes.

Run on TPU: python scripts/bench_lane_gather.py
"""
import functools
import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters


def make_kernel(n_gathers, n_adds, rows):
    def kern(tab_ref, idx_ref, o_ref):
        tab = tab_ref[...]  # (rows, 1024)
        idx = idx_ref[...]
        acc = tab
        for i in range(n_gathers):
            g = jnp.take_along_axis(tab, (idx + i) & 1023, axis=1)
            acc = acc + g
        for i in range(n_adds):
            acc = acc + (acc >> 1)
        o_ref[...] = acc

    return kern


def run_case(n_gathers, n_adds, rows=8, reps=64):
    """reps sequential (rows,1024) tiles in one kernel via grid."""
    rng = np.random.default_rng(0)
    tab = jnp.asarray(
        rng.integers(0, 1 << 32, size=(reps * rows, 1024), dtype=np.uint64
                     ).astype(np.uint32))
    idx = jnp.asarray(
        rng.integers(0, 1024, size=(reps * rows, 1024), dtype=np.int64
                     ).astype(np.int32))

    @jax.jit
    def run(tab, idx):
        return pl.pallas_call(
            make_kernel(n_gathers, n_adds, rows),
            grid=(reps,),
            in_specs=[
                pl.BlockSpec((rows, 1024), lambda i: (i, 0)),
                pl.BlockSpec((rows, 1024), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((rows, 1024), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((reps * rows, 1024), jnp.uint32),
        )(tab, idx)

    t = timeit(run, tab, idx)
    per_tile = t / reps
    return t, per_tile


def main():
    print("backend:", jax.default_backend())
    rows = 8
    # correctness first
    rng = np.random.default_rng(1)
    tab = jnp.asarray(rng.integers(0, 1 << 32, size=(8, 1024),
                                   dtype=np.uint64).astype(np.uint32))
    idx = jnp.asarray(rng.integers(0, 1024, size=(8, 1024),
                                   dtype=np.int64).astype(np.int32))

    def kern(tab_ref, idx_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(tab_ref[...], idx_ref[...], axis=1)

    out = np.asarray(
        pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((8, 1024), jnp.uint32)
        )(tab, idx)
    )
    ref = np.take_along_axis(np.asarray(tab), np.asarray(idx), axis=1)
    print("lane gather bit-exact:", np.array_equal(out, ref))

    base, _ = run_case(0, 0)
    for ng, na in [(0, 16), (4, 16), (16, 16), (64, 16), (16, 0), (64, 0)]:
        t, per = run_case(ng, na)
        print(
            f"gathers={ng:3d} adds={na:3d}: {t*1e3:8.3f} ms total, "
            f"{per*1e6:7.2f} us/tile, marginal vs base "
            f"{(t-base)*1e6/64:7.2f} us/tile"
        )
    # marginal cost per gather and per add
    t_g16, _ = run_case(16, 16)
    t_g64, _ = run_case(64, 16)
    t_a16, _ = run_case(0, 16)
    t_a64, _ = run_case(0, 64)
    per_gather = (t_g64 - t_g16) / 48 / 64
    per_add = (t_a64 - t_a16) / 48 / 64
    print(f"per [8,1024] gather: {per_gather*1e9:8.1f} ns")
    print(f"per [8,1024] 2xadd+shift: {per_add*1e9:8.1f} ns")
    print(f"gather / add-pair ratio: {per_gather/max(per_add,1e-12):6.2f}")


if __name__ == "__main__":
    main()
