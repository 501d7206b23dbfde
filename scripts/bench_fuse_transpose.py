#!/usr/bin/env python
"""Measure fusing the post-gather relayout into a Pallas kernel.

The round-1 pipeline pays, per batch (L=128, W=40960 at 2^20 / w=13):

    A) jnp.take(rows [M,24], perm)          -> [L*W, 24]   (random gather)
       + XLA transpose to plane-major       -> [3, 8, L, W]

The transpose is a full HBM round-trip of ~503 MB at ~30 GB/s effective
(DESIGN.md hardware table). This script measures in-kernel alternatives
that consume the gather output in row-major layout directly
(VERDICT round-1 item #1).  Run on the real TPU.
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L, W = 128, 40960
M = 1 << 18
STEPS = 4
BLOCK_G = 8  # groups of 128 lanes per cell
LANES = 128


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0][..., :1])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        np.asarray(jax.tree_util.tree_leaves(out)[0][..., :1])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


@jax.jit
def take_only(rows, perm):
    return jnp.take(rows, perm, axis=0)


@jax.jit
def take_transpose(rows, perm):
    g = jnp.take(rows, perm, axis=0)  # [L*W, 24]
    return jnp.transpose(g.reshape(L, W, 3, 8), (2, 3, 0, 1))  # [3,8,L,W]


def _relayout_kernel_t(pts_ref, o_ref):
    # pts_ref: (STEPS, BLOCK_G, LANES, 24); transpose minor dims per step.
    x = pts_ref[...]
    outs = []
    for s in range(STEPS):
        yt = jnp.transpose(x[s], (0, 2, 1))  # (BLOCK_G, 24, LANES)
        outs.append(jnp.transpose(yt, (1, 0, 2)))  # (24, BLOCK_G, LANES)
    o_ref[...] = jnp.stack(outs, axis=1)  # (24, STEPS, BLOCK_G, LANES)


def _relayout_kernel_slice(pts_ref, o_ref):
    # pts_ref: (STEPS, BLOCK_G, LANES, 24); extract lane j per plane.
    x = pts_ref[...]
    for s in range(STEPS):
        for j in range(24):
            o_ref[j, s] = x[s, :, :, j]


def _fused(kernel, rows, perm):
    g = jnp.take(rows, perm, axis=0)  # [L*W, 24]
    g4 = g.reshape(L, W // LANES, LANES, 24)
    grid = (W // (BLOCK_G * LANES), L // STEPS)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (STEPS, BLOCK_G, LANES, 24),
                lambda wb, lb: (lb, wb, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_shape=jax.ShapeDtypeStruct(
            (24, L, W // LANES, LANES), jnp.uint32
        ),
        out_specs=pl.BlockSpec(
            (24, STEPS, BLOCK_G, LANES),
            lambda wb, lb: (0, lb, wb, 0),
            memory_space=pltpu.VMEM,
        ),
    )(g4)
    return out


take_fused_t = jax.jit(functools.partial(_fused, _relayout_kernel_t))
take_fused_slice = jax.jit(functools.partial(_fused, _relayout_kernel_slice))


def check(fn, rows, perm, name):
    a = np.asarray(take_transpose(rows, perm))  # [3,8,L,W]
    b = np.asarray(fn(rows, perm)).reshape(24, L, W)
    ok = all(
        np.array_equal(a[j // 8, j % 8], b[j]) for j in range(24)
    )
    print(f"{name} bit-exact:", ok)


def main():
    rng = np.random.default_rng(0)
    rows = jnp.asarray(
        rng.integers(0, 1 << 32, size=(M, 24), dtype=np.uint64).astype(np.uint32)
    )
    perm = jnp.asarray(
        rng.integers(0, M, size=(L * W,), dtype=np.int64).astype(np.int32)
    )
    rows, perm = jax.device_put(rows), jax.device_put(perm)

    t_take = timeit(take_only, rows, perm)
    print(f"take only:            {t_take*1e3:8.2f} ms")
    t_tt = timeit(take_transpose, rows, perm)
    print(f"take + XLA transpose: {t_tt*1e3:8.2f} ms  (relayout {1e3*(t_tt-t_take):.2f})")
    for name, fn in [("transpose-kernel", take_fused_t), ("slice-kernel", take_fused_slice)]:
        try:
            t = timeit(fn, rows, perm)
            print(f"take + {name}:  {t*1e3:8.2f} ms  (relayout {1e3*(t-t_take):.2f})")
            check(fn, rows, perm, name)
        except Exception as e:  # noqa: BLE001
            print(f"{name} FAILED: {str(e)[:300]}")


if __name__ == "__main__":
    main()
