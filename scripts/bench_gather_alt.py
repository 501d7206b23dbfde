#!/usr/bin/env python
"""Alternatives to the XLA row-gather (the pipeline's #1 cost, ~13.3 ns/row).

Four candidate mechanisms, each measured:
  1. scatter: write-side permutation (out.at[idx].set(rows)) — if TPU scatter
     beats gather, invert the permutation.
  2. payload sort: lax.sort carrying the 24-u32 payload (deletes the gather);
     round 1 found a >45 min compile at 26 operands — re-test on jax 0.9,
     small shape first, and a split variant (several stable sorts).
  3. Pallas per-row DMA gather: scalar-core make_async_copy per row — the
     VERDICT-suggested scalar-prefetch route; measures descriptor issue rate.
  4. In-kernel dynamic sublane gather (table lookup): does Mosaic v5e lower
     jnp.take_along_axis / lax.gather over sublanes? Enables gather-free
     subset-sum organizations.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = 1 << 18


def timeit(fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def bench_scatter():
    rng = np.random.default_rng(0)
    rows = jax.device_put(jnp.asarray(
        rng.integers(0, 1 << 32, size=(M, 24), dtype=np.uint64).astype(np.uint32)))
    idx = jax.device_put(jnp.asarray(rng.permutation(M).astype(np.int32)))

    @jax.jit
    def scat(rows, idx):
        return jnp.zeros((M, 24), jnp.uint32).at[idx].set(rows)

    @jax.jit
    def gat(rows, idx):
        g = jnp.take(rows, idx, axis=0)
        return jnp.transpose(g, (1, 0))

    t = timeit(scat, rows, idx)
    print(f"scatter [M,24] rows:   {t*1e3:8.2f} ms  {t/M*1e9:6.2f} ns/row")
    t = timeit(gat, rows, idx)
    print(f"gather  [M,24] rows:   {t*1e3:8.2f} ms  {t/M*1e9:6.2f} ns/row")


def bench_payload_sort(n_payload: int, mm: int, compile_budget_s: float):
    rng = np.random.default_rng(1)
    keys = jax.device_put(jnp.asarray(
        rng.integers(0, 4096, size=(20, mm), dtype=np.int64).astype(np.uint32)))
    payload = [
        jax.device_put(jnp.asarray(
            rng.integers(0, 1 << 32, size=(20, mm), dtype=np.uint64).astype(np.uint32)))
        for _ in range(n_payload)
    ]

    @jax.jit
    def psort(keys, *payload):
        return jax.lax.sort((keys,) + payload, dimension=1, num_keys=1,
                            is_stable=True)

    t0 = time.perf_counter()
    try:
        out = psort(keys, *payload)
        jax.block_until_ready(out)
    except Exception as e:  # noqa: BLE001
        print(f"payload sort n={n_payload} [20,{mm}] FAILED: {str(e)[:200]}")
        return
    compile_s = time.perf_counter() - t0
    t = timeit(psort, keys, *payload)
    print(f"payload sort n={n_payload:2d} [20,{mm}]: {t*1e3:8.2f} ms "
          f"(compile {compile_s:6.1f} s)")


def bench_dma_gather():
    """Per-row DMA gather: rows stay in HBM ('ANY'); the kernel copies each
    indexed 24-u32 row HBM->VMEM with make_async_copy. Measures descriptor
    issue rate at a small row count (rate extrapolates linearly)."""
    R = 1 << 14  # rows to gather

    def kern(idx_ref, rows_hbm, out_ref, sem):
        def body(i, _):
            j = idx_ref[i]
            cp = pltpu.make_async_copy(
                rows_hbm.at[j], out_ref.at[i], sem
            )
            cp.start()
            cp.wait()
            return 0

        jax.lax.fori_loop(0, R, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )
    rng = np.random.default_rng(2)
    rows = jax.device_put(jnp.asarray(
        rng.integers(0, 1 << 32, size=(M, 24), dtype=np.uint64).astype(np.uint32)))
    idx = jax.device_put(jnp.asarray(
        rng.integers(0, M, size=(R,), dtype=np.int64).astype(np.int32)))

    @jax.jit
    def run(idx, rows):
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((R, 24), jnp.uint32),
        )(idx, rows)

    try:
        t = timeit(run, idx, rows)
        print(f"pallas per-row DMA gather ({R} rows): {t*1e3:8.2f} ms  "
              f"{t/R*1e9:6.2f} ns/row")
        ref = np.asarray(rows)[np.asarray(idx)]
        ok = np.array_equal(np.asarray(run(idx, rows)), ref)
        print("  bit-exact:", ok)
    except Exception as e:  # noqa: BLE001
        print(f"pallas per-row DMA gather FAILED: {str(e)[:300]}")


def bench_dynamic_gather():
    """In-kernel per-lane table lookup: out[s, l] = table[idx[s, l], l]."""
    T, S = 256, 8

    def kern(tab_ref, idx_ref, o_ref):
        tab = tab_ref[...]  # (T, 128)
        idx = idx_ref[...]  # (S, 128)
        o_ref[...] = jnp.take_along_axis(tab, idx, axis=0)

    rng = np.random.default_rng(3)
    tab = jax.device_put(jnp.asarray(
        rng.integers(0, 1 << 32, size=(T, 128), dtype=np.uint64).astype(np.uint32)))
    idx = jax.device_put(jnp.asarray(
        rng.integers(0, T, size=(S, 128), dtype=np.int64).astype(np.int32)))

    @jax.jit
    def run(tab, idx):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((S, 128), jnp.uint32),
        )(tab, idx)

    try:
        out = np.asarray(run(tab, idx))
        ref = np.take_along_axis(np.asarray(tab), np.asarray(idx), axis=0)
        print("in-kernel dynamic sublane gather: SUPPORTED, bit-exact:",
              np.array_equal(out, ref))
    except Exception as e:  # noqa: BLE001
        print(f"in-kernel dynamic sublane gather FAILED: {str(e)[:300]}")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "scatter"):
        bench_scatter()
    if which in ("all", "dma"):
        bench_dma_gather()
    if which in ("all", "dyn"):
        bench_dynamic_gather()
    if which in ("all", "sort"):
        bench_payload_sort(3, 1 << 16, 300)
        bench_payload_sort(25, 1 << 16, 300)
        bench_payload_sort(25, 1 << 18, 1200)


if __name__ == "__main__":
    main()
