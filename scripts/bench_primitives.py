"""Microbenchmark primitive op throughput inside Pallas kernels on TPU.

Measures per-op cost of u32 multiply, u32 add/mask/shift, f32 multiply-add,
and bf16 MXU matmul — the data that decides the Montgomery-mul engine design
(16-bit digits in u32 lanes vs 8-bit digits in f32/bf16 with MXU offload).
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

from webgpu_msm_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

R, C = 8, 128
REPS = 4096  # ops per kernel invocation per element


def timeit(fn, *args, iters=5, name="", ops_per_elem=REPS):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    n_elem = args[0].size // (args[0].shape[-1] // C if False else 1)
    total_ops = args[0].shape[0] * R * C // (R * C) * 0  # unused
    return dt


def mk(kernel, grid, shape=(R, C), dtype=jnp.uint32, n_in=2):
    def call(*xs):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            ]
            * n_in,
            out_specs=pl.BlockSpec(
                shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        )(*xs)

    return jax.jit(call)


def bench(name, kernel, dtype, grid=2048, n_in=2):
    xs = [
        jnp.asarray(
            np.random.default_rng(i).integers(1, 100, size=(R, C)).astype(
                np.float32 if dtype != jnp.uint32 else np.uint32
            )
            * (1e-3 if dtype != jnp.uint32 else 1),
            dtype=dtype,
        )
        for i in range(n_in)
    ]
    def measure(g):
        fn = mk(kernel, g, shape=(R, C), dtype=dtype, n_in=n_in)
        out = fn(*xs)
        np.asarray(out.ravel()[0])
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(fn(*xs).ravel()[0])
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))
    # two work sizes; the slope cancels the ~30 ms tunnel round-trip floor
    d1, d2 = measure(grid), measure(grid * 4)
    dt = (d2 - d1) / (3 * grid * REPS)
    ns_per_vec_op = dt * 1e9
    cycles = ns_per_vec_op * 0.94  # v5e ~940 MHz
    print(f"{name:24s} {d1*1e3:8.3f}/{d2*1e3:8.3f} ms  {ns_per_vec_op:7.3f} ns/vec-op  ~{cycles:5.2f} cyc")


def _chains(a, b, op, reps, n_chains=8):
    accs = [a + i for i in range(n_chains)]
    for _ in range(reps // n_chains):
        accs = [op(acc, b) for acc in accs]
    out = accs[0]
    for acc in accs[1:]:
        out = out ^ acc if out.dtype == jnp.uint32 else out + acc
    return out


def k_u32_mul(a_ref, b_ref, o_ref):
    o_ref[...] = _chains(a_ref[...], b_ref[...], lambda x, y: x * y, REPS)


def k_u32_add(a_ref, b_ref, o_ref):
    o_ref[...] = _chains(a_ref[...], b_ref[...], lambda x, y: (x + y) & 0xFFFF, REPS)


def k_u32_mulmask(a_ref, b_ref, o_ref):
    a, b = a_ref[...], b_ref[...]
    acc = a
    for _ in range(REPS // 4):
        p = acc * b
        acc = (p & 0xFFFF) + (p >> 16)
        p = acc * b
        acc = (p & 0xFFFF) + (p >> 16)
    o_ref[...] = acc


def k_f32_fma(a_ref, b_ref, o_ref):
    a = a_ref[...]
    o_ref[...] = _chains(a, b_ref[...], lambda x, y: x * y + a, REPS)


def k_mxu(a_ref, b_ref, o_ref):
    a, b = a_ref[...], b_ref[...]
    acc = a
    for _ in range(REPS // 8):
        acc = jnp.dot(acc, b, preferred_element_type=jnp.float32)
        acc = acc * 1e-3  # keep finite
    o_ref[...] = acc


def main():
    global R, C
    print(f"backend={jax.default_backend()} shape=({R},{C}) reps={REPS}")
    bench("u32 multiply", k_u32_mul, jnp.uint32)
    bench("u32 add+mask", k_u32_add, jnp.uint32)
    bench("u32 mul+split (4ops)", k_u32_mulmask, jnp.uint32)
    bench("f32 fma", k_f32_fma, jnp.float32)
    # MXU: 128x128 matmul, count per-128x128-dot
    R, C = 128, 128
    bench("f32 128x128 dot (/8)", k_mxu, jnp.float32)


if __name__ == "__main__":
    main()
