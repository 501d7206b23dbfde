"""Microbenchmark: per-op cost of u32 mul / add / shift / select on the VPU.

Long chains of independent-ish ops over a [8, 1024] tile, grid-repeated; the
delta between N-op and 2N-op kernels isolates the marginal op cost.
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


def make_kernel(op, n_ops):
    def kernel(x_ref, o_ref):
        a = x_ref[0]
        b = x_ref[1]
        c = x_ref[2]
        d = x_ref[3]
        for i in range(n_ops // 4):
            if op == "mul":
                a = a * b
                b = b * c
                c = c * d
                d = d * a
            elif op == "add":
                a = a + b
                b = b + c
                c = c + d
                d = d + a
            elif op == "shift":
                a = b >> 16
                b = c >> 3
                c = d >> 7
                d = a >> 1
            elif op == "and":
                a = a & b
                b = b & c
                c = c & d
                d = d & a
            elif op == "mix":  # CIOS-ish blend: mul, and, shift, add
                a = a * b
                b = a & 0xFFFF
                c = c + b
                d = a >> 16
        o_ref[0] = a
        o_ref[1] = b
        o_ref[2] = c
        o_ref[3] = d

    return kernel


def bench(op, n_ops, grid=8192, iters=5):
    x = jnp.arange(4 * 8 * 1024, dtype=jnp.uint32).reshape(4, 8, 1024) | 1
    spec = pl.BlockSpec((4, 8, 1024), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    f = jax.jit(
        lambda x: pl.pallas_call(
            make_kernel(op, n_ops),
            grid=(grid,),
            in_specs=[spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((4, 8, 1024), jnp.uint32),
        )(x)
    )
    r = f(x)
    np.asarray(r.ravel()[0])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(f(x).ravel()[0])
        ts.append(time.perf_counter() - t0)
    return np.median(ts)


def main():
    print(f"backend={jax.default_backend()}")
    for op in ["mul", "add", "shift", "and", "mix"]:
        t1 = bench(op, 512)
        t2 = bench(op, 4096)
        # marginal: (t2 - t1) per 3584 ops x 8192 grid cells
        dt = t2 - t1
        cyc_per_op = dt / (3584 * 8192) * 0.94e9  # per (8,1024)-tile vector op
        print(f"{op:6s}: {t1*1e3:7.2f} / {t2*1e3:7.2f} ms  "
              f"-> {cyc_per_op:6.2f} cyc per 8x1024 vector op")


if __name__ == "__main__":
    main()
