#!/usr/bin/env python
"""Gather scaling: cost of take+transpose vs row width and row count.

Decides VERDICT item #1 follow-ups: if the fused gather+relayout is
row-count-bound (width-independent), shrinking rows saves nothing; if it is
bandwidth-bound, gathering 16-u32 Niels rows (recomputing 2d*t in-kernel)
cuts it by a third.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

M = 1 << 18
R = 22 * (1 << 18)  # rows gathered (K * M at w=12)


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(out.ravel()[0])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out.ravel()[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    rng = np.random.default_rng(0)
    perm_np = rng.integers(0, M, size=(R,), dtype=np.int64).astype(np.int32)
    perm = jax.device_put(jnp.asarray(perm_np))

    for width in (8, 16, 24, 32, 64, 128):
        rows = jax.device_put(
            jnp.asarray(
                rng.integers(0, 1 << 32, size=(M, width), dtype=np.uint64).astype(
                    np.uint32
                )
            )
        )

        @jax.jit
        def take_t(rows, perm, width=width):
            g = jnp.take(rows, perm, axis=0)  # [R, width]
            return jnp.transpose(g, (1, 0))  # plane-major [width, R]

        t = timeit(take_t, rows, perm)
        gb = R * width * 4 / 1e9
        print(
            f"width {width:4d}: {t*1e3:8.2f} ms  {t/R*1e9:6.2f} ns/row  "
            f"{2*gb/t:6.1f} GB/s (rd+wr)"
        )

    # row-count scaling at width 24
    rows = jax.device_put(
        jnp.asarray(
            rng.integers(0, 1 << 32, size=(M, 24), dtype=np.uint64).astype(np.uint32)
        )
    )
    for rr in (R // 4, R // 2, R):
        p = jax.device_put(jnp.asarray(perm_np[:rr]))

        @jax.jit
        def take_t2(rows, perm):
            g = jnp.take(rows, perm, axis=0)
            return jnp.transpose(g, (1, 0))

        t = timeit(take_t2, rows, p)
        print(f"rows {rr:9d}: {t*1e3:8.2f} ms  {t/rr*1e9:6.2f} ns/row")


if __name__ == "__main__":
    main()
