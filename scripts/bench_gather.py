"""Cost model of the sorted-point gather: row width and sort-payload A/B.

Decides between: (a) gathering 48-u32 rows (current), (b) packed 24-u32 rows
(two 16-bit digits per u32), (c) packed 16-u32 rows (x,y only, t recomputed
in-kernel), (d) carrying packed payload through lax.sort instead of gathering.
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


def _sync(out):
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf.ravel()[0])


def timeit(fn, *args, iters=3, name=""):
    out = fn(*args)
    _sync(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:40s} {np.median(ts)*1000:9.2f} ms")
    return out


def main():
    M, K = 1 << 18, 22
    n_idx = M * K
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (n_idx,), 0, M, dtype=jnp.int32)
    print(f"M={M} K={K} ({n_idx/1e6:.1f}M row gathers) backend={jax.default_backend()}")

    for width in (48, 24, 16, 12, 8):
        rows = jnp.ones((M, width), dtype=jnp.uint32)
        f = jax.jit(lambda r, i: jnp.take(r, i, axis=0))
        timeit(f, rows, idx, name=f"jnp.take rows [M,{width}] u32")

    # transpose cost of the gathered block (to scan layout)
    L, C = 128, 2048
    for width in (48, 24):
        g = jnp.ones((n_idx, width), dtype=jnp.uint32)
        f = jax.jit(
            lambda r: jnp.transpose(
                r.reshape(L, K, C, width), (3, 0, 1, 2)
            ).reshape(width, 16 if width == 48 else 8, L, K * C)
            if False
            else jnp.transpose(r.reshape(L, K, C, width), (3, 0, 1, 2))
        )
        timeit(f, g, name=f"transpose gathered [{n_idx},{width}] -> [w,L,K,C]")

    # sort payload scaling
    digits = jax.random.randint(
        jax.random.PRNGKey(1), (K, M), 0, 1 << 13, dtype=jnp.int32
    ).astype(jnp.uint32)
    iota = jax.lax.broadcasted_iota(jnp.int32, digits.shape, 1)
    for n_payload in (2, 8, 16):
        ops = (digits,) + tuple(
            digits + jnp.uint32(i) for i in range(n_payload - 1)
        ) + (iota,)
        f = jax.jit(
            lambda *o: jax.lax.sort(o, dimension=1, num_keys=1)[1]
        )
        timeit(f, *ops, name=f"lax.sort {n_payload+1} operands [K,M]")


if __name__ == "__main__":
    main()
