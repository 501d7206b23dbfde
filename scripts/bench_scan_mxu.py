"""A/B at production shape: fused accumulation scan, VPU CIOS vs MXU REDC."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from webgpu_msm_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from webgpu_msm_tpu.ops.pallas import padd_kernels


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
    print(f"{name:28s} {np.median(ts)*1000:9.2f} ms")
    return out


def main():
    L, W = 128, 40960  # production shape at 2^20, w=13
    key = jax.random.PRNGKey(0)
    pts = jax.random.randint(
        key, (3, 8, L, W), 0, 1 << 31, dtype=jnp.int32
    ).astype(jnp.uint32)
    pts = pts.at[:, 7].set(pts[:, 7] & 0xFFFF)  # < 2^240 < p (packed digits)
    ids = jax.random.randint(
        jax.random.PRNGKey(1), (L, W), 0, 4096, dtype=jnp.int32
    ).astype(jnp.uint32)

    print(f"L={L} W={W} ({L*W/1e6:.2f}M adds/call) backend={jax.default_backend()}")
    results = {}
    for br in (8, 16, 32):
        f = jax.jit(
            lambda p, i, br=br: padd_kernels.accumulate_scan(p, i, block_rows=br)
        )
        results[br] = timeit(f, pts, ids, name=f"fused scan VPU block_rows={br}")
    mxu = jax.jit(lambda p, i: padd_kernels.accumulate_scan(p, i, use_mxu=True))
    r2 = timeit(mxu, pts, ids, name="fused scan MXU-REDC")
    print("agree:", bool(jnp.array_equal(results[16][0], r2[0])))


if __name__ == "__main__":
    main()
