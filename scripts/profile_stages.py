"""Stage-level timing of the production MSM pipeline on the current backend.

Isolated-stage timings overlap under XLA fusion — use scripts/profile_ablate.py
for trustworthy marginal attribution; this script gives the coarse picture
plus the full-pipeline number.
"""
import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from webgpu_msm_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from webgpu_msm_tpu.config import MSMConfig
from webgpu_msm_tpu.ops import curve_ops, pippenger, windows
from bench import build_inputs


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
    ms = np.median(ts) * 1000
    print(f"{name:36s} {ms:9.2f} ms")
    return out, ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-pow", type=int, default=20)
    ap.add_argument("--window", type=int, default=None)
    args = ap.parse_args()
    n = 1 << args.n_pow
    cfg = MSMConfig(window_size=args.window)
    w = cfg.resolved_window_size(n)
    C, L = cfg.resolved_chunking(n)
    K = windows.n_windows(w)
    B = pippenger.n_buckets(w, True)
    M = C * L
    n_batches = n // M
    print(
        f"n=2^{args.n_pow} w={w} K={K} B={B} C={C} L={L} "
        f"batches={n_batches} backend={jax.default_backend()}"
    )

    planes, words, _ = build_inputs(n)
    pts = jnp.asarray(planes)
    sc = jnp.asarray(words)

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        from webgpu_msm_tpu.ops.pallas import padd_kernels

        to_niels = jax.jit(padd_kernels.to_niels)
    else:
        to_niels = jax.jit(curve_ops.to_niels_planes)
    pts_niels, t_niels = timeit(to_niels, pts, name="to_niels")

    @jax.jit
    def full_buckets(points, scalar_words):
        return pippenger.accumulate_buckets(
            points, scalar_words, window_size=w, n_chunks=C, chunk_len=L,
            signed_digits=True,
        )

    buckets_all, t_buckets = timeit(
        full_buckets, pts_niels, sc, name=f"accumulate_buckets ({n_batches} batches)"
    )

    reduce_jit = jax.jit(pippenger.reduce_buckets)
    _, t_reduce = timeit(reduce_jit, buckets_all, name="reduce_buckets")

    full = functools.partial(
        pippenger.msm_window_sums, window_size=w, n_chunks=C, chunk_len=L,
        signed_digits=True,
    )
    _, t_full = timeit(full, pts_niels, sc, name="full pipeline")
    print(f"throughput (full): {n / t_full * 1000 / 1e6:.3f} M points/s")


if __name__ == "__main__":
    main()
