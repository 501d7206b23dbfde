"""Stage-level timing of the production MSM pipeline on the current backend.

Times each phase of ops/pippenger.py separately (jitted in isolation) to show
where device time goes: to_niels, window split + sort, point gather, fused
accumulation scan, lane combine + histogram + bucket assembly, bucket
reduction. Matches the production path (signed digits, batching) so numbers
add up to the full pipeline.
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
from jax import lax

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
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        times.append(time.perf_counter() - t0)
    ms = np.median(times) * 1000
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

    # Per-batch stages (first batch only; whole pipeline scales ~linearly).
    pts_b = pts_niels[..., :M]
    sc_b = sc[..., :M]

    @jax.jit
    def split(scalar_words):
        buckets, sgn = windows.split_windows_signed(scalar_words, w)
        return buckets | (sgn << 31)

    digits, t_split = timeit(split, sc_b, name="window split (signed)")

    @jax.jit
    def sort(digits):
        keys = digits & jnp.uint32(0x7FFFFFFF)
        iota = jax.lax.broadcasted_iota(jnp.int32, digits.shape, 1)
        _, sorted_packed, perm = jax.lax.sort(
            (keys, digits, iota), dimension=1, num_keys=1
        )
        return sorted_packed, perm

    (sorted_packed, perm), t_sort = timeit(sort, digits, name="sort (3-operand)")

    @jax.jit
    def gather(points, perm):
        perm_lkc = jnp.transpose(perm.reshape(K, C, L), (2, 0, 1))
        pts_rows = points.reshape(48, M).T
        rows = jnp.take(pts_rows, perm_lkc.reshape(-1), axis=0)
        return jnp.transpose(rows.reshape(L, K, C, 3, 16), (3, 4, 0, 1, 2))

    sorted_pts, t_gather = timeit(gather, pts_b, perm, name="gather sorted points")

    ids_lkc = jnp.transpose(sorted_packed.reshape(K, C, L), (2, 0, 1))
    W = K * C

    if on_tpu and W % 1024 == 0:
        from webgpu_msm_tpu.ops.pallas import padd_kernels

        @jax.jit
        def scan(sorted_pts, ids_lkc):
            return padd_kernels.accumulate_scan(
                sorted_pts.reshape(3, 16, L, W), ids_lkc.reshape(L, W)
            )

        _, t_scan = timeit(scan, sorted_pts, ids_lkc, name=f"fused scan (L={L}, W={W})")
    else:
        t_scan = float("nan")

    @jax.jit
    def batch_all(points, digits):
        return pippenger._accumulate_batch(points, digits, w, C, L, B)

    buckets, t_batch = timeit(batch_all, pts_b, digits, name="one batch total")

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
    post = t_batch - t_split - t_sort - t_gather - t_scan
    print(f"  combine+hist+assemble (batch residual): {post:.2f} ms")
    print(f"sum: to_niels + buckets + reduce = "
          f"{t_niels + t_buckets + t_reduce:.2f} ms vs full {t_full:.2f} ms")
    print(f"throughput (full): {n / t_full * 1000 / 1e6:.3f} M points/s")


if __name__ == "__main__":
    main()
