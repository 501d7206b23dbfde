"""Stage-level timing of the MSM pipeline on the current backend.

Times each phase of ops/pippenger.py separately (jitted in isolation) to show
where device time goes: sort, gather, scan accumulation, lane combine +
bucket assembly, bucket reduction.
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
from webgpu_msm_tpu.ops import curve_ops, field_ops, limbs, pippenger, windows
from webgpu_msm_tpu.ops.curve_ops import PointVec
from bench import build_inputs


def _sync(out):
    # block_until_ready can return early on the tunneled TPU; fetching one
    # element of every leaf is the reliable fence (tiny transfer).
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
    print(f"{name:28s} {ms:9.2f} ms")
    return out, ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-pow", type=int, default=16)
    ap.add_argument("--window", type=int, default=None)
    args = ap.parse_args()
    n = 1 << args.n_pow
    cfg = MSMConfig(window_size=args.window)
    w = cfg.resolved_window_size(n)
    C, L = cfg.resolved_chunking(n)
    K = windows.n_windows(w)
    B = 1 << w
    print(f"n=2^{args.n_pow} w={w} K={K} B={B} C={C} L={L} backend={jax.default_backend()}")

    planes, words, _ = build_inputs(n)
    pts = jnp.asarray(planes)
    sc = jnp.asarray(words)

    @jax.jit
    def to_mont(points_plain):
        return jnp.stack(
            [
                limbs.stack(field_ops.to_mont(limbs.unstack(points_plain[i])))
                for i in range(3)
            ]
        )

    pts_mont, t_mont = timeit(to_mont, pts, name="to_mont")

    @jax.jit
    def split_sort(scalar_words):
        digits = windows.split_windows(scalar_words, w)
        perm = jnp.argsort(digits, axis=1)
        sorted_digits = jnp.take_along_axis(digits, perm, axis=1)
        return perm, sorted_digits

    (perm, sorted_digits), t_sort = timeit(split_sort, sc, name="split+argsort")

    @jax.jit
    def gather(points, perm):
        perm_lkc = jnp.transpose(perm.reshape(K, C, L), (2, 0, 1))
        sorted_pts = jnp.take(points, perm_lkc.reshape(-1), axis=-1).reshape(
            3, 16, L, K, C
        )
        return jnp.transpose(sorted_pts, (2, 0, 1, 3, 4))

    xs_pts, t_gather = timeit(gather, pts_mont, perm, name="gather sorted points")

    ids_lkc = jnp.transpose(sorted_digits.reshape(K, C, L), (2, 0, 1))

    @jax.jit
    def scan_acc(xs_pts, ids_lkc):
        from webgpu_msm_tpu.oracle.field import R_MOD_P

        one_mont = limbs.digits_of_int(R_MOD_P, (K, C))
        id_pt = curve_ops.identity((K, C))

        def scan_body(carry, xs):
            acc_st, acc_id = carry
            pts_j, ids_j = xs
            acc = PointVec.from_stacked(acc_st)
            px = limbs.unstack(pts_j[0])
            py = limbs.unstack(pts_j[1])
            pt = limbs.unstack(pts_j[2])
            same = ids_j == acc_id
            added = curve_ops.add_mixed(acc, px, py, pt)
            fresh = PointVec(px, py, pt, one_mont)
            new_acc = curve_ops.select(same, added, fresh)
            return (new_acc.stacked(), ids_j), acc_st

        init = (id_pt.stacked(), jnp.full((K, C), pippenger.SENTINEL, dtype=jnp.uint32))
        (final_acc, final_id), staged = lax.scan(scan_body, init, (xs_pts, ids_lkc))
        return final_acc, final_id, staged

    (final_acc, final_id, staged), t_scan = timeit(
        scan_acc, xs_pts, ids_lkc, name=f"scan accumulate (L={L})"
    )

    @jax.jit
    def full_buckets(points, scalar_words):
        return pippenger.accumulate_buckets(
            points, scalar_words, window_size=w, n_chunks=C, chunk_len=L
        )

    buckets, t_buckets = timeit(
        full_buckets, pts_mont, sc, name="accumulate_buckets (all)"
    )

    reduce_jit = jax.jit(pippenger.reduce_buckets)
    _, t_reduce = timeit(reduce_jit, buckets, name=f"reduce_buckets (2x{max((B-1).bit_length(),1)} lvls)")

    full = functools.partial(
        pippenger.msm_window_sums, window_size=w, n_chunks=C, chunk_len=L
    )
    _, t_full = timeit(full, pts_mont, sc, name="full pipeline")
    print(
        f"sum of stages: {t_mont + t_sort + t_gather + t_buckets + t_reduce:.2f} ms"
    )


if __name__ == "__main__":
    main()
