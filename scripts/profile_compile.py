#!/usr/bin/env python
"""Where does cold-compile time go at production shape? (VERDICT item #7)

Times .lower()+.compile() for the full device MSM and for stage-isolated
jits at the production 2^20 shape (w=13 signed, 2^18-point batches,
C=2048, L=128). Run with a COLD cache:

    JAX_COMPILATION_CACHE_DIR= python scripts/profile_compile.py [--stages a,b]
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def t_compile(name, fn, *args, **kw):
    t0 = time.perf_counter()
    lowered = jax.jit(fn, **kw).lower(*args)
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    lowered.compile()
    t_comp = time.perf_counter() - t0
    print(f"{name:32s} lower {t_lower:7.1f}s   compile {t_comp:7.1f}s",
          flush=True)
    return t_comp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="all")
    ap.add_argument("--n-pow", type=int, default=20)
    args = ap.parse_args()
    stages = args.stages.split(",")

    def on(s):
        return "all" in stages or s in stages

    from webgpu_msm_tpu.ops import pippenger, windows
    from webgpu_msm_tpu.ops.pallas import padd_kernels

    W, C, L = 13, 2048, 128
    M = C * L  # one batch
    n = 1 << args.n_pow
    K = windows.n_windows(W)
    B = pippenger.n_buckets(W, True)
    rng = np.random.default_rng(0)

    pts = jnp.asarray(
        rng.integers(0, 1 << 16, size=(3, 16, n), dtype=np.uint64
                     ).astype(np.uint32))
    sc = jnp.asarray(
        rng.integers(0, 1 << 32, size=(8, n), dtype=np.uint64
                     ).astype(np.uint32))
    print(f"backend={jax.default_backend()} n=2^{args.n_pow} "
          f"W={W} C={C} L={L}", flush=True)

    pts1 = pts[:, :, :M]
    sc1 = sc[:, :M]
    if on("full"):
        # round-4 staged pipeline: ONE batch program (serves every n) + ONE
        # finish program; cold start = sum of these two compiles.
        from webgpu_msm_tpu.engines.tpu_engine import (
            _batch_planes_impl, _finish_impl, _identity_carry,
        )

        carry = _identity_carry(W, True)
        t_compile(
            "staged batch program",
            lambda p, s, c: _batch_planes_impl(
                p, s, c, window_size=W, n_chunks=C, chunk_len=L,
                signed_digits=True),
            pts1, sc1, carry)
        t_compile("staged finish program", _finish_impl, carry)
    if on("accrebatch"):
        t_compile(
            "accumulate_and_reduce (1 batch)",
            lambda p, s: pippenger.accumulate_and_reduce(
                p, s, window_size=W, n_chunks=C, chunk_len=L,
                signed_digits=True),
            pts1, sc1)
    if on("acc"):
        t_compile(
            "accumulate_buckets (1 batch)",
            lambda p, s: pippenger.accumulate_buckets(
                p, s, window_size=W, n_chunks=C, chunk_len=L,
                signed_digits=True),
            pts1, sc1)

    dig = jnp.asarray(
        rng.integers(0, 1 << 12, size=(K, M), dtype=np.uint64
                     ).astype(np.uint32))
    if on("sortgather"):
        def sort_gather(points, digits):
            keys = digits & jnp.uint32(0x7FFFFFFF)
            iota = jax.lax.broadcasted_iota(jnp.int32, digits.shape, 1)
            _, sp, perm = jax.lax.sort((keys, digits, iota), dimension=1,
                                       num_keys=1)
            perm_lkc = jnp.transpose(perm.reshape(K, C, L), (2, 0, 1))
            packed = points[:, 0::2] | (points[:, 1::2] << jnp.uint32(16))
            rows = jnp.take(packed.reshape(24, M).T,
                            perm_lkc.reshape(-1), axis=0)
            return jnp.transpose(rows.reshape(L, K, C, 3, 8),
                                 (3, 4, 0, 1, 2)), sp

        t_compile("sort + packed gather", sort_gather, pts1, dig)

    if on("scan"):
        xs = jnp.asarray(rng.integers(0, 1 << 32, size=(3, 8, L, K * C),
                                      dtype=np.uint64).astype(np.uint32))
        ids = jnp.asarray(rng.integers(0, 1 << 12, size=(L, K * C),
                                       dtype=np.uint64).astype(np.uint32))
        t_compile("pallas accumulate_scan", padd_kernels.accumulate_scan,
                  xs, ids)

    if on("reduce"):
        bsums = jnp.asarray(rng.integers(0, 1 << 16, size=(4, 16, K, B),
                                         dtype=np.uint64).astype(np.uint32))
        t_compile("reduce_buckets", pippenger.reduce_buckets, bsums)

    if on("grs"):
        s_flat = jnp.asarray(rng.integers(
            0, 1 << 16, size=(32, 4, 16, -(-(K * (B // 32)) // 1024) * 1024),
            dtype=np.uint64).astype(np.uint32))
        t_compile("pallas grouped_running_sum",
                  padd_kernels.grouped_running_sum, s_flat)

    if on("toniels"):
        t_compile("pallas to_niels", padd_kernels.to_niels, pts1)

    if on("hist"):
        def hist(sorted_digits):
            HI = -(-B // 256)
            lo_oh = ((sorted_digits & 0xFF)[:, :, None]
                     == jnp.arange(256, dtype=jnp.uint32)[None, None, :]
                     ).astype(jnp.bfloat16)
            hi_oh = ((sorted_digits >> 8)[:, :, None]
                     == jnp.arange(HI, dtype=jnp.uint32)[None, None, :]
                     ).astype(jnp.bfloat16)
            cnt = jax.lax.dot_general(
                hi_oh, lo_oh, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            return cnt.reshape(K, HI * 256)[:, :B].astype(jnp.int32)

        t_compile("MXU histogram", hist, dig)


if __name__ == "__main__":
    main()
