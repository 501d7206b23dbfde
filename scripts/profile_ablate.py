"""Ablation timing: full accumulate_buckets with one stage stubbed out.

Isolated-stage jits overlap heavily with each other under XLA fusion, so the
trustworthy attribution is differential: time the full batch, then the batch
with a stage replaced by a free approximation of the same shape; the delta is
that stage's true marginal cost.
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

from webgpu_msm_tpu.config import MSMConfig
from webgpu_msm_tpu.ops import curve_ops, limbs, pippenger, windows
from webgpu_msm_tpu.ops.pallas import padd_kernels
from webgpu_msm_tpu.oracle.field import R_MOD_P
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
    print(f"{name:34s} {ms:9.2f} ms")
    return ms


def batch_fn(w, C, L, B, *, skip_sort=False, skip_gather=False,
             skip_scan=False, skip_combine=False):
    K = windows.n_windows(w)

    def fn(points, digits):
        n = points.shape[-1]
        packed = points[:, 0::2] | (points[:, 1::2] << jnp.uint32(16))
        keys = digits & jnp.uint32(0x7FFFFFFF)
        iota = jax.lax.broadcasted_iota(jnp.int32, digits.shape, 1)
        if skip_sort:
            sorted_packed, perm = digits, iota
        else:
            _, sorted_packed, perm = jax.lax.sort(
                (keys, digits, iota), dimension=1, num_keys=1
            )
        sorted_digits = sorted_packed & jnp.uint32(0x7FFFFFFF)
        perm_lkc = jnp.transpose(perm.reshape(K, C, L), (2, 0, 1))
        ids_lkc = jnp.transpose(sorted_packed.reshape(K, C, L), (2, 0, 1))
        if skip_gather:
            sorted_pts_packed = jnp.broadcast_to(
                packed.reshape(3, 8, 1, 1, n)[..., :C], (3, 8, L, K, C)
            )
        else:
            pts_rows = packed.reshape(24, n).T
            rows = jnp.take(pts_rows, perm_lkc.reshape(-1), axis=0)
            sorted_pts_packed = jnp.transpose(
                rows.reshape(L, K, C, 3, 8), (3, 4, 0, 1, 2)
            )
        W_ = K * C
        if skip_scan:
            facc = jnp.zeros((4, 16, W_), jnp.uint32) | sorted_pts_packed[0, 0, 0, 0, 0]
            fid = ids_lkc.reshape(L, W_)[-1]
            staged = jnp.zeros((4, 16, L, W_), jnp.uint32)
        else:
            facc, fid, staged = padd_kernels.accumulate_scan(
                sorted_pts_packed.reshape(3, 8, L, W_), ids_lkc.reshape(L, W_)
            )
        final_acc_st = facc.reshape(4, 16, K, C)
        final_id = fid.reshape(K, C)
        staged_lkw = staged
        if skip_combine:
            return final_acc_st, staged_lkw[:, :, 0]
        # lane combine + histogram + assembly (tail of _accumulate_batch)
        lane_idx = jax.lax.broadcasted_iota(jnp.int32, (K, C), 1)

        def seg_level(i, carry_st):
            d = jnp.int32(1) << i
            shifted = pippenger._roll_pts(carry_st, d, axis=-1)
            shifted_id = jnp.roll(final_id, d, axis=-1)
            ok = (lane_idx >= d) & (shifted_id == final_id)
            return pippenger._vadd_masked(carry_st, shifted, ok)

        n_lev_c = max((C - 1).bit_length(), 1)
        carries_scanned = jax.lax.fori_loop(0, n_lev_c, seg_level, final_acc_st)

        HI = -(-B // 256)
        lo_oh = (
            (sorted_digits & 0xFF)[:, :, None]
            == jnp.arange(256, dtype=jnp.uint32)[None, None, :]
        ).astype(jnp.bfloat16)
        hi_oh = (
            (sorted_digits >> 8)[:, :, None]
            == jnp.arange(HI, dtype=jnp.uint32)[None, None, :]
        ).astype(jnp.bfloat16)
        cnt = jax.lax.dot_general(
            hi_oh, lo_oh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        hist = cnt.reshape(K, HI * 256)[:, :B].astype(jnp.int32)
        e_pos = jnp.cumsum(hist, axis=1)
        s_pos = e_pos - hist
        c0 = s_pos // L
        c_last = e_pos // L - 1
        carry_valid = c_last >= c0
        e_mod = e_pos % L
        staged_valid = (e_pos > s_pos) & (e_mod != 0)
        c1 = jnp.clip(e_pos // L, 0, C - 1)
        j_staged = jnp.clip(e_mod, 0, L - 1)
        c_last_c = jnp.clip(c_last, 0, C - 1)
        k_idx = jax.lax.broadcasted_iota(jnp.int32, (K, B), 0)
        staged_flat = staged_lkw.reshape(4, 16, L * K * C)
        staged_idx = (j_staged * (K * C) + k_idx * C + c1).reshape(-1)
        staged_pts = jnp.take(staged_flat, staged_idx, axis=-1).reshape(4, 16, K, B)
        carry_flat = carries_scanned.reshape(4, 16, K * C)
        carry_idx = (k_idx * C + c_last_c).reshape(-1)
        carry_pts = jnp.take(carry_flat, carry_idx, axis=-1).reshape(4, 16, K, B)
        id_kb = curve_ops.identity((K, B)).stacked()
        a_st = jnp.where(staged_valid[None, None], staged_pts, id_kb)
        b_st = jnp.where(carry_valid[None, None], carry_pts, id_kb)
        return pippenger._vadd(a_st, b_st)

    return jax.jit(fn)


def main():
    n_pow = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    n = 1 << n_pow
    cfg = MSMConfig()
    w = cfg.resolved_window_size(n)
    C, L = cfg.resolved_chunking(n)
    K = windows.n_windows(w)
    B = pippenger.n_buckets(w, True)
    M = C * L
    assert n == M, "ablation profiles a single batch"
    print(f"n=2^{n_pow} w={w} K={K} B={B} C={C} L={L} backend={jax.default_backend()}")

    planes, words, _ = build_inputs(n)
    pts = padd_kernels.to_niels(jnp.asarray(planes))
    buckets, sgn = windows.split_windows_signed(jnp.asarray(words), w)
    digits = buckets | (sgn << 31)

    t_full = timeit(batch_fn(w, C, L, B), pts, digits, name="full batch")
    for stage, kw in [
        ("sort", dict(skip_sort=True)),
        ("relayout", dict(skip_gather=True)),
        ("scan", dict(skip_scan=True)),
        ("combine+hist+assemble", dict(skip_combine=True)),
    ]:
        t = timeit(batch_fn(w, C, L, B, **kw), pts, digits, name=f"without {stage}")
        print(f"  -> marginal cost of {stage:24s} {t_full - t:8.2f} ms")


if __name__ == "__main__":
    main()
