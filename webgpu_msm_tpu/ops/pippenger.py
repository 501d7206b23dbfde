"""Single-chip Pippenger MSM pipeline (jnp/lax over digit planes).

TPU-native re-design of the reference's intra/inter-bucket reduction
(`src/submission/gpu.ts:36-284`, `entry_padd_idx.wgsl`, `msm-wasm/lib.rs`):
instead of host-scheduled index triples driving one PADD kernel per log-round
(gpu.ts:181-243 — a host-in-the-loop pattern TPUs would hate), bucket
accumulation is a *sorted segmented reduction* with fully static shapes:

1. **Window split** (windows.py) -> digit matrix [K, n].
2. **Sort per window**: argsort each window's digits so each bucket's points
   are contiguous (the device-friendly equivalent of idxByBucket grouping,
   gpu.ts:173-179).
3. **Chunked serial scan**: the sorted stream is reshaped to [C lanes, L
   steps]; one `lax.scan` of L steps runs C*K lanes of a running
   accumulator in parallel (each step = one batched mixed PADD). When a
   lane's bucket id changes, the finished run's partial sum is *flushed* to
   a staging slot at a position derivable from bucket boundaries alone.
4. **Cross-lane combine**: runs spanning lane boundaries leave their partials
   in the per-lane final carries, whose ids are non-decreasing across lanes;
   a log-depth segmented Hillis-Steele scan (fori_loop over levels) sums
   them. Every bucket's total is then two gathers + one PADD — no scatter,
   no host round-trips, no data-dependent shapes.
5. **Bucket reduction**: sum_b b*S_b via the suffix-sum identity
   (entry_inter_bucket.wgsl:3-12 derived the same log-depth idea): one
   log-depth suffix scan + one log-depth total sum, both fori_loops.
6. **Window combine** on host (w doublings + add per window — ~260 tiny
   sequential group ops, host bigint math; reduce_last, lib.rs:88-104).

Everything through step 5 is one jit-compiled function per (n, w, C, L)
shape; graph size is kept small by routing all repeated structure through
lax.scan / lax.fori_loop.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..oracle.field import R_MOD_P
from . import curve_ops, field_ops, limbs, windows
from .curve_ops import PointVec

# numpy (not jnp): a module-level jnp constant would initialize the XLA
# backend at import time, which breaks jax.distributed.initialize() in
# multi-host processes (it must run before any backend touch).
SENTINEL = np.uint32(0xFFFFFFFF)


class AffVec(NamedTuple):
    """Batch of input points in extended affine form (z == 1 implicit)."""

    x: list
    y: list
    t: list

    def stacked(self) -> jnp.ndarray:
        return jnp.stack([limbs.stack(self.x), limbs.stack(self.y), limbs.stack(self.t)])

    @staticmethod
    def from_stacked(arr) -> "AffVec":
        return AffVec(limbs.unstack(arr[0]), limbs.unstack(arr[1]), limbs.unstack(arr[2]))


def _take_planes(planes: list, idx: jnp.ndarray) -> list:
    """Gather along the last (point) axis of every digit plane."""
    return [jnp.take(p, idx, axis=0) for p in planes]


def _roll_pts(stacked: jnp.ndarray, shift: jnp.ndarray, axis: int) -> jnp.ndarray:
    return jnp.roll(stacked, shift, axis=axis)


def _use_pallas(batch_elems: int) -> bool:
    # Wide enough to amortize a kernel launch; narrow arrays are padded to
    # the 1024-lane tile inside _vadd/_vadd_masked.
    return jax.default_backend() == "tpu" and batch_elems >= 1024


def _pad_lanes(flat: jnp.ndarray, n: int, n_pad: int) -> jnp.ndarray:
    if n_pad == n:
        return flat
    cfg = [(0, 0)] * (flat.ndim - 1) + [(0, n_pad - n)]
    return jnp.pad(flat, cfg)


def _vadd(a_st: jnp.ndarray, b_st: jnp.ndarray) -> jnp.ndarray:
    """Unified add over stacked [4, 16, *batch] points; Pallas on TPU."""
    batch = a_st.shape[2:]
    n = 1
    for d in batch:
        n *= d
    if _use_pallas(n):
        from .pallas import padd_kernels

        n_pad = -(-n // 1024) * 1024
        out = padd_kernels.padd(
            _pad_lanes(a_st.reshape(4, 16, n), n, n_pad),
            _pad_lanes(b_st.reshape(4, 16, n), n, n_pad),
        )
        return out[..., :n].reshape(a_st.shape)
    return curve_ops.add(
        PointVec.from_stacked(a_st), PointVec.from_stacked(b_st)
    ).stacked()


def _vadd_masked(a_st: jnp.ndarray, b_st: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """mask ? a+b : a over stacked [4, 16, *batch] points; Pallas on TPU."""
    batch = a_st.shape[2:]
    n = 1
    for d in batch:
        n *= d
    if _use_pallas(n):
        from .pallas import padd_kernels

        n_pad = -(-n // 1024) * 1024
        out = padd_kernels.padd_masked(
            _pad_lanes(a_st.reshape(4, 16, n), n, n_pad),
            _pad_lanes(b_st.reshape(4, 16, n), n, n_pad),
            _pad_lanes(mask.astype(jnp.uint32).reshape(n), n, n_pad),
        )
        return out[..., :n].reshape(a_st.shape)
    summed = curve_ops.add(
        PointVec.from_stacked(a_st), PointVec.from_stacked(b_st)
    )
    return curve_ops.select(mask, summed, PointVec.from_stacked(a_st)).stacked()


def accumulate_buckets(
    points: jnp.ndarray,  # [3, 16, n] uint32 Montgomery NIELS planes (y-x, y+x, 2d*t)
    scalar_words: jnp.ndarray,  # [8, n] uint32 LE words
    *,
    window_size: int,
    n_chunks: int,
    chunk_len: int,
    signed_digits: bool = False,
) -> jnp.ndarray:
    """Steps 1-4 of the pipeline -> bucket sums [4, 16, K, B] (Montgomery).

    n must be a multiple of n_chunks * chunk_len (callers pad with identity
    points and zero scalars). When n exceeds one batch (C*L), the point
    stream is processed in batches under a lax.scan, adding per-batch bucket
    arrays — the reference's VRAM-bounded batching (gpu.ts:78-85,162) — so
    peak HBM use is O(batch), not O(n). Exposed separately so the multi-chip
    layer can all-reduce raw bucket arrays (the reference's
    `inter_bucket_reduce` input, SURVEY.md §5.8) before the reduction.
    """
    w = window_size
    K = windows.n_windows(w)
    B = n_buckets(w, signed_digits)
    C, L = n_chunks, chunk_len
    n = points.shape[-1]
    M = C * L
    assert n % M == 0, (n, C, L)
    n_batches = n // M

    digits = compute_digits(scalar_words, w, signed_digits)  # [K, n]
    if n_batches == 1:
        return _accumulate_batch(points, digits, w, C, L, B)

    pts_b = jnp.transpose(points.reshape(3, 16, n_batches, M), (2, 0, 1, 3))
    dig_b = jnp.transpose(digits.reshape(K, n_batches, M), (1, 0, 2))

    def body(carry_st, xs):
        pts_i, dig_i = xs
        bsums = _accumulate_batch(pts_i, dig_i, w, C, L, B)
        return _vadd(carry_st, bsums), None

    init = curve_ops.identity((K, B)).stacked()
    total, _ = lax.scan(body, init, (pts_b, dig_b))
    return total


def compute_digits(
    scalar_words: jnp.ndarray, window_size: int, signed_digits: bool
) -> jnp.ndarray:
    """[8, n] LE scalar words -> [K, n] bucket ids (sign flag in bit 31).

    Signed recoding packs |digit| buckets with the sign in bit 31 so the
    run-segmentation and histogram logic see bucket ids only.
    """
    if signed_digits:
        buckets, sgn = windows.split_windows_signed(scalar_words, window_size)
        return buckets | (sgn << 31)
    return windows.split_windows(scalar_words, window_size)


def identity_buckets(window_size: int, signed_digits: bool) -> jnp.ndarray:
    """Stacked identity bucket array [4, 16, K, B] (the batch-loop carry)."""
    K = windows.n_windows(window_size)
    B = n_buckets(window_size, signed_digits)
    return curve_ops.identity((K, B)).stacked()


def n_buckets(window_size: int, signed_digits: bool) -> int:
    """Bucket-array width: 2^w unsigned; |digit| <= 2^(w-1) signed, padded
    to a multiple of 32 for the grouped reduction."""
    if not signed_digits:
        return 1 << window_size
    b = (1 << (window_size - 1)) + 1
    return -(-b // 32) * 32


def accumulate_batch(
    points_niels: jnp.ndarray,  # [3, 16, M] Montgomery Niels planes
    scalar_words: jnp.ndarray,  # [8, M] uint32 LE words
    *,
    window_size: int,
    n_chunks: int,
    chunk_len: int,
    signed_digits: bool = False,
) -> jnp.ndarray:
    """ONE batch -> bucket sums [4, 16, K, B] (Montgomery).

    The single-stage building block of the staged pipeline: engines loop
    over batches on the host (async dispatch), adding each batch's bucket
    array into a device-resident carry, so one compiled program serves every
    input size sharing (w, C, L) — the round-4 compile-diet restructuring.
    """
    digits = compute_digits(scalar_words, window_size, signed_digits)
    return _accumulate_batch(
        points_niels, digits, window_size, n_chunks, chunk_len,
        n_buckets(window_size, signed_digits),
    )


def _accumulate_batch(
    points: jnp.ndarray,  # [3, 16, M]
    digits: jnp.ndarray,  # [K, M]; bucket id, sign flag in bit 31
    w: int,
    C: int,
    L: int,
    B: int,
) -> jnp.ndarray:
    K = windows.n_windows(w)
    n = points.shape[-1]
    assert n == C * L, (n, C, L)

    # ---- sort each window's digits; gather points into sorted order ----
    # Sort key = bucket id only (bit 31 is the sign flag and must not split
    # a bucket's run). One multi-operand sort carries the packed value and
    # the permutation. (Carrying the full point payload through the sort —
    # which would delete the gather — is blocked by an XLA:TPU compile
    # pathology: a variadic sort with ~26 live operands compiles for >45
    # min at these shapes, with or without optimization_barrier isolation.)
    keys = digits & jnp.uint32(0x7FFFFFFF)
    iota = jax.lax.broadcasted_iota(jnp.int32, digits.shape, 1)
    _, sorted_packed, perm = jax.lax.sort(
        (keys, digits, iota), dimension=1, num_keys=1
    )
    sorted_digits = sorted_packed & jnp.uint32(0x7FFFFFFF)

    # xs layout: step-major [L, K, C]; lane (k, c) scans positions c*L + j.
    perm_lkc = jnp.transpose(perm.reshape(K, C, L), (2, 0, 1))  # [L, K, C]
    ids_lkc = jnp.transpose(sorted_packed.reshape(K, C, L), (2, 0, 1))

    # Gather sorted points in PACKED point-major rows (24 u32 = two 16-bit
    # digits per u32): gather cost is ~19 ns per row *independent of width*
    # (measured 48 vs 8 u32 rows), so packing halves the relayout transpose
    # and the scan kernel's HBM->VMEM stream for free; the kernel unpacks.
    packed = points[:, 0::2] | (points[:, 1::2] << jnp.uint32(16))  # [3, 8, n]
    pts_rows = packed.reshape(24, n).T  # [n, 24]
    rows = jnp.take(pts_rows, perm_lkc.reshape(-1), axis=0)  # [L*K*C, 24]
    sorted_pts_packed = jnp.transpose(
        rows.reshape(L, K, C, 3, 8), (3, 4, 0, 1, 2)
    )  # [3, 8, L, K, C]

    zero = jnp.zeros((K, C), dtype=jnp.uint32)
    one_mont = limbs.digits_of_int(R_MOD_P, (K, C))
    id_pt = curve_ops.identity((K, C))

    W = K * C
    if jax.default_backend() == "tpu" and W % 1024 == 0:
        # Fused Pallas scan: the accumulator lives in VMEM scratch across
        # all L steps; points stream HBM->VMEM via the grid pipeline.
        from .pallas import padd_kernels

        facc, fid, staged = padd_kernels.accumulate_scan(
            sorted_pts_packed.reshape(3, 8, L, W), ids_lkc.reshape(L, W)
        )
        final_acc_st = facc.reshape(4, 16, K, C)
        final_id = fid.reshape(K, C)
        staged_lkw = staged  # [4, 16, L, K*C] — bucket-combine layout
    else:
        lo = sorted_pts_packed & jnp.uint32(0xFFFF)
        hi = sorted_pts_packed >> jnp.uint32(16)
        sorted_pts = jnp.stack([lo, hi], axis=2).reshape(3, 16, L, K, C)
        xs_pts = jnp.transpose(sorted_pts, (2, 0, 1, 3, 4))  # [L, 3, 16, K, C]

        def scan_body(carry, xs):
            acc_st, acc_id = carry  # [4, 16, K, C], [K, C]
            pts_j, raw_j = xs  # [3, 16, K, C] Niels planes, [K, C]
            ids_j = raw_j & jnp.uint32(0x7FFFFFFF)
            neg = (raw_j >> 31) == 1
            acc = PointVec.from_stacked(acc_st)
            ym0 = limbs.unstack(pts_j[0])
            yp0 = limbs.unstack(pts_j[1])
            td0 = limbs.unstack(pts_j[2])
            # Negation in Niels form: swap (y-x) <-> (y+x), negate 2d*t.
            ym = limbs.select(neg, yp0, ym0)
            yp = limbs.select(neg, ym0, yp0)
            td = limbs.select(neg, field_ops.field_neg(td0), td0)
            same = ids_j == acc_id
            # Run boundary: reset acc to identity, then always add.
            acc_or_id = curve_ops.select(same, acc, id_pt)
            new_acc = curve_ops.add_niels(acc_or_id, ym, yp, td)
            # Emit the pre-update acc: where a new run starts at step j, this
            # is the completed run ending at position j-1 (the "flush").
            new_carry = (new_acc.stacked(), ids_j)
            return new_carry, acc_st

        init = (id_pt.stacked(), jnp.full((K, C), SENTINEL, dtype=jnp.uint32))
        (final_acc_st, final_id), staged_st = lax.scan(
            scan_body, init, (xs_pts, ids_lkc)
        )
        staged_lkw = jnp.transpose(staged_st, (1, 2, 0, 3, 4)).reshape(
            4, 16, L, K * C
        )
    # staged_lkw: [4, 16, L, K*C] (bucket-combine gather layout);
    # final carries: [4, 16, K, C] with ids final_id == last id per lane.

    # ---- segmented inclusive scan over lanes (combine cross-lane runs) ----
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, (K, C), 1)

    def seg_level(i, carry_st):
        d = jnp.int32(1) << i
        shifted = _roll_pts(carry_st, d, axis=-1)
        shifted_id = jnp.roll(final_id, d, axis=-1)
        ok = (lane_idx >= d) & (shifted_id == final_id)
        return _vadd_masked(carry_st, shifted, ok)

    n_lev_c = max((C - 1).bit_length(), 1)
    carries_scanned = lax.fori_loop(0, n_lev_c, seg_level, final_acc_st)
    # [4, 16, K, C]; at the last lane of each equal-id segment: segment total.

    # ---- per-bucket combine via analytic positions ----
    # Bucket histogram on the MXU: split the bucket id into (hi, lo) bytes
    # and contract two one-hot matrices — counts are exact in f32 (0/1
    # products, sums <= n < 2^24). Beats both per-element scatter-add
    # (~180 ms at 2^20) and per-bucket binary search.
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
        hi_oh,
        lo_oh,
        (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [K, HI, 256]
    hist = cnt.reshape(K, HI * 256)[:, :B].astype(jnp.int32)
    e_pos = jnp.cumsum(hist, axis=1)  # [K, B]: first index past bucket b
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

    # Flat gathers along a single trailing axis (explicit and layout-friendly).
    staged_flat = staged_lkw.reshape(4, 16, L * K * C)
    staged_idx = (j_staged * (K * C) + k_idx * C + c1).reshape(-1)
    staged_pts = jnp.take(staged_flat, staged_idx, axis=-1).reshape(4, 16, K, B)
    carry_flat = carries_scanned.reshape(4, 16, K * C)
    carry_idx = (k_idx * C + c_last_c).reshape(-1)
    carry_pts = jnp.take(carry_flat, carry_idx, axis=-1).reshape(4, 16, K, B)

    id_kb = curve_ops.identity((K, B)).stacked()
    a_st = jnp.where(staged_valid[None, None], staged_pts, id_kb)
    b_st = jnp.where(carry_valid[None, None], carry_pts, id_kb)
    return _vadd(a_st, b_st)  # [4, 16, K, B]


def _suffix_weighted(bucket_sums: jnp.ndarray) -> jnp.ndarray:
    """W_k = sum_b b * S_b over the trailing axis via log-depth suffix scans.

    Work 2*log2(B)*K*B point adds — used only for the small sub-reduction in
    `reduce_buckets` (the identity from entry_inter_bucket.wgsl:3-12)."""
    K, B = bucket_sums.shape[-2], bucket_sums.shape[-1]
    id_kb = curve_ops.identity((K, B)).stacked()
    bucket_idx = jax.lax.broadcasted_iota(jnp.int32, (K, B), 1)

    def suffix_level(i, st):
        d = jnp.int32(1) << i
        shifted = _roll_pts(st, -d, axis=-1)
        ok = bucket_idx + d < B
        return _vadd_masked(st, shifted, ok)

    n_lev_b = max((B - 1).bit_length(), 1)
    suffixes = lax.fori_loop(0, n_lev_b, suffix_level, bucket_sums)
    # suffixes[..., b] = sum_{b' >= b} S_b'. Zero out lane 0 (S_0 weight 0).
    suffixes = jnp.where((bucket_idx == 0)[None, None], id_kb, suffixes)

    def total_level(i, st):
        d = jnp.int32(1) << i
        shifted = _roll_pts(st, d, axis=-1)
        ok = bucket_idx >= d
        return _vadd_masked(st, shifted, ok)

    totals = lax.fori_loop(0, n_lev_b, total_level, suffixes)
    window_sums = totals[..., B - 1]  # [4, 16, K]
    return window_sums


def _tree_sum_axis(st: jnp.ndarray) -> jnp.ndarray:
    """Plain group sum over the trailing axis (log-depth).

    [4, 16, K, G] -> [4, 16, K]; G must be a power of two. Uses a roll-based
    fori_loop so the point-add graph is compiled ONCE regardless of G (the
    halving formulation would emit log2(G) distinct-shape add graphs —
    compile-time poison under SPMD partitioning)."""
    G = st.shape[-1]
    if G == 1:
        return st[..., 0]
    lane = jax.lax.broadcasted_iota(jnp.int32, st.shape[-2:], 1)

    def level(i, cur):
        d = jnp.int32(1) << i
        shifted = _roll_pts(cur, -d, axis=-1)
        ok = lane + d < G
        return _vadd_masked(cur, shifted, ok)

    out = lax.fori_loop(0, (G - 1).bit_length(), level, st)
    return out[..., 0]


def reduce_buckets(bucket_sums: jnp.ndarray, group_size: int = 0) -> jnp.ndarray:
    """Step 5: bucket reduction W_k = sum_b b * S_b -> window sums [4, 16, K].

    Work-optimal grouped running sum. Split b = g*Gs + r (G groups of Gs):

        W = Gs * sum_g g*T_g  +  sum_g U_g
        T_g = sum_r S[g, r]          (group totals)
        U_g = sum_r r * S[g, r]      (within-group running sums)

    The U/T pass is the reference's serial running sum (bucket_sum_cpu,
    msm-wasm/lib.rs:46-56) run over all K*G group lanes at once: Gs-1
    sequential steps of two vectorized adds, total work ~2*B*K point adds —
    a w-fold reduction vs the pure log-depth suffix scan, which survives
    only for the tiny G-wide sub-reduction (`_suffix_weighted`). The final
    scale by Gs is log2(Gs) vectorized doublings.
    """
    K, B = bucket_sums.shape[-2], bucket_sums.shape[-1]
    if group_size <= 0:
        if jax.default_backend() == "tpu":
            # Balance the Gs-step sequential chain against per-step lane
            # count K*G; Gs = 32 keeps depth short while G = B/32 lanes
            # fill the VPU.
            group_size = 32 if B >= 1024 else (16 if B >= 64 else 1)
        else:
            # Non-TPU backends (tests, the multichip dryrun) default to the
            # pure suffix scan: its module has ~3x fewer point-add graph
            # instantiations, which is what XLA:CPU compile time scales
            # with (round-4 compile diet; the grouped fallback stays
            # reachable via explicit group_size and is equivalence-tested
            # in tests/test_pallas_kernels.py).
            group_size = 1
    if group_size > 1:
        assert B % group_size == 0, (B, group_size)
        G = B // group_size
    Gs = group_size
    if Gs == 1:
        return _suffix_weighted(bucket_sums)

    s = bucket_sums.reshape(4, 16, K, G, Gs)
    if _use_pallas(K * G):
        # Fused Pallas grouped scan: one kernel launch for all Gs steps
        # (vs 2 launches + a strided HBM slice per step in the fallback).
        from .pallas import padd_kernels

        W2 = -(-(K * G) // 1024) * 1024
        s_flat = jnp.transpose(s.reshape(4, 16, K * G, Gs), (3, 0, 1, 2))
        if W2 != K * G:
            pad = jnp.broadcast_to(
                curve_ops.identity(()).stacked()[None, :, :, None],
                (Gs, 4, 16, W2 - K * G),
            )
            s_flat = jnp.concatenate([s_flat, pad], axis=-1)
        T_flat, U_flat = padd_kernels.grouped_running_sum(s_flat)
        T = T_flat[..., : K * G].reshape(4, 16, K, G)
        U = U_flat[..., : K * G].reshape(4, 16, K, G)

        # Second grouped pass over the G axis finishes the reduction in ONE
        # more kernel launch (vs ~30 launches of log-depth suffix + tree
        # scans): lanes 0..K-1 carry T (U-output = sum_g g*T_g = V), lanes
        # K..2K-1 carry U (T-output = sum_g U_g = U_tot).
        tu = jnp.transpose(
            jnp.concatenate([T, U], axis=2), (3, 0, 1, 2)
        )  # [G, 4, 16, 2K]
        pad2 = jnp.broadcast_to(
            curve_ops.identity(()).stacked()[None, :, :, None],
            (G, 4, 16, 1024 - 2 * K),
        )
        s2 = jnp.concatenate([tu, pad2], axis=-1)
        T2, U2 = padd_kernels.grouped_running_sum(s2)
        V = U2[..., :K]  # [4, 16, K] = sum_g g * T_g
        U_tot = T2[..., K : 2 * K]  # [4, 16, K] = sum_g U_g
        V = lax.fori_loop(
            0,
            Gs.bit_length() - 1,
            lambda i, st: curve_ops.double(PointVec.from_stacked(st)).stacked(),
            V,
        )
        return curve_ops.add(
            PointVec.from_stacked(V), PointVec.from_stacked(U_tot)
        ).stacked()
    else:
        id_kg = curve_ops.identity((K, G)).stacked()

        def body(i, carry):
            running_st, u_st = carry
            r = Gs - 1 - i  # r runs Gs-1 .. 1
            s_r = lax.dynamic_index_in_dim(s, r, axis=4, keepdims=False)
            run = _vadd(running_st, s_r)
            u = _vadd(u_st, run)
            return run, u

        running, U = lax.fori_loop(0, Gs - 1, body, (id_kg, id_kg))
        T = _vadd(running, s[..., 0])  # [4, 16, K, G]

    V = _suffix_weighted(T)  # sum_g g * T_g, [4, 16, K]
    V = lax.fori_loop(  # * Gs (power of two): one double graph, log2 Gs iters
        0,
        Gs.bit_length() - 1,
        lambda i, st: curve_ops.double(PointVec.from_stacked(st)).stacked(),
        V,
    )
    U_tot = _tree_sum_axis(U)
    return curve_ops.add(
        PointVec.from_stacked(V), PointVec.from_stacked(U_tot)
    ).stacked()


def accumulate_and_reduce(
    points: jnp.ndarray,
    scalar_words: jnp.ndarray,
    *,
    window_size: int,
    n_chunks: int,
    chunk_len: int,
    signed_digits: bool = False,
) -> jnp.ndarray:
    """Full on-device pipeline -> window sums [4, 16, K] (Montgomery)."""
    bucket_sums = accumulate_buckets(
        points,
        scalar_words,
        window_size=window_size,
        n_chunks=n_chunks,
        chunk_len=chunk_len,
        signed_digits=signed_digits,
    )
    return reduce_buckets(bucket_sums)


@functools.partial(
    jax.jit,
    static_argnames=("window_size", "n_chunks", "chunk_len", "signed_digits"),
)
def msm_window_sums(points, scalar_words, *, window_size, n_chunks, chunk_len,
                    signed_digits=False):
    return accumulate_and_reduce(
        points,
        scalar_words,
        window_size=window_size,
        n_chunks=n_chunks,
        chunk_len=chunk_len,
        signed_digits=signed_digits,
    )
