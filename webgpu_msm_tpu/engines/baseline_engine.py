"""Demox-Labs-baseline analog: the reference's `webgpu_pippenger_msm` row.

Structural port of the baseline the submission had to beat by >=10%
(`src/reference/webgpu/entries/pippengerMSMEntry.ts:54-202`,
`src/reference/reference.ts:9-17`): a fixed c=16 window split, HOST-side
bucketing (the baseline does its bucket point-adds in JS bigint math,
:75-95 — deliberately not device-accelerated), the device doing only the
bucket-value x bucket-index scalar multiplications (`mul_point_32_bit_scalar`,
Curve.ts:161 — here a 16-bit vectorized ladder), and host-side per-window
sums + window combine (:143-162).

This row exists for comparison honesty, like the reference harness's
`webgpu_best_msm` row (AllBenchmarks.tsx): it IS the >=10%-bar comparator,
so its algorithmic shape is kept faithful rather than optimized.
"""
from __future__ import annotations

import functools
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..config import MSMConfig
from ..oracle import curve as ocurve
from ..oracle.curve import ExtPoint
from ..ops import curve_ops, field_ops, limbs
from ..ops.curve_ops import PointVec
from . import tpu_engine

C_BITS = 16  # fixed window size, pippengerMSMEntry.ts:59
N_WINDOWS = 256 // C_BITS


@jax.jit
def _device_mul_16bit(points_plain: jnp.ndarray, small_scalars: jnp.ndarray):
    """[3, 16, m] plain affine + [m] u32 (< 2^16) -> [4, 16, m] products.

    The analog of the baseline's per-bucket `mul_point_32_bit_scalar` GPU
    ladder (Curve.ts:161), vectorized over all bucket entries at once.
    """
    x = field_ops.to_mont(limbs.unstack(points_plain[0]))
    y = field_ops.to_mont(limbs.unstack(points_plain[1]))
    t = field_ops.to_mont(limbs.unstack(points_plain[2]))
    m = points_plain.shape[-1]
    acc_st = curve_ops.identity((m,)).stacked()

    def step(j, st):
        acc = curve_ops.double(PointVec.from_stacked(st))
        added = curve_ops.add_mixed(acc, x, y, t)
        bit = (small_scalars >> (jnp.uint32(C_BITS - 1) - j.astype(jnp.uint32))) & jnp.uint32(1)
        return curve_ops.select(bit == 1, added, acc).stacked()

    acc_st = lax.fori_loop(0, C_BITS, step, acc_st)
    return jnp.stack(
        [
            limbs.stack(field_ops.from_mont(limbs.unstack(acc_st[i])))
            for i in range(4)
        ]
    )


def _host_bucket_entries(
    points: Sequence[ExtPoint], scalars: Sequence[int]
) -> list[tuple[int, int, ExtPoint]]:
    """HOST bucketing: the contents of the baseline's per-window
    Map<bucket, point> (pippengerMSMEntry.ts:67-95 — the known CPU
    bottleneck of the baseline; the group adds stay host-side bigint math
    on purpose). The *grouping* is a numpy digit split + stable argsort so
    the row is runnable at 2^20 (round-4 verdict #4: the per-point Python
    dict loop capped it at toy sizes); the point ADDS — the actual work the
    baseline pays on the CPU — are unchanged host `ocurve.add` chains, one
    per colliding point, exactly as many as the Map version performed.
    """
    from ..utils import convert

    words = convert.bigints_to_words_le(
        [int(s) % (1 << 256) for s in scalars]
    )  # [8, n] u32 LE
    entries: list[tuple[int, int, ExtPoint]] = []
    for w in range(N_WINDOWS):
        # C_BITS = 16: two digits per u32 word
        digits = (words[w // 2] >> np.uint32(16 * (w % 2))) & np.uint32(0xFFFF)
        order = np.argsort(digits, kind="stable")
        ds = digits[order]
        starts = np.flatnonzero(np.r_[True, ds[1:] != ds[:-1]])
        ends = np.r_[starts[1:], len(ds)]
        for s0, e0 in zip(starts.tolist(), ends.tolist()):
            d = int(ds[s0])
            if d == 0:
                continue
            acc = points[order[s0]]
            for i in range(s0 + 1, e0):
                acc = ocurve.add(acc, points[order[i]])
            entries.append((w, d, acc))
    return entries


# Device-chunk width for the 16-bit ladder: fixed so ONE compiled program
# serves every input size (bucket entries stream through in chunks).
_LADDER_CHUNK = 1 << 17


def msm_affine(
    points: Sequence[ExtPoint], scalars: Sequence[int], config: MSMConfig
) -> tuple[int, int]:
    # 1. HOST bucketing (numpy grouping, host bigint group adds).
    entries = _host_bucket_entries(points, scalars)
    if not entries:
        return (0, 1)

    # 2. DEVICE: bucket-value x bucket-index scalar products, a vectorized
    #    16-bit ladder over every bucket entry of every window, streamed in
    #    fixed-width chunks (all chunks dispatch async before any fetch).
    m = len(entries)
    chunk = min(_LADDER_CHUNK, max(-(-m // 128) * 128, 128))
    pad_to = -(-m // chunk) * chunk
    pts = tpu_engine.marshal_points([e[2] for e in entries], pad_to)
    idx = np.zeros(pad_to, dtype=np.uint32)
    idx[:m] = [e[1] for e in entries]
    outs = [
        _device_mul_16bit(
            jnp.asarray(pts[:, :, c : c + chunk]),
            jnp.asarray(idx[c : c + chunk]),
        )
        for c in range(0, pad_to, chunk)
    ]
    products = [
        p
        for out in outs
        for p in tpu_engine.window_sums_to_points(np.asarray(out))
    ][:m]

    # 3. HOST: per-window sums (:143-153), then the window combine with
    #    2^16 scaling between windows (:158-162).
    window_sums = [ocurve.IDENTITY] * N_WINDOWS
    for (w, _d, _p), prod in zip(entries, products):
        window_sums[w] = ocurve.add(window_sums[w], prod)
    acc = ocurve.IDENTITY
    for w in reversed(range(N_WINDOWS)):
        acc = ocurve.scalar_mul(acc, 1 << C_BITS)
        acc = ocurve.add(acc, window_sums[w])
    return ocurve.to_affine(acc)
