"""TPU MSM engine: marshalling + device pipeline + host window combine.

The counterpart of the reference's submission orchestrator
(`src/submission/submission.ts:25-157`): window-size selection, input
marshalling, device bucket accumulation/reduction, and the final combine.
"""
from __future__ import annotations

import functools
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..config import MSMConfig
from ..oracle import curve as ocurve
from ..oracle import field as ofield
from ..oracle.curve import ExtPoint
from ..oracle.msm import combine_windows
from ..ops import field_ops, limbs, pippenger, windows
from ..utils import convert


def _device_msm_impl(points_plain, scalar_words, *, window_size, n_chunks,
                     chunk_len, signed_digits=False):
    """[3, 16, n] plain-domain affine coords + [8, n] scalars -> [4, 16, K] plain."""
    from ..ops import curve_ops

    n = points_plain.shape[-1]
    if jax.default_backend() == "tpu" and n % 1024 == 0:
        from ..ops.pallas import padd_kernels

        pts_niels = padd_kernels.to_niels(points_plain)
    else:
        pts_niels = curve_ops.to_niels_planes(points_plain)
    wsums_mont = pippenger.accumulate_and_reduce(
        pts_niels,
        scalar_words,
        window_size=window_size,
        n_chunks=n_chunks,
        chunk_len=chunk_len,
        signed_digits=signed_digits,
    )
    out = jnp.stack(
        [
            limbs.stack(field_ops.from_mont(limbs.unstack(wsums_mont[i])))
            for i in range(4)
        ]
    )
    return out


_device_msm_jit = functools.partial(
    jax.jit,
    static_argnames=("window_size", "n_chunks", "chunk_len", "signed_digits"),
)(_device_msm_impl)


def _device_msm(points_plain, scalar_words, *, window_size, n_chunks,
                chunk_len, signed_digits=False):
    """Device MSM dispatch through the AOT program cache.

    Tracing + lowering the pipeline costs ~73 s per fresh process at the
    production shape (scripts/profile_compile.py); on TPU the traced
    program is serialized via jax.export and re-used across processes
    (utils/cache.exported_call), so warm starts skip Python tracing
    entirely and the backend compile hits jax's persistent cache. Non-TPU
    backends (tests, interpret mode) use plain jit.
    """
    if jax.default_backend() != "tpu":
        return _device_msm_jit(
            points_plain, scalar_words, window_size=window_size,
            n_chunks=n_chunks, chunk_len=chunk_len,
            signed_digits=signed_digits,
        )
    from ..utils.cache import exported_call

    fn = functools.partial(
        _device_msm_impl, window_size=window_size, n_chunks=n_chunks,
        chunk_len=chunk_len, signed_digits=signed_digits,
    )
    name = (
        f"device_msm_w{window_size}_c{n_chunks}x{chunk_len}"
        f"_s{int(signed_digits)}"
    )
    return exported_call(name, fn, points_plain, scalar_words)


def marshal_points(points: Sequence[ExtPoint], pad_to: int) -> np.ndarray:
    """list of extended-affine points -> [3, 16, pad_to] digit planes (plain).

    Points with z != 1 are normalized on the host (the API accepts general
    extended coordinates; in practice inputs are extended affine).
    """
    n = len(points)
    xs, ys, ts = [], [], []
    for p in points:
        if p.z != 1:
            zi = ofield.finv(p.z)
            x, y = p.x * zi % ofield.P, p.y * zi % ofield.P
            t = x * y % ofield.P
        else:
            x, y, t = p.x % ofield.P, p.y % ofield.P, p.t % ofield.P
        xs.append(x)
        ys.append(y)
        ts.append(t)
    # identity padding: (0, 1, 0)
    pad = pad_to - n
    if pad:
        xs += [0] * pad
        ys += [1] * pad
        ts += [0] * pad
    words = np.stack(
        [
            convert.bigints_to_words_le(xs),
            convert.bigints_to_words_le(ys),
            convert.bigints_to_words_le(ts),
        ]
    )  # [3, 8, pad_to]
    planes = np.empty((3, 16, pad_to), dtype=np.uint32)
    for c in range(3):
        for w_i in range(8):
            planes[c, 2 * w_i] = words[c, w_i] & 0xFFFF
            planes[c, 2 * w_i + 1] = words[c, w_i] >> 16
    return planes


def marshal_scalars(scalars: Sequence[int], pad_to: int) -> np.ndarray:
    sc = list(scalars) + [0] * (pad_to - len(scalars))
    return convert.bigints_to_words_le(sc)  # [8, pad_to]


def _signed_ok(config: MSMConfig, scalar_words: np.ndarray) -> bool:
    """Signed-digit recoding needs scalars < 2^254 (no top-window carry-out);
    field scalars are < 2^253 (word 7 < 2^29). Vectorized host check."""
    if not config.signed_digits:
        return False
    return bool(np.all(scalar_words[7] < (1 << 29)))


def window_sums_to_points(wsums: np.ndarray) -> list[ExtPoint]:
    """[4, 16, K] plain digit planes -> K ExtPoints."""
    K = wsums.shape[-1]
    coords = []
    for c in range(4):
        words = np.empty((8, K), dtype=np.uint32)
        for w_i in range(8):
            words[w_i] = wsums[c, 2 * w_i] | (wsums[c, 2 * w_i + 1] << 16)
        coords.append(convert.words_le_to_bigints(words))
    return [
        ExtPoint(coords[0][k], coords[1][k], coords[2][k], coords[3][k])
        for k in range(K)
    ]


def msm_window_sums_host(
    points: Sequence[ExtPoint], scalars: Sequence[int], config: MSMConfig
) -> tuple[list[ExtPoint], int]:
    """Run the device pipeline; return (window_sums LSB-first, window_size)."""
    from ..utils import trace

    n = len(points)
    w = config.resolved_window_size(n)
    C, L = config.resolved_chunking(n)
    batch = C * L
    pad_to = -(-n // batch) * batch  # round up to whole batches
    with trace.phase("convert inputs"):
        pts = marshal_points(points, pad_to)
        sc = marshal_scalars(scalars, pad_to)
    with trace.phase("device msm"):
        out = _device_msm(
            jnp.asarray(pts),
            jnp.asarray(sc),
            window_size=w,
            n_chunks=C,
            chunk_len=L,
            signed_digits=_signed_ok(config, sc),
        )
        out_host = np.asarray(out)
    return window_sums_to_points(out_host), w


def msm_affine(
    points: Sequence[ExtPoint], scalars: Sequence[int], config: MSMConfig
) -> tuple[int, int]:
    wsums, w = msm_window_sums_host(points, scalars, config)
    result = combine_windows(wsums, w)
    return ocurve.to_affine(result)


def msm_affine_batch(
    jobs: Sequence[tuple[Sequence[ExtPoint], Sequence[int]]], config: MSMConfig
) -> list[tuple[int, int]]:
    """Streaming prover workload: many MSMs with overlapped host marshalling.

    JAX dispatch is asynchronous, so each job's device pipeline runs while
    the host marshals the next job's inputs — the reference's double-buffered
    staging (gpu.ts:146-155 / DESIGN.md:117-124) at job granularity. Results
    are fetched (and window-combined on host) only after every job has been
    dispatched.
    """
    outs = []
    for points, scalars in jobs:
        n = len(points)
        w = config.resolved_window_size(n)
        C, L = config.resolved_chunking(n)
        batch = C * L
        pad_to = -(-n // batch) * batch
        pts = marshal_points(points, pad_to)
        sc = marshal_scalars(scalars, pad_to)
        out = _device_msm(
            jnp.asarray(pts), jnp.asarray(sc), window_size=w, n_chunks=C,
            chunk_len=L, signed_digits=_signed_ok(config, sc),
        )
        outs.append((out, w))  # dispatched, not fetched: device keeps working
    results = []
    for out, w in outs:
        wsums = window_sums_to_points(np.asarray(out))
        results.append(ocurve.to_affine(combine_windows(wsums, w)))
    return results


def _be_words_to_planes(be_rows: np.ndarray) -> np.ndarray:
    """[n, 8] big-endian u32 rows -> [16, n] LE 16-bit digit planes."""
    words_le = convert.be_rows_to_words_le(be_rows)  # [8, n]
    n = words_le.shape[1]
    planes = np.empty((16, n), dtype=np.uint32)
    planes[0::2] = words_le & np.uint32(0xFFFF)
    planes[1::2] = words_le >> np.uint32(16)
    return planes


def _be_cols_to_planes_j(cols: jnp.ndarray) -> jnp.ndarray:
    """[n, 8] big-endian u32 rows -> [16, n] LE digit planes (on device)."""
    w = cols[:, ::-1].T  # [8, n] LE word order
    lo = w & jnp.uint32(0xFFFF)
    hi = w >> jnp.uint32(16)
    return jnp.stack([lo, hi], axis=1).reshape(16, -1)


def _device_msm_wire_impl(xy_be, scalars_be, *, window_size, n_chunks,
                          chunk_len, signed_digits=False):
    """Device-side wire marshalling: [pad, 16] BE x||y rows + [pad, 8] BE
    scalar rows -> window sums [4, 16, K] plain.

    The BE->digit-plane unpack, the Montgomery conversion, AND t = x*y all
    happen on device — the host only slices/pads the incoming wire arrays,
    so the wall clock pays one (half-width) transfer and no numpy marshal
    (the reference's 8 convert workers, submission.ts:50-74, reduced to
    zero host work).
    """
    from ..ops import curve_ops

    x = _be_cols_to_planes_j(xy_be[:, :8])
    y = _be_cols_to_planes_j(xy_be[:, 8:])
    n = x.shape[-1]
    if jax.default_backend() == "tpu" and n % 1024 == 0:
        from ..ops.pallas import padd_kernels

        pts_niels = padd_kernels.to_niels_xy(jnp.stack([x, y]))
    else:
        pts_niels = curve_ops.to_niels_from_xy(x, y)
    sw = convert_be_rows_to_words_le_j(scalars_be)
    wsums_mont = pippenger.accumulate_and_reduce(
        pts_niels,
        sw,
        window_size=window_size,
        n_chunks=n_chunks,
        chunk_len=chunk_len,
        signed_digits=signed_digits,
    )
    return jnp.stack(
        [
            limbs.stack(field_ops.from_mont(limbs.unstack(wsums_mont[i])))
            for i in range(4)
        ]
    )


def convert_be_rows_to_words_le_j(be_rows: jnp.ndarray) -> jnp.ndarray:
    """[n, 8] BE u32 rows -> [8, n] LE words (device-side)."""
    return be_rows[:, ::-1].T


_device_msm_wire_jit = functools.partial(
    jax.jit,
    static_argnames=("window_size", "n_chunks", "chunk_len", "signed_digits"),
)(_device_msm_wire_impl)


def _device_msm_wire(xy_be, scalars_be, **kw):
    if jax.default_backend() != "tpu":
        return _device_msm_wire_jit(xy_be, scalars_be, **kw)
    from ..utils.cache import exported_call

    name = (
        f"device_msm_wire_w{kw['window_size']}_c{kw['n_chunks']}x"
        f"{kw['chunk_len']}_s{int(kw.get('signed_digits', False))}"
    )
    return exported_call(
        name, functools.partial(_device_msm_wire_impl, **kw), xy_be, scalars_be
    )


def _wire_niels(xy_be):
    from ..ops import curve_ops

    x = _be_cols_to_planes_j(xy_be[:, :8])
    y = _be_cols_to_planes_j(xy_be[:, 8:])
    n = x.shape[-1]
    if jax.default_backend() == "tpu" and n % 1024 == 0:
        from ..ops.pallas import padd_kernels

        return padd_kernels.to_niels_xy(jnp.stack([x, y]))
    return curve_ops.to_niels_from_xy(x, y)


def _wire_batch_impl(xy_be, scalars_be, carry_st, *, window_size, n_chunks,
                     chunk_len, signed_digits=False):
    """One wire batch -> bucket-array carry + this batch's buckets."""
    pts_niels = _wire_niels(xy_be)
    sw = convert_be_rows_to_words_le_j(scalars_be)
    bsums = pippenger.accumulate_buckets(
        pts_niels, sw, window_size=window_size, n_chunks=n_chunks,
        chunk_len=chunk_len, signed_digits=signed_digits,
    )
    return pippenger._vadd(carry_st, bsums)


def _wire_finish_impl(carry_st):
    wsums_mont = pippenger.reduce_buckets(carry_st)
    return jnp.stack(
        [
            limbs.stack(field_ops.from_mont(limbs.unstack(wsums_mont[i])))
            for i in range(4)
        ]
    )


def _device_msm_wire_streamed(xy: np.ndarray, sc: np.ndarray, *, window_size,
                              n_chunks, chunk_len, signed_digits):
    """Multi-batch wire MSM with transfer/compute overlap.

    Each batch's (xy, scalars) rows are device_put-dispatched and the
    batch program queued without any host sync, so the runtime streams
    batch k+1's host->device transfer while batch k computes — the
    reference's double-buffered staging (gpu.ts:146-155 / DESIGN.md:
    117-124) at transfer granularity. The bucket-array carry stays
    device-resident; one finish program reduces it.
    """
    from ..ops import curve_ops, windows
    from ..utils.cache import exported_call

    M = n_chunks * chunk_len
    n = xy.shape[0]
    assert n % M == 0, (n, M)
    K = windows.n_windows(window_size)
    B = pippenger.n_buckets(window_size, signed_digits)
    carry = jnp.broadcast_to(
        jnp.asarray(
            np.stack(
                [
                    np.zeros((16,), np.uint32),
                    _R_PLANES,
                    np.zeros((16,), np.uint32),
                    _R_PLANES,
                ]
            )[:, :, None, None]
        ),
        (4, 16, K, B),
    )
    batch_kw = dict(
        window_size=window_size, n_chunks=n_chunks, chunk_len=chunk_len,
        signed_digits=signed_digits,
    )
    name = (
        f"wire_batch_w{window_size}_c{n_chunks}x{chunk_len}"
        f"_s{int(signed_digits)}"
    )
    for b in range(n // M):
        dxy = jax.device_put(xy[b * M : (b + 1) * M])
        dsc = jax.device_put(sc[b * M : (b + 1) * M])
        carry = exported_call(
            name, functools.partial(_wire_batch_impl, **batch_kw),
            dxy, dsc, carry,
        )
    return exported_call(f"wire_finish_w{window_size}_s{int(signed_digits)}",
                         _wire_finish_impl, carry)


# 16-bit digit planes of R mod p (the Montgomery-domain 1 of the identity
# point (0, 1, 0, 1)), for building the streamed path's initial carry.
def _r_planes() -> np.ndarray:
    from ..oracle.field import R_MOD_P

    return np.array(
        [(R_MOD_P >> (16 * d)) & 0xFFFF for d in range(16)], dtype=np.uint32
    )


_R_PLANES = _r_planes()


def msm_affine_wire(
    points_be: np.ndarray,  # [n, 32] u32 BE rows: x || y || t || z
    scalars_be: np.ndarray,  # [n, 8] u32 BE rows
    config: MSMConfig,
) -> tuple[int, int]:
    """Wire-format (U32Array) fast path: marshalling ON DEVICE.

    The reference parallelizes bigint->u32 conversion across 8 workers
    (submission.ts:50-74, convert_worker.ts); here the host only slices
    x||y out of the rows and pads — unpacking, Montgomery conversion and
    t = x*y run inside the device program. Requires z == 1 (extended
    affine, README.md:66-96); callers fall back to the generic path
    otherwise.
    """
    from ..utils import trace

    points_be = np.ascontiguousarray(points_be, dtype=np.uint32).reshape(-1, 32)
    scalars_be = np.ascontiguousarray(scalars_be, dtype=np.uint32).reshape(-1, 8)
    n = points_be.shape[0]
    z = points_be[:, 24:32]
    if not (np.all(z[:, :7] == 0) and np.all(z[:, 7] == 1)):
        raise ValueError("wire fast path requires z == 1")

    w = config.resolved_window_size(n)
    C, L = config.resolved_chunking(n)
    batch = C * L
    pad_to = -(-n // batch) * batch
    with trace.phase("slice/pad inputs (wire)"):
        xy = np.zeros((pad_to, 16), dtype=np.uint32)
        xy[:n] = points_be[:, :16]
        xy[n:, 15] = 1  # identity padding: x = 0, y = 1 (BE low word)
        sc = np.zeros((pad_to, 8), dtype=np.uint32)
        sc[:n] = scalars_be
        # signed recoding needs scalars < 2^254; BE word 0 is the top word
        signed = config.signed_digits and bool(
            np.all(scalars_be[:, 0] < (1 << 29))
        )
    with trace.phase("device msm (wire)"):
        if pad_to > C * L and jax.default_backend() == "tpu":
            out = _device_msm_wire_streamed(
                xy, sc, window_size=w, n_chunks=C, chunk_len=L,
                signed_digits=signed,
            )
        else:
            out = _device_msm_wire(
                jnp.asarray(xy),
                jnp.asarray(sc),
                window_size=w,
                n_chunks=C,
                chunk_len=L,
                signed_digits=signed,
            )
        out_host = np.asarray(out)
    result = combine_windows(window_sums_to_points(out_host), w)
    return ocurve.to_affine(result)
