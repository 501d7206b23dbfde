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


# ---------------------------------------------------------------------------
# Staged device pipeline (round-4 compile diet).
#
# The MSM runs as a host-driven chain of SMALL compiled programs instead of
# one monolithic jit: per-batch "accumulate" programs (to_niels + window
# split + sorted segmented scan + bucket assembly + carry add) and ONE
# "finish" program (bucket reduction + from_mont). Why:
#
# - Compile cost is superlinear in module size; the r2-profiled monolith
#   (DESIGN.md "Compile-time budget") paid ~180 s cold. Stages compile
#   independently and the persistent cache gets reusable pieces.
# - One batch program serves EVERY input size that shares (w, C, L): the
#   host loops over batches, carrying a device-resident bucket array —
#   2^16..2^20 inputs all hit the same two executables.
# - The planes path and the wire path share the same finish program.
#
# Dispatch is async, so the host loop costs nothing on the device timeline
# (the reference's double-buffered staging, gpu.ts:146-155, at batch
# granularity — transfers overlap compute when inputs come from the host).
# ---------------------------------------------------------------------------


def _to_niels_any(points_plain):
    from ..ops import curve_ops

    n = points_plain.shape[-1]
    if jax.default_backend() == "tpu" and n % 1024 == 0:
        from ..ops.pallas import padd_kernels

        return padd_kernels.to_niels(points_plain)
    return curve_ops.to_niels_planes(points_plain)


def _batch_planes_impl(points_plain, scalar_words, carry_st, *, window_size,
                       n_chunks, chunk_len, signed_digits=False):
    """One batch from [3, 16, M] plain planes + [8, M] scalars -> carry +=
    this batch's bucket sums [4, 16, K, B]."""
    pts_niels = _to_niels_any(points_plain)
    bsums = pippenger.accumulate_batch(
        pts_niels, scalar_words, window_size=window_size, n_chunks=n_chunks,
        chunk_len=chunk_len, signed_digits=signed_digits,
    )
    return pippenger._vadd(carry_st, bsums)


def _finish_impl(carry_st):
    """Bucket arrays -> window sums [4, 16, K], plain domain."""
    wsums_mont = pippenger.reduce_buckets(carry_st)
    return jnp.stack(
        [
            limbs.stack(field_ops.from_mont(limbs.unstack(wsums_mont[i])))
            for i in range(4)
        ]
    )


def _finish_affine_impl(carry_st):
    """Bucket arrays -> AFFINE window sums [2, 16, K], plain domain.

    The z inverse runs ON DEVICE (batched Fermat exponentiation,
    field_ops.finv_mont) — the reference WGSL library's field_inverse
    capability (FieldModulus.ts:119-164) applied to the one place this
    pipeline needs an inverse. Gated by config.device_affine.
    """
    wsums_mont = pippenger.reduce_buckets(carry_st)
    x = limbs.unstack(wsums_mont[0])
    y = limbs.unstack(wsums_mont[1])
    zi = field_ops.finv_mont(limbs.unstack(wsums_mont[3]))
    xa = field_ops.mont_mul(x, zi)
    ya = field_ops.mont_mul(y, zi)
    return jnp.stack(
        [
            limbs.stack(field_ops.from_mont(xa)),
            limbs.stack(field_ops.from_mont(ya)),
        ]
    )


def _call_finish(carry, window_size: int, signed: bool, device_affine: bool):
    if device_affine:
        return _call_stage(
            f"finish_affine_w{window_size}_s{int(signed)}",
            _finish_affine_impl, {}, carry,
        )
    return _call_stage(
        f"finish_w{window_size}_s{int(signed)}", _finish_impl, {}, carry
    )


_JIT_STAGES: dict = {}


def _call_stage(name: str, fn, static_kw: dict, *args):
    """Run one pipeline stage through the best program cache for the backend:
    jax.export AOT artifacts on TPU (zero retracing across processes), a
    per-process jit cache elsewhere. `name` must encode every static in
    `static_kw` (it keys both caches)."""
    if jax.default_backend() == "tpu":
        from ..utils.cache import exported_call

        return exported_call(name, functools.partial(fn, **static_kw), *args)
    jitted = _JIT_STAGES.get(name)
    if jitted is None:
        jitted = jax.jit(functools.partial(fn, **static_kw))
        _JIT_STAGES[name] = jitted
    return jitted(*args)


def _identity_carry(window_size: int, signed_digits: bool) -> jnp.ndarray:
    """[4, 16, K, B] identity-point bucket carry, built host-side."""
    K = windows.n_windows(window_size)
    B = pippenger.n_buckets(window_size, signed_digits)
    return jnp.broadcast_to(
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


def _device_msm(points_plain, scalar_words, *, window_size, n_chunks,
                chunk_len, signed_digits=False, device_affine=False):
    """Staged device MSM over [3, 16, n] plain planes + [8, n] scalars.

    numpy inputs are device_put per batch (host->device transfer of batch
    k+1 streams while batch k computes); device inputs are sliced on device.
    """
    M = n_chunks * chunk_len
    n = points_plain.shape[-1]
    assert n % M == 0, (n, M)
    carry = _identity_carry(window_size, signed_digits)
    static = dict(
        window_size=window_size, n_chunks=n_chunks, chunk_len=chunk_len,
        signed_digits=signed_digits,
    )
    bname = (
        f"batch_planes_w{window_size}_c{n_chunks}x{chunk_len}"
        f"_s{int(signed_digits)}"
    )
    host_input = isinstance(points_plain, np.ndarray)
    for b in range(n // M):
        sl = slice(b * M, (b + 1) * M)
        if host_input:
            pts_b = jax.device_put(np.ascontiguousarray(points_plain[:, :, sl]))
            sc_b = jax.device_put(np.ascontiguousarray(scalar_words[:, sl]))
        else:
            pts_b = points_plain[:, :, sl]
            sc_b = scalar_words[:, sl]
        carry = _call_stage(bname, _batch_planes_impl, static, pts_b, sc_b, carry)
    return _call_finish(carry, window_size, signed_digits, device_affine)


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
    """Window-sum planes -> K ExtPoints.

    Accepts both finish-stage layouts: [4, 16, K] extended (x, y, t, z)
    and [2, 16, K] affine (device_affine — x, y with z == 1; t = x*y is
    recomputed host-side, K bigint muls)."""
    K = wsums.shape[-1]
    n_coords = wsums.shape[0]
    coords = []
    for c in range(n_coords):
        words = np.empty((8, K), dtype=np.uint32)
        for w_i in range(8):
            words[w_i] = wsums[c, 2 * w_i] | (wsums[c, 2 * w_i + 1] << 16)
        coords.append(convert.words_le_to_bigints(words))
    if n_coords == 2:
        return [
            ExtPoint(x, y, x * y % ofield.P, 1)
            for x, y in zip(coords[0], coords[1])
        ]
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
    # host-fed inputs: wall-optimal streaming plan (transfer overlaps
    # compute), not the device-resident single-batch plan
    w, C, L = config.resolved_wire_plan(n)
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
            device_affine=config.device_affine,
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
        w, C, L = config.resolved_wire_plan(n)
        batch = C * L
        pad_to = -(-n // batch) * batch
        pts = marshal_points(points, pad_to)
        sc = marshal_scalars(scalars, pad_to)
        out = _device_msm(
            jnp.asarray(pts), jnp.asarray(sc), window_size=w, n_chunks=C,
            chunk_len=L, signed_digits=_signed_ok(config, sc),
            device_affine=config.device_affine,
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


def convert_be_rows_to_words_le_j(be_rows: jnp.ndarray) -> jnp.ndarray:
    """[n, 8] BE u32 rows -> [8, n] LE words (device-side)."""
    return be_rows[:, ::-1].T


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


def _device_msm_wire_staged(xy: np.ndarray, sc: np.ndarray, *, window_size,
                            n_chunks, chunk_len, signed_digits,
                            device_affine=False):
    """Wire MSM as the staged pipeline, with transfer/compute overlap.

    Each batch's (xy, scalars) rows are device_put-dispatched and the
    batch program queued without any host sync, so the runtime streams
    batch k+1's host->device transfer while batch k computes — the
    reference's double-buffered staging (gpu.ts:146-155 / DESIGN.md:
    117-124) at transfer granularity. The bucket-array carry stays
    device-resident; the shared finish program reduces it.
    """
    M = n_chunks * chunk_len
    n = xy.shape[0]
    assert n % M == 0, (n, M)
    carry = _identity_carry(window_size, signed_digits)
    static = dict(
        window_size=window_size, n_chunks=n_chunks, chunk_len=chunk_len,
        signed_digits=signed_digits,
    )
    bname = (
        f"wire_batch_w{window_size}_c{n_chunks}x{chunk_len}"
        f"_s{int(signed_digits)}"
    )
    for b in range(n // M):
        dxy = jax.device_put(np.ascontiguousarray(xy[b * M : (b + 1) * M]))
        dsc = jax.device_put(np.ascontiguousarray(sc[b * M : (b + 1) * M]))
        carry = _call_stage(bname, _wire_batch_impl, static, dxy, dsc, carry)
    return _call_finish(carry, window_size, signed_digits, device_affine)


# 16-bit digit planes of R mod p (the Montgomery-domain 1 of the identity
# point (0, 1, 0, 1)), for building the streamed path's initial carry.
def _r_planes() -> np.ndarray:
    from ..oracle.field import R_MOD_P

    return np.array(
        [(R_MOD_P >> (16 * d)) & 0xFFFF for d in range(16)], dtype=np.uint32
    )


_R_PLANES = _r_planes()


def _dispatch_wire(
    points_be: np.ndarray, scalars_be: np.ndarray, config: MSMConfig
):
    """Validate + pad wire inputs and dispatch the device pipeline.

    Returns (out_device, window_size) WITHOUT fetching: JAX dispatch is
    async, so callers can queue many jobs before paying any device->host
    sync (the batched-prover pattern, SURVEY.md §7.7)."""
    from ..utils import convert, trace

    points_be = np.ascontiguousarray(
        convert.as_u32_array(points_be, "wire points")
    ).reshape(-1, 32)
    scalars_be = np.ascontiguousarray(
        convert.as_u32_array(scalars_be, "wire scalars")
    ).reshape(-1, 8)
    n = points_be.shape[0]
    z = points_be[:, 24:32]
    if not (np.all(z[:, :7] == 0) and np.all(z[:, 7] == 1)):
        raise ValueError("wire fast path requires z == 1")

    w, C, L = config.resolved_wire_plan(n)
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
        out = _device_msm_wire_staged(
            xy, sc, window_size=w, n_chunks=C, chunk_len=L,
            signed_digits=signed, device_affine=config.device_affine,
        )
    return out, w


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
    out, w = _dispatch_wire(points_be, scalars_be, config)
    result = combine_windows(window_sums_to_points(np.asarray(out)), w)
    return ocurve.to_affine(result)


# ---------------------------------------------------------------------------
# Fixed-base (SRS) prover plan.
#
# The batched prover's dominant cost on a tunneled host was re-sending 64 MB
# of point rows per job even when every job shares one SRS (round-4 verdict:
# batch 680k pts/s vs 2.94M on-device). A plan converts the bases to
# device-resident Montgomery-Niels planes ONCE; each job then streams only
# its [n, 8] scalar rows — 96 B/point -> 32 B/point per job. This is the
# TPU generalization of the reference's zero-copy SharedArrayBuffer point
# buffer reused across workers (submission.ts:35-38,131): the browser could
# only share within one call; a resident accelerator shares across calls.
# ---------------------------------------------------------------------------


def _plan_niels_impl(xy_be):
    """[M, 16] BE u32 x||y rows -> [3, 16, M] Montgomery Niels planes."""
    return _wire_niels(xy_be)


def _fixed_batch_impl(pts_niels, scalars_be, carry_st, *, window_size,
                      n_chunks, chunk_len, signed_digits=False):
    """One fixed-base batch: resident Niels points + streamed scalar rows."""
    sw = convert_be_rows_to_words_le_j(scalars_be)
    bsums = pippenger.accumulate_buckets(
        pts_niels, sw, window_size=window_size, n_chunks=n_chunks,
        chunk_len=chunk_len, signed_digits=signed_digits,
    )
    return pippenger._vadd(carry_st, bsums)


class WirePlan:
    """Device-resident fixed bases; `dispatch` streams scalars per job.

    Build cost (one transfer + Niels conversion per batch) is paid once at
    construction; every subsequent job moves only scalars host->device.
    Batches keep the wire plan's (w, C, L) so scalar transfers overlap the
    previous batch's compute exactly like the cold wire path.
    """

    def __init__(self, points_be: np.ndarray, config: MSMConfig):
        points_be = np.ascontiguousarray(
            convert.as_u32_array(points_be, "wire points")
        ).reshape(-1, 32)
        z = points_be[:, 24:32]
        if not (np.all(z[:, :7] == 0) and np.all(z[:, 7] == 1)):
            raise ValueError("fixed-base plan requires z == 1 wire points")
        self.config = config
        self.n = points_be.shape[0]
        self.w, self.C, self.L = config.resolved_wire_plan(self.n)
        M = self.C * self.L
        self.pad_to = -(-self.n // M) * M
        xy = np.zeros((self.pad_to, 16), dtype=np.uint32)
        xy[: self.n] = points_be[:, :16]
        xy[self.n :, 15] = 1  # identity padding: x = 0, y = 1 (BE low word)
        self._niels = []
        for b in range(self.pad_to // M):
            dxy = jax.device_put(np.ascontiguousarray(xy[b * M : (b + 1) * M]))
            self._niels.append(
                _call_stage(f"plan_niels_m{M}", _plan_niels_impl, {}, dxy)
            )

    def dispatch(self, scalars_be: np.ndarray):
        """Queue one job's device programs; returns (out, w) WITHOUT a sync
        (callers batch many jobs before fetching, like _dispatch_wire)."""
        scalars_be = np.ascontiguousarray(
            convert.as_u32_array(scalars_be, "wire scalars")
        ).reshape(-1, 8)
        if scalars_be.shape[0] != self.n:
            raise ValueError(
                f"plan holds {self.n} bases but got {scalars_be.shape[0]} scalars"
            )
        M = self.C * self.L
        sc = np.zeros((self.pad_to, 8), dtype=np.uint32)
        sc[: self.n] = scalars_be
        signed = self.config.signed_digits and bool(
            np.all(scalars_be[:, 0] < (1 << 29))
        )
        carry = _identity_carry(self.w, signed)
        static = dict(
            window_size=self.w, n_chunks=self.C, chunk_len=self.L,
            signed_digits=signed,
        )
        bname = f"fixed_batch_w{self.w}_c{self.C}x{self.L}_s{int(signed)}"
        for b, niels in enumerate(self._niels):
            dsc = jax.device_put(np.ascontiguousarray(sc[b * M : (b + 1) * M]))
            carry = _call_stage(bname, _fixed_batch_impl, static, niels, dsc, carry)
        out = _call_finish(carry, self.w, signed, self.config.device_affine)
        return out, self.w

    def msm_affine(self, scalars_be: np.ndarray) -> tuple[int, int]:
        out, w = self.dispatch(scalars_be)
        result = combine_windows(window_sums_to_points(np.asarray(out)), w)
        return ocurve.to_affine(result)

    def msm_affine_batch(
        self, scalars_list: Sequence[np.ndarray]
    ) -> list[tuple[int, int]]:
        dispatched = [self.dispatch(s) for s in scalars_list]
        return [
            ocurve.to_affine(
                combine_windows(window_sums_to_points(np.asarray(out)), w)
            )
            for out, w in dispatched
        ]


def msm_affine_batch_wire(
    jobs: Sequence[tuple[np.ndarray, np.ndarray]], config: MSMConfig
) -> list[tuple[int, int]]:
    """Streaming prover workload over WIRE inputs: every job's transfers and
    device programs are dispatched (streamed, transfer overlapped with
    compute) before any result is fetched — the reference's double-buffered
    staging (gpu.ts:146-155) at job granularity, with zero per-point Python
    marshalling (round-3 verdict #4: the list-based batch path re-paid the
    bigint marshal the wire path exists to delete)."""
    dispatched = [
        _dispatch_wire(points_be, scalars_be, config)
        for points_be, scalars_be in jobs
    ]
    return [
        ocurve.to_affine(
            combine_windows(window_sums_to_points(np.asarray(out)), w)
        )
        for out, w in dispatched
    ]
