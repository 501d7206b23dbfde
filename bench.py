#!/usr/bin/env python
"""Benchmark driver: BLS12-377-embedded-curve MSM throughput on one TPU chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The headline metric (BASELINE.json) is MSM throughput (points/sec/chip) at
2^20 points, bit-exact, with `vs_baseline` = speedup over the single-thread
NATIVE CPU reference (runtime/csrc/msm_cpu.cpp with 1 thread — the analog
of the reference repo's `cpuWorkRatio=1` arkworks path, SURVEY.md §3.3,
per BASELINE.md's ">=10x single-thread CPU reference"); the pure-Python
oracle multiplier is reported as `vs_python_oracle`. Baseline measurements
are cached in `.bench_baseline.json` (committed; delete to re-measure).

Input distribution mirrors the reference's random-input benchmark mode
(`src/ui/AllBenchmarks.tsx:107-143`): a fixed base point repeated n times
with uniformly random scalars — which also makes the expected result exact
and cheap: sum_i(s_i) * B.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
BASELINE_CACHE = REPO / ".bench_baseline.json"


def build_inputs(n: int, seed: int = 2024):
    """Repeated base point + random 253-bit scalars, pre-marshalled.

    Returns (points_planes [3,16,n] u32 plain-domain, scalar_words [8,n] u32
    LE, expected_affine (x, y)).
    """
    from webgpu_msm_tpu.oracle import curve, field
    from webgpu_msm_tpu.oracle.testdata import base_point

    rng = np.random.default_rng(seed)
    words = rng.integers(0, 1 << 32, size=(8, n), dtype=np.uint64).astype(np.uint32)
    words[7] &= 0x1FFFFFFF  # < 2^253

    # Expected: (sum of scalars) * B, with the sum computed columnwise.
    total = 0
    for w in range(8):
        total += int(words[w].astype(np.uint64).sum()) << (32 * w)
    b = base_point()
    expected = curve.to_affine(curve.scalar_mul(b, total))

    # Marshal the single base point, then broadcast (z == 1, t == x*y).
    coords = [b.x % field.P, b.y % field.P, b.t % field.P]
    planes = np.empty((3, 16, n), dtype=np.uint32)
    for c, v in enumerate(coords):
        for d in range(16):
            planes[c, d] = (v >> (16 * d)) & 0xFFFF
    return planes, words, expected


def measure_device(n_pow: int, iters: int, window: int | None,
                   chunks: tuple[int, int] | None = None):
    import jax
    import jax.numpy as jnp

    from webgpu_msm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from webgpu_msm_tpu.config import MSMConfig
    from webgpu_msm_tpu.engines import tpu_engine
    from webgpu_msm_tpu.oracle.msm import combine_windows

    n = 1 << n_pow
    cfg = MSMConfig(window_size=window)
    w = cfg.resolved_window_size(n)
    C, L = chunks if chunks else cfg.resolved_chunking(n)
    assert n % (C * L) == 0, (C, L, n)

    planes, words, expected = build_inputs(n)
    pts = jax.device_put(jnp.asarray(planes))
    sc = jax.device_put(jnp.asarray(words))

    # NB: on the tunneled TPU platform block_until_ready() can return before
    # the device finishes; a host fetch of the (tiny, [4,16,K]) output is the
    # reliable fence. Measure the fetch/latency floor and subtract it.
    signed = cfg.signed_digits  # build_inputs masks scalars < 2^253
    t0 = time.perf_counter()
    out = tpu_engine._device_msm(
        pts, sc, window_size=w, n_chunks=C, chunk_len=L, signed_digits=signed
    )
    np.asarray(out)
    compile_s = time.perf_counter() - t0

    trivial = jax.jit(lambda x: x + 1)
    small = jnp.zeros((4, 16, 8), jnp.uint32)
    np.asarray(trivial(small))
    lat = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(trivial(small))
        lat.append(time.perf_counter() - t0)
    latency_s = float(np.median(lat))

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = tpu_engine._device_msm(
            pts, sc, window_size=w, n_chunks=C, chunk_len=L, signed_digits=signed
        )
        np.asarray(out)
        times.append(max(time.perf_counter() - t0 - latency_s, 1e-9))

    wsums = tpu_engine.window_sums_to_points(np.asarray(out))
    from webgpu_msm_tpu.oracle import curve

    got = curve.to_affine(combine_windows(wsums, w))
    bit_exact = got == expected

    dev_s = float(np.median(times))
    return {
        "n": n,
        "window": w,
        "chunks": [C, L],
        "device_s": dev_s,
        "device_s_all": times,
        "sync_latency_s": latency_s,
        "compile_s": compile_s,
        "points_per_s": n / dev_s,
        "bit_exact": bool(bit_exact),
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }


def build_wire_inputs(n: int, seed: int = 2024):
    """Wire-format (U32Array) inputs: [n, 32] BE u32 point rows (x||y||t||z,
    z == 1) and [n, 8] BE u32 scalar rows — the reference's primary input
    form (README.md:66-96, AllBenchmarks.tsx:221-230)."""
    from webgpu_msm_tpu.oracle import field
    from webgpu_msm_tpu.oracle.testdata import base_point
    from webgpu_msm_tpu.utils import convert

    rng = np.random.default_rng(seed)
    words = rng.integers(0, 1 << 32, size=(8, n), dtype=np.uint64).astype(np.uint32)
    words[7] &= 0x1FFFFFFF  # < 2^253
    total = 0
    for w in range(8):
        total += int(words[w].astype(np.uint64).sum()) << (32 * w)
    from webgpu_msm_tpu.oracle import curve

    b = base_point()
    expected = curve.to_affine(curve.scalar_mul(b, total))

    row = convert.bigints_to_u32_be(
        [b.x % field.P, b.y % field.P, b.t % field.P, 1]
    ).reshape(32)
    points_be = np.broadcast_to(row, (n, 32)).copy()
    scalars_be = convert.words_le_to_be_rows(words)
    return points_be, scalars_be, expected


def measure_wall(n_pow: int, iters: int, window: int | None) -> dict:
    """The scoring clock: full `compute_msm` wall time from U32Array inputs,
    marshalling included — the analog of the reference's performance.now()
    around the whole async call (Benchmark.tsx:31-34)."""
    import webgpu_msm_tpu as m
    from webgpu_msm_tpu.config import MSMConfig
    from webgpu_msm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    n = 1 << n_pow
    cfg = MSMConfig(window_size=window)
    points_be, scalars_be, expected = build_wire_inputs(n)

    got = m.compute_msm(points_be, scalars_be, config=cfg, engine="tpu")
    bit_exact = (got.x, got.y) == expected

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        m.compute_msm(points_be, scalars_be, config=cfg, engine="tpu")
        times.append(time.perf_counter() - t0)
    wall_s = float(np.median(times))
    return {
        "n": n,
        "wall_s": wall_s,
        "wall_s_all": times,
        # the tunnel link's throughput is visibly non-stationary (observed
        # medians 1.5-2.9 s across a day); report the spread so the scoring
        # clock can't silently random-walk between rounds (round-3 verdict)
        "wall_s_min": float(np.min(times)),
        "wall_s_max": float(np.max(times)),
        "wall_points_per_s": n / wall_s,
        "bit_exact": bool(bit_exact),
    }


def measure_wall_batch(n_pow: int, n_jobs: int, window: int | None) -> dict:
    """Batched-prover scoring clock: n_jobs wire-format MSMs through
    `compute_msm_batch` — all jobs dispatch (transfer overlapped with
    compute) before any result is fetched. The per-job wall throughput
    should meet or beat the single-job number (SURVEY.md §7.7)."""
    import webgpu_msm_tpu as m
    from webgpu_msm_tpu.config import MSMConfig

    n = 1 << n_pow
    cfg = MSMConfig(window_size=window)
    jobs = [build_wire_inputs(n, seed=3000 + j) for j in range(n_jobs)]
    points_list = [j[0] for j in jobs]
    scalars_list = [j[1] for j in jobs]
    expected = [j[2] for j in jobs]

    got = m.compute_msm_batch(points_list, scalars_list, config=cfg)  # warm-up
    bit_exact = all((g.x, g.y) == e for g, e in zip(got, expected))

    t0 = time.perf_counter()
    m.compute_msm_batch(points_list, scalars_list, config=cfg)
    batch_s = time.perf_counter() - t0
    return {
        "n": n,
        "n_jobs": n_jobs,
        "batch_s": batch_s,
        "batch_points_per_s": n * n_jobs / batch_s,
        "bit_exact": bool(bit_exact),
    }


def measure_wall_fixed_batch(
    n_pow: int, n_jobs: int, window: int | None, iters: int = 3
) -> dict:
    """Fixed-base (SRS) prover clock: ONE MSMPlan (bases resident on device),
    n_jobs scalar-only jobs through plan.msm_batch — the real prover shape
    (round-5 item #1). Reports setup cost and per-iteration spread; the
    tunnel's day-to-day variance makes a single number untrustworthy."""
    import webgpu_msm_tpu as m
    from webgpu_msm_tpu.config import MSMConfig
    from webgpu_msm_tpu.oracle import curve
    from webgpu_msm_tpu.oracle.testdata import base_point

    n = 1 << n_pow
    cfg = MSMConfig(window_size=window)
    points_be, _, _ = build_wire_inputs(n)
    b = base_point()

    jobs = []
    expected = []
    for j in range(n_jobs):
        rng = np.random.default_rng(5000 + j)
        words = rng.integers(0, 1 << 32, size=(8, n), dtype=np.uint64).astype(
            np.uint32
        )
        words[7] &= 0x1FFFFFFF
        total = 0
        for w in range(8):
            total += int(words[w].astype(np.uint64).sum()) << (32 * w)
        expected.append(curve.to_affine(curve.scalar_mul(b, total)))
        from webgpu_msm_tpu.utils import convert

        jobs.append(convert.words_le_to_be_rows(words))

    t0 = time.perf_counter()
    plan = m.MSMPlan(points_be, config=cfg)
    setup_s = time.perf_counter() - t0

    got = plan.msm_batch(jobs)  # warm-up + correctness
    bit_exact = all((g.x, g.y) == e for g, e in zip(got, expected))

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        plan.msm_batch(jobs)
        times.append(time.perf_counter() - t0)
    batch_s = float(np.median(times))

    # Context row: the tunnel's fenced host->device byte rate for fresh
    # random data, measured NOW (it is visibly non-stationary day to day).
    # The fixed-base path's floor is 32 B of scalar entropy per point per
    # job, so its points/s ceiling on this link is link_bytes_per_s / 32;
    # report both so a slow-link day reads as a link number, not a
    # software regression. (block_until_ready does not fence a transfer
    # on this platform; a dependent host fetch does — DESIGN.md round 3.)
    import jax
    import jax.numpy as jnp

    fence = jax.jit(
        lambda *xs: sum(jnp.sum(x, dtype=jnp.uint32) for x in xs)
    )
    rng = np.random.default_rng(99)
    probes = [
        rng.integers(0, 1 << 32, size=(1 << 21,), dtype=np.uint64).astype(
            np.uint32
        )
        for _ in range(4)
    ]  # 4 x 8 MB fresh random, in flight together like the job pipeline
    np.asarray(fence(*[p[:8] for p in probes]))  # compile
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fence(*[jax.device_put(p) for p in probes]))
        rates.append(sum(p.nbytes for p in probes) / (time.perf_counter() - t0))
    link_bytes_s = float(np.median(rates))

    return {
        "n": n,
        "n_jobs": n_jobs,
        "plan_setup_s": setup_s,
        "batch_s": batch_s,
        "batch_s_min": float(np.min(times)),
        "batch_s_max": float(np.max(times)),
        "batch_points_per_s": n * n_jobs / batch_s,
        "link_mb_s": round(link_bytes_s / 1e6, 1),
        "link_ceiling_points_per_s": round(link_bytes_s / 32, 1),
        "link_ceiling_fraction": round(
            (n * n_jobs / batch_s) / (link_bytes_s / 32), 3
        ),
        "bit_exact": bool(bit_exact),
    }


def measure_cpu_baseline(n_pow: int, window: int | None) -> dict:
    """Single-thread CPU reference: the pure-Python serial Pippenger oracle."""
    from webgpu_msm_tpu.config import MSMConfig
    from webgpu_msm_tpu.oracle import curve, msm as omsm
    from webgpu_msm_tpu.oracle.testdata import base_point

    n = 1 << n_pow
    cfg = MSMConfig(window_size=window)
    w = cfg.resolved_window_size_native(n)  # serial-CPU-appropriate window
    planes, words, expected = build_inputs(n)
    scalars = []
    for i in range(n):
        v = 0
        for wd in range(8):
            v |= int(words[wd, i]) << (32 * wd)
        scalars.append(v)
    b = base_point()
    pts = [b] * n
    t0 = time.perf_counter()
    res = omsm.msm(pts, scalars, window_size=w)
    took = time.perf_counter() - t0
    got = curve.to_affine(res)
    return {
        "n": n,
        "window": w,
        "cpu_s": took,
        "points_per_s": n / took,
        "bit_exact": bool(got == expected),
    }


def measure_native_baseline(n_pow: int, window: int | None) -> dict:
    """Single-thread NATIVE CPU reference: the C++ 4x64 CIOS Pippenger
    (runtime/csrc/msm_cpu.cpp) run with 1 thread — the honest analog of the
    reference's arkworks `cpuWorkRatio=1` path (msm-wasm/src/lib.rs:106-121,
    run single-threaded per BASELINE.md). Wire inputs so marshalling is
    vectorized and the clock measures the MSM, not Python."""
    from webgpu_msm_tpu.config import MSMConfig
    from webgpu_msm_tpu.engines import cpu_engine

    n = 1 << n_pow
    cfg = MSMConfig(window_size=window)
    w = cfg.resolved_window_size_native(n)  # serial-CPU-appropriate window
    points_be, scalars_be, expected = build_wire_inputs(n)
    t0 = time.perf_counter()
    got = cpu_engine.msm_wire(points_be, scalars_be, w, n_threads=1)
    took = time.perf_counter() - t0
    return {
        "n": n,
        "window": w,
        "cpu_s": took,
        "points_per_s": n / took,
        "bit_exact": bool(got == expected),
    }


DEMOX_CACHE = REPO / ".bench_demox.json"


def measure_demox_baseline(n_pow: int) -> dict:
    """The Demox `webgpu_pippenger_msm` analog row at a judged size — the
    comparator the reference's prize criterion scored against (>=10% over
    this row averaged over 2^16..2^20, README.md:112-118,
    pippengerMSMEntry.ts:54). Host c=16 bucketing (bigint group adds) +
    device 16-bit ladders + host combine; same input distribution as the
    headline clock."""
    from webgpu_msm_tpu.config import MSMConfig
    from webgpu_msm_tpu.engines import baseline_engine
    from webgpu_msm_tpu.oracle import curve
    from webgpu_msm_tpu.oracle.testdata import base_point

    n = 1 << n_pow
    _, words, expected = build_inputs(n)
    scalars = []
    for i in range(n):
        v = 0
        for wd in range(8):
            v |= int(words[wd, i]) << (32 * wd)
        scalars.append(v)
    pts = [base_point()] * n
    t0 = time.perf_counter()
    got = baseline_engine.msm_affine(pts, scalars, MSMConfig())
    took = time.perf_counter() - t0
    return {
        "n": n,
        "wall_s": took,
        "points_per_s": n / took,
        "bit_exact": bool(got == expected),
    }


def get_demox_baseline(n_pow: int) -> dict | None:
    """Cached Demox-baseline row (hostname-keyed, bit_exact-gated like
    get_baseline); measuring 2^20 costs ~minutes of host bigint adds, so
    it is measured once per machine."""
    import socket

    host = socket.gethostname()
    cached = {}
    if DEMOX_CACHE.exists():
        cached = json.loads(DEMOX_CACHE.read_text())
        if cached.get("host", host) != host:
            cached = {}
    out = dict(cached)
    out["host"] = host
    key = str(n_pow)
    if out.get(key, {}).get("bit_exact") is not True:
        out[key] = measure_demox_baseline(n_pow)
    if out != cached:
        DEMOX_CACHE.write_text(json.dumps(out))
    if not out[key].get("bit_exact"):
        raise SystemExit("demox baseline measurement was not bit-exact")
    return out[key]


def get_baseline(n_pow: int, window: int | None) -> dict:
    """Both baseline anchors, cached: {"python": {...}, "native_st": {...}}.

    `native_st` (the arkworks-class single-thread C++ engine) anchors
    `vs_baseline`; the pure-Python oracle multiplier is reported separately
    as `vs_python_oracle` (round-3 verdict #3: Python flattered the ratio).

    The cache is keyed by hostname and entries must be bit_exact (round-4
    advice): a committed cache from another machine, or a measurement whose
    result was wrong, never silently anchors `vs_baseline` — it re-measures.
    """
    import socket

    host = socket.gethostname()
    n = 1 << n_pow
    cached = {}
    if BASELINE_CACHE.exists():
        cached = json.loads(BASELINE_CACHE.read_text())
        if "python" not in cached:  # legacy schema: flat python-oracle entry
            cached = {"python": cached} if cached.get("n") == n else {}
        if cached.get("host", host) != host:
            cached = {}  # cache measured on a different machine: re-anchor

    def usable(entry: dict) -> bool:
        return entry.get("n") == n and entry.get("bit_exact") is True

    out = dict(cached)
    out["host"] = host
    if not usable(out.get("python", {})):
        out["python"] = measure_cpu_baseline(n_pow, window)
    if not usable(out.get("native_st", {})):
        try:
            out["native_st"] = measure_native_baseline(n_pow, window)
        except Exception as e:  # native build unavailable: keep python anchor
            print(f"native baseline unavailable: {e}", file=sys.stderr)
            out.pop("native_st", None)
    for k in ("python", "native_st"):
        if k in out and not out[k].get("bit_exact"):
            raise SystemExit(f"baseline {k!r} measurement was not bit-exact")
    if out != cached:
        BASELINE_CACHE.write_text(json.dumps(out))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-pow", type=int, default=20)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--window", type=int, default=None)
    ap.add_argument("--skip-baseline", action="store_true")
    ap.add_argument("--skip-wall", action="store_true")
    ap.add_argument("--batch-jobs", type=int, default=2,
                    help="batched-prover jobs to measure (0 disables)")
    ap.add_argument("--fixed-jobs", type=int, default=4,
                    help="fixed-base (MSMPlan) prover jobs to measure "
                         "(0 disables)")
    ap.add_argument("--chunks", default=None, help="C,L chunking override")
    args = ap.parse_args()

    chunks = None
    if args.chunks:
        chunks = tuple(int(v) for v in args.chunks.split(","))
    dev = measure_device(args.n_pow, args.iters, args.window, chunks=chunks)
    wall = None
    batch = None
    fixed = None
    if not args.skip_wall:
        wall = measure_wall(args.n_pow, args.iters, args.window)
        if args.batch_jobs >= 2:
            batch = measure_wall_batch(args.n_pow, args.batch_jobs, args.window)
        if args.fixed_jobs >= 2:
            fixed = measure_wall_fixed_batch(
                args.n_pow, args.fixed_jobs, args.window
            )

    vs = vs_python = vs_demox = None
    base = None
    demox = None
    if not args.skip_baseline:
        base = get_baseline(args.n_pow, args.window)
        demox = get_demox_baseline(args.n_pow)
        if demox is not None and wall is not None:
            # The prize's actual comparator (>=10% over the Demox row,
            # README.md:112-118): OUR wall clock (marshalling included)
            # over ITS wall clock, same inputs — apples to apples.
            vs_demox = wall["wall_points_per_s"] / demox["points_per_s"]
        if "python" in base:
            vs_python = dev["points_per_s"] / base["python"]["points_per_s"]
        if "native_st" in base:
            # vs_baseline anchors to the single-thread NATIVE engine (the
            # arkworks-class reference, BASELINE.md ">=10x single-thread CPU
            # reference"); the python-oracle multiplier is reported alongside.
            vs = dev["points_per_s"] / base["native_st"]["points_per_s"]
        else:
            vs = vs_python

    line = {
        "metric": f"msm_2^{args.n_pow}_throughput",
        "value": round(dev["points_per_s"], 1),
        "unit": "points/s/chip",
        "vs_baseline": round(vs, 3) if vs is not None else None,
    }
    if vs_python is not None:
        line["vs_python_oracle"] = round(vs_python, 3)
    if vs_demox is not None:
        line["vs_demox_baseline"] = round(vs_demox, 3)
    if wall is not None:
        # The scoring-clock number: wall time of the full compute_msm call
        # from U32Array inputs, marshalling included (Benchmark.tsx:31-34).
        line["wall_clock_points_per_s"] = round(wall["wall_points_per_s"], 1)
    if batch is not None:
        line["batch_wall_points_per_s"] = round(batch["batch_points_per_s"], 1)
    if fixed is not None:
        # The fixed-base (SRS) prover clock: resident bases, scalars-only
        # streaming — the workload shape provers actually run (round-5 #1).
        line["fixed_base_batch_points_per_s"] = round(
            fixed["batch_points_per_s"], 1
        )
    detail = {**dev}
    detail.pop("device_s_all", None)
    if wall is not None:
        detail["wall"] = {k: v for k, v in wall.items() if k != "wall_s_all"}
    if base is not None:
        detail["baselines"] = base
    if batch is not None:
        detail["batch"] = batch
    if fixed is not None:
        detail["fixed_base_batch"] = fixed
    if demox is not None:
        detail["demox_baseline"] = demox
    print(json.dumps(line))
    print(json.dumps({"detail": detail}), file=sys.stderr)
    if (
        not dev["bit_exact"]
        or (wall is not None and not wall["bit_exact"])
        or (batch is not None and not batch["bit_exact"])
        or (fixed is not None and not fixed["bit_exact"])
    ):
        print("ERROR: result not bit-exact", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
