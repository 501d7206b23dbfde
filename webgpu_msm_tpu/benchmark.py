"""Benchmark harness: the reference's AllBenchmarks UI + CSV export, as a CLI.

Runs each engine over a set of input sizes, checks results against the exact
expected value (repeated-base cases have O(1) expected results: sum(s_i)*B,
the distribution the reference's random-input mode uses,
AllBenchmarks.tsx:107-143), and collects `[inputSize, msmFunc, timeMS]` rows
(Benchmark.tsx:29-39) with a CSV export (CSVExportButton.tsx:13-23).

    python -m webgpu_msm_tpu.benchmark --sizes 16,18,20 --engines tpu,cpu \
        --csv results.csv [--window-sweep]
"""
from __future__ import annotations

import argparse
import csv
import sys
import time

import numpy as np

from . import compute_msm
from .config import MSMConfig, SUPPORTED_WINDOW_SIZES
from .oracle import curve, field
from .oracle.testdata import base_point


def _case(n: int, seed: int = 99):
    from .utils import convert

    rng = np.random.default_rng(seed)
    raw = rng.integers(0, 1 << 32, size=(n, 8), dtype=np.uint64)
    raw[:, 0] &= 0x1FFFFFFF  # < 2^253 (row-major BE-ish; only sum matters)
    scalars = convert.u32_be_to_bigints(raw.astype(np.uint32))
    b = base_point()
    expected = curve.to_affine(curve.scalar_mul(b, sum(scalars)))
    return [b] * n, scalars, expected


def run(
    sizes: list[int],
    engines: list[str],
    windows: list[int] | None = None,
    iters: int = 1,
) -> list[dict]:
    rows = []
    for n_pow in sizes:
        n = 1 << n_pow
        points, scalars, expected = _case(n)
        for engine in engines:
            for w in windows or [None]:
                cfg = MSMConfig(window_size=w)
                try:
                    t0 = time.perf_counter()
                    res = compute_msm(points, scalars, config=cfg, engine=engine)
                    ms = (time.perf_counter() - t0) * 1000
                    ok = (res.x, res.y) == expected
                except Exception as e:  # report, keep sweeping
                    ms, ok = float("nan"), False
                    print(f"  ERROR {engine} n=2^{n_pow} w={w}: {e}", file=sys.stderr)
                label = engine if w is None else f"{engine}(w={w})"
                rows.append(
                    {
                        "inputSize": n_pow,
                        "msmFunc": label,
                        "timeMS": round(ms, 2),
                        "correct": ok,
                    }
                )
                mark = "✓" if ok else "✗"
                print(f"2^{n_pow:<3d} {label:20s} {ms:10.1f} ms  {mark}")
    return rows


def _wire_case(n: int, seed: int = 99):
    """Repeated-base wire-format inputs ([n,32], [n,8] BE u32) + expected."""
    from .utils import convert

    points, scalars, expected = _case(n, seed)
    b = points[0]
    row = convert.bigints_to_u32_be(
        [b.x % field.P, b.y % field.P, b.t % field.P, 1]
    ).reshape(32)
    pw = np.broadcast_to(row, (n, 32)).copy()
    sw = convert.bigints_to_u32_be(scalars)
    return pw, sw, expected


def run_ratio_sweep(
    n_pow: int,
    ratios: list[float],
    iters: int = 3,
) -> list[dict]:
    """cpuWorkRatio sweep on wire inputs: measures whether any CPU/TPU
    co-compute split beats TPU-only on this host (the reference's variant
    priority: co-compute > GPU-only > CPU-only, DESIGN.md:7-20). Wire
    inputs so marshalling is vectorized on both halves."""
    n = 1 << n_pow
    pw, sw, expected = _wire_case(n)
    rows = []
    for ratio in ratios:
        cfg = MSMConfig(cpu_work_ratio=ratio)
        engine = "hybrid" if 0 < ratio else "tpu"
        label = f"hybrid(ratio={ratio})" if 0 < ratio else "tpu"
        try:
            res = compute_msm(pw, sw, config=cfg, engine=engine)  # warm-up
            times = []
            for _ in range(iters):
                t0 = time.perf_counter()
                res = compute_msm(pw, sw, config=cfg, engine=engine)
                times.append(time.perf_counter() - t0)
            ms = float(np.median(times)) * 1000
            ok = (res.x, res.y) == expected
        except Exception as e:
            ms, ok = float("nan"), False
            print(f"  ERROR ratio={ratio}: {e}", file=sys.stderr)
        rows.append(
            {
                "inputSize": n_pow,
                "msmFunc": label,
                "timeMS": round(ms, 2),
                "correct": ok,
            }
        )
        mark = "✓" if ok else "✗"
        print(f"2^{n_pow:<3d} {label:20s} {ms:10.1f} ms  {mark}")
    best = min((r for r in rows if r["correct"]), key=lambda r: r["timeMS"])
    print(f"best split: {best['msmFunc']} at {best['timeMS']} ms")
    return rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="16", help="comma-separated log2 sizes")
    ap.add_argument(
        "--engines", default="tpu",
        help="tpu,cpu,hybrid,oracle,naive,baseline (baseline = the Demox "
        "webgpu_pippenger_msm analog, the reference's >=10%%-bar row)",
    )
    ap.add_argument("--csv", default=None, help="write rows to CSV file")
    ap.add_argument(
        "--window-sweep",
        action="store_true",
        help="sweep all supported window sizes (DESIGN.md:28-31)",
    )
    ap.add_argument(
        "--ratio-sweep",
        action="store_true",
        help="sweep cpu_work_ratio splits on wire inputs (DESIGN.md:7-20)",
    )
    ap.add_argument(
        "--scaling",
        action="store_true",
        help="multi-chip scaling report: analytic ICI payload model + "
        "virtual-mesh weak-scaling trend (parallel/scaling.py)",
    )
    args = ap.parse_args()

    if args.scaling:
        # subprocess: the virtual 8-device CPU mesh needs XLA_FLAGS set
        # before the backend initializes.
        import os
        import subprocess

        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()
        return subprocess.call(
            [sys.executable, "-m", "webgpu_msm_tpu.parallel.scaling"], env=env
        )
    sizes = [int(s) for s in args.sizes.split(",")]
    engines = args.engines.split(",")
    windows = list(SUPPORTED_WINDOW_SIZES) if args.window_sweep else None

    if args.ratio_sweep:
        rows = []
        for n_pow in sizes:
            rows += run_ratio_sweep(
                n_pow, [0.0, 0.02, 0.05, 0.1, 0.2, 0.5, 1.0]
            )
    else:
        rows = run(sizes, engines, windows)
    if args.csv:
        with open(args.csv, "w", newline="") as f:
            writer = csv.DictWriter(
                f, fieldnames=["inputSize", "msmFunc", "timeMS", "correct"]
            )
            writer.writeheader()
            writer.writerows(rows)
        print(f"wrote {len(rows)} rows to {args.csv}")
    return 0 if all(r["correct"] for r in rows) else 1


if __name__ == "__main__":
    sys.exit(main())
