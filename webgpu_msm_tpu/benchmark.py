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
    rng = np.random.default_rng(seed)
    raw = rng.integers(0, 1 << 32, size=(n, 8), dtype=np.uint64)
    raw[:, 0] &= 0x1FFFFFFF  # < 2^253 (row-major BE-ish; only sum matters)
    scalars = []
    for i in range(n):
        v = 0
        for w in range(8):
            v = (v << 32) | int(raw[i, w])
        scalars.append(v)
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="16", help="comma-separated log2 sizes")
    ap.add_argument("--engines", default="tpu", help="tpu,cpu,hybrid,oracle,naive")
    ap.add_argument("--csv", default=None, help="write rows to CSV file")
    ap.add_argument(
        "--window-sweep",
        action="store_true",
        help="sweep all supported window sizes (DESIGN.md:28-31)",
    )
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]
    engines = args.engines.split(",")
    windows = list(SUPPORTED_WINDOW_SIZES) if args.window_sweep else None

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
