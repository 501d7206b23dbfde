#!/usr/bin/env python
"""Independently verify the pinned 2^16..2^20 MSM vectors (round-5 item).

The reference's pinned expected results came from an oracle *independent*
of the submission under test (Aleo wasm; src/test-data/testCases.ts:12-31,
README.md:108). Round 4's verdict flagged that this repo's PINNED[17..20]
were produced by the TPU engine and cross-checked only at 2^16 — circular
for the engine at the sizes that matter.

This script recomputes EVERY pinned power with the two implementations
that share no code with the TPU engine:

- the native C++ engine (runtime/csrc/msm_cpu.cpp — 4x64 CIOS Montgomery,
  hwcd add/double), single-thread and default-thread runs
- the pure-Python bigint oracle (oracle/{field,curve,msm}.py)

and asserts agreement with oracle/pinned_vectors.PINNED. Output is a JSON
artifact (stdout) recording per-power results + timings; the driver-facing
copy lives at PINNED_VERIFY_r05.json.

Usage: python scripts/verify_pinned.py [--powers 16,17,18,19,20] [--skip-oracle]
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--powers", default="16,17,18,19,20")
    ap.add_argument("--skip-oracle", action="store_true",
                    help="only run the native C++ verification")
    args = ap.parse_args()
    powers = [int(p) for p in args.powers.split(",")]

    from webgpu_msm_tpu.config import best_window_size
    from webgpu_msm_tpu.engines import cpu_engine
    from webgpu_msm_tpu.oracle import curve
    from webgpu_msm_tpu.oracle import msm as omsm
    from webgpu_msm_tpu.oracle.pinned_vectors import PINNED
    from webgpu_msm_tpu.utils import fixtures

    report = {"powers": {}, "ok": True}
    for power in powers:
        n = 1 << power
        want = PINNED[power]
        row = {}
        t0 = time.time()
        pts = fixtures.distinct_points_fast(n, seed=power)
        scalars = fixtures.random_scalars(n, seed=1000 + power)
        row["fixtures_s"] = round(time.time() - t0, 1)
        print(f"2^{power}: fixtures in {row['fixtures_s']}s", flush=True)

        w = best_window_size(n)
        t0 = time.time()
        got_st = cpu_engine.msm_window_partial(pts, scalars, w, n_threads=1)
        row["native_st_s"] = round(time.time() - t0, 1)
        row["native_st_ok"] = got_st == want
        print(f"2^{power}: native C++ (1 thread, w={w}) in "
              f"{row['native_st_s']}s ok={row['native_st_ok']}", flush=True)

        t0 = time.time()
        got_mt = cpu_engine.msm_window_partial(pts, scalars, w, n_threads=0)
        row["native_mt_s"] = round(time.time() - t0, 1)
        row["native_mt_ok"] = got_mt == want
        print(f"2^{power}: native C++ (all threads) in "
              f"{row['native_mt_s']}s ok={row['native_mt_ok']}", flush=True)

        if not args.skip_oracle:
            t0 = time.time()
            got_py = curve.to_affine(omsm.msm(pts, scalars, 13))
            row["oracle_s"] = round(time.time() - t0, 1)
            row["oracle_ok"] = got_py == want
            print(f"2^{power}: python oracle in {row['oracle_s']}s "
                  f"ok={row['oracle_ok']}", flush=True)

        report["powers"][power] = row
        report["ok"] &= all(v for k, v in row.items() if k.endswith("_ok"))

    print(json.dumps(report))
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
