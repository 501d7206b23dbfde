#!/usr/bin/env python
"""Generate + pin full-size (2^16..2^20) expected MSM results on TPU.

The reference pins expected affine results for its 2^16..2^20 fixtures
(src/test-data/testCases.ts:12-31). Its input files are unhydrated LFS
pointers in this checkout, so this repo pins its own deterministic
fixtures instead (see webgpu_msm_tpu/oracle/pinned_vectors.py):

  points  = fixtures.distinct_points_fast(1 << power, seed=power)
  scalars = fixtures.random_scalars(1 << power, seed=1000 + power)

For each power this script runs the TPU engine, cross-checks 2^16 against
BOTH the pure-Python oracle and the native C++ engine (three independent
implementations), and prints the PINNED dict to paste into
pinned_vectors.py.

Usage: python scripts/pin_vectors.py [--powers 16,17,18,19,20]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--powers", default="16,17,18,19,20")
    ap.add_argument("--cross-check-power", type=int, default=16)
    args = ap.parse_args()
    powers = [int(p) for p in args.powers.split(",")]

    import webgpu_msm_tpu as m
    from webgpu_msm_tpu.oracle import msm as omsm
    from webgpu_msm_tpu.oracle import curve
    from webgpu_msm_tpu.utils import fixtures
    from webgpu_msm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    pinned = {}
    for power in powers:
        n = 1 << power
        t0 = time.time()
        pts = fixtures.distinct_points_fast(n, seed=power)
        scalars = fixtures.random_scalars(n, seed=1000 + power)
        print(f"2^{power}: fixtures in {time.time()-t0:.1f}s", flush=True)

        t0 = time.time()
        got = m.compute_msm(pts, scalars, engine="tpu")
        print(f"2^{power}: tpu engine in {time.time()-t0:.1f}s -> "
              f"x={got.x}", flush=True)
        pinned[power] = (got.x, got.y)

        if power == args.cross_check_power:
            t0 = time.time()
            want = curve.to_affine(omsm.msm(pts, scalars, 13))
            assert (got.x, got.y) == want, f"oracle mismatch at 2^{power}"
            print(f"2^{power}: oracle cross-check OK "
                  f"({time.time()-t0:.1f}s)", flush=True)
            try:
                t0 = time.time()
                cpu = m.compute_msm(pts, scalars, engine="cpu")
                assert (cpu.x, cpu.y) == want, f"C++ mismatch at 2^{power}"
                print(f"2^{power}: C++ engine cross-check OK "
                      f"({time.time()-t0:.1f}s)", flush=True)
            except Exception as e:  # no toolchain: report, don't pin less
                print(f"2^{power}: C++ cross-check unavailable: {e}",
                      flush=True)

    print("\nPINNED = {")
    for power, (x, y) in sorted(pinned.items()):
        print(f"    {power}: (\n        {x},\n        {y},\n    ),")
    print("}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
