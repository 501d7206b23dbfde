"""Test-case generation and caching (the reference's `src/test-data` analog).

The reference ships LFS fixtures for 2^16..2^20 with pinned expected results
(`src/test-data/testCases.ts:12-31`); those input files are unhydrated in our
checkout, so fixtures are regenerated with the same distribution the
reference's random-input mode uses (`src/ui/AllBenchmarks.tsx:107-143`):
a fixed base point repeated n times plus uniformly random field-element
scalars. Expected results come from our oracle — for the repeated-base case
sum_i(s_i)·B == MSM, which makes exact expected values cheap at any n.

Fixtures with *distinct* points (for small n, where point/scalar mixups would
otherwise go unnoticed) are generated from deterministic scalar multiples of
the base point.
"""
from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np

from ..oracle import curve, field, msm as oracle_msm
from ..oracle.curve import ExtPoint
from ..oracle.testdata import base_point


@dataclass
class TestCase:
    points: list[ExtPoint]  # extended affine: z == 1, t == x*y
    scalars: list[int]
    expected: tuple[int, int]  # affine (x, y)


def _rng(seed: int) -> np.random.Generator:
    return np.random.default_rng(seed)


def random_scalars(n: int, seed: int = 0, bits: int = 253) -> list[int]:
    """Uniform scalars below the field modulus (reference utils.ts:81-99)."""
    rng = _rng(seed)
    out = []
    raw = rng.integers(0, 1 << 32, size=(n, 8), dtype=np.uint64)
    for i in range(n):
        v = 0
        for w in range(8):
            v = (v << 32) | int(raw[i, w])
        out.append(v % field.P)
    return out


def repeated_base_case(n: int, seed: int = 0) -> TestCase:
    """n copies of the pinned base point with random scalars; O(1) expected."""
    b = base_point()
    scalars = random_scalars(n, seed=seed)
    total = sum(scalars)
    expected = curve.to_affine(curve.scalar_mul(b, total))
    return TestCase(points=[b] * n, scalars=scalars, expected=expected)


def distinct_points(n: int, seed: int = 1) -> list[ExtPoint]:
    """n distinct subgroup points: k_i * B for deterministic pseudorandom k_i."""
    b = base_point()
    pts = []
    for i in range(n):
        k = (
            int.from_bytes(
                hashlib.sha256(f"tpu-msm-point-{seed}-{i}".encode()).digest(), "big"
            )
            % field.SUBGROUP_ORDER
        )
        p = curve.scalar_mul(b, k)
        x, y = curve.to_affine(p)
        pts.append(curve.from_affine(x, y))
    return pts


def distinct_points_fast(n: int, seed: int = 1) -> list[ExtPoint]:
    """n distinct subgroup points at full-size n (2^16..2^20 fixtures).

    `distinct_points` does a full scalar_mul per point (fine for unit-test
    sizes, ~hours at 2^20); this generates the deterministic chain
    P_i = (k0 + i)·B with one group add per point and converts to affine
    with one batched Montgomery-trick inversion. Point values don't affect
    MSM control flow (only scalars do), so chain structure costs nothing
    in coverage; distinctness still catches index mixups.
    """
    b = base_point()
    k0 = (
        int.from_bytes(
            hashlib.sha256(f"tpu-msm-chain-{seed}".encode()).digest(), "big"
        )
        % field.SUBGROUP_ORDER
    )
    p = curve.scalar_mul(b, k0)
    chain = []
    for _ in range(n):
        chain.append(p)
        p = curve.add(p, b)
    # batch inversion of the z coordinates (Montgomery's trick)
    prefix = [1] * (n + 1)
    for i, q in enumerate(chain):
        prefix[i + 1] = prefix[i] * q.z % field.P
    inv = field.finv(prefix[n])
    zinvs = [0] * n
    for i in range(n - 1, -1, -1):
        zinvs[i] = prefix[i] * inv % field.P
        inv = inv * chain[i].z % field.P
    out = []
    for q, zi in zip(chain, zinvs):
        x = q.x * zi % field.P
        y = q.y * zi % field.P
        out.append(ExtPoint(x, y, x * y % field.P, 1))
    return out


def distinct_case(n: int, seed: int = 1, window_size: int = 13) -> TestCase:
    """Distinct points + random scalars; expected via the serial oracle MSM."""
    pts = distinct_points(n, seed=seed)
    scalars = random_scalars(n, seed=seed + 1000)
    expected = curve.to_affine(oracle_msm.msm(pts, scalars, window_size))
    return TestCase(points=pts, scalars=scalars, expected=expected)


def save_test_case(case: TestCase, points_path, scalars_path) -> None:
    """Write fixture files in the reference's text format: one JSON point
    per line (x/y/t/z decimal strings) and one decimal scalar per line
    (saveTestCaseToFile.ts / testCases.ts:34-52)."""
    import json

    with open(points_path, "w") as f:
        for p in case.points:
            f.write(
                json.dumps({"x": str(p.x), "y": str(p.y), "t": str(p.t), "z": str(p.z)})
                + "\n"
            )
    with open(scalars_path, "w") as f:
        for s in case.scalars:
            f.write(f"{s}\n")


def load_test_case(points_path, scalars_path, expected=None) -> TestCase:
    """Read fixture files written by `save_test_case` (or hydrated reference
    LFS fixtures — same line format, testCases.ts:34-52). `expected` may be
    passed (the reference pins it in code); computed via the oracle if not."""
    import json

    pts = []
    with open(points_path) as f:
        for line in f:
            if not line.strip():
                continue
            d = json.loads(line)
            pts.append(
                ExtPoint(int(d["x"]), int(d["y"]), int(d["t"]), int(d.get("z", 1)))
            )
    scalars = []
    with open(scalars_path) as f:
        for line in f:
            if line.strip():
                scalars.append(int(line))
    if expected is None:
        expected = curve.to_affine(oracle_msm.msm(pts, scalars, 13))
    return TestCase(points=pts, scalars=scalars, expected=tuple(expected))
