"""End-to-end single-chip MSM vs the oracle (bit-exact).

The TPU-build analog of the reference's in-browser correctness harness
(testCases.ts pinned results + the live Aleo oracle, SURVEY.md §4.3), run on
the CPU backend with small shapes.
"""
import numpy as np
import pytest

import webgpu_msm_tpu as m
from webgpu_msm_tpu import MSMConfig
from webgpu_msm_tpu.oracle import curve
from webgpu_msm_tpu.utils import fixtures


@pytest.mark.parametrize("n,w,C,L", [
    (64, 8, 8, 8),
    # padding AND multi-batch exercised (100 pads to 2 x 64-point batches)
    # on the same (8, 8, 8) program every other test compiles — distinct
    # (C, L) configs each cost minutes of XLA:CPU compile cold (round 4)
    (100, 8, 8, 8),
])
def test_tpu_engine_matches_oracle_distinct(n, w, C, L):
    pts = fixtures.distinct_points(n, seed=60 + n)
    scalars = fixtures.random_scalars(n, seed=70 + n)
    cfg = MSMConfig(window_size=w, n_chunks=C, chunk_len=L)
    got = m.compute_msm(pts, scalars, config=cfg, engine="tpu")
    want = m.compute_msm(pts, scalars, config=MSMConfig(window_size=w), engine="oracle")
    assert (got.x, got.y) == (want.x, want.y)


def test_tpu_engine_repeated_base():
    case = fixtures.repeated_base_case(128, seed=80)
    cfg = MSMConfig(window_size=8, n_chunks=8, chunk_len=8)  # 2 batches
    got = m.compute_msm(case.points, case.scalars, config=cfg, engine="tpu")
    assert (got.x, got.y) == case.expected


def test_tpu_engine_adversarial_scalars():
    """Skewed digit distributions: all-equal scalars (one giant bucket run
    spanning every chunk), zeros, max scalars — the worst cases for the
    segmented-scan design."""
    b = fixtures.base_point()
    n = 64
    pts = [b] * n
    for scal in [
        [12345] * n,                      # one bucket gets everything
        [0] * n,                          # all zero digits
        [(1 << 253) - 1] * n,             # all-ones digits
        list(range(n)),                   # dense small buckets
    ]:
        cfg = MSMConfig(window_size=8, n_chunks=8, chunk_len=8)
        got = m.compute_msm(pts, scal, config=cfg, engine="tpu")
        want = m.compute_msm(pts, scal, config=MSMConfig(window_size=8), engine="oracle")
        assert (got.x, got.y) == (want.x, want.y), f"scalars={scal[:3]}..."


def test_tpu_engine_signed_digits():
    """Signed (balanced) digit mode: negated-point buckets, bucket range
    2^(w-1)+1; must agree bit-exactly with the unsigned oracle result."""
    pts = fixtures.distinct_points(64, seed=91)
    scalars = fixtures.random_scalars(64, seed=92)
    cfg = MSMConfig(window_size=8, n_chunks=8, chunk_len=8, signed_digits=True)
    got = m.compute_msm(pts, scalars, config=cfg, engine="tpu")
    want = m.compute_msm(pts, scalars, config=MSMConfig(window_size=8), engine="oracle")
    assert (got.x, got.y) == (want.x, want.y)


def test_tpu_engine_signed_adversarial():
    """All digits at the +/- boundary: scalars of repeated 2^(w-1) digits
    force every recode branch (carry chains through all windows)."""
    b = fixtures.base_point()
    n = 64
    w = 8
    half_pattern = 0
    for k in range(31):  # 248 bits of digit 128 = 0x80 repeating
        half_pattern |= 0x80 << (8 * k)
    cfg = MSMConfig(window_size=w, n_chunks=8, chunk_len=8, signed_digits=True)
    for scal in [[half_pattern] * n, [(1 << 253) - 1] * n, [0] * n]:
        got = m.compute_msm([b] * n, scal, config=cfg, engine="tpu")
        want = m.compute_msm([b] * n, scal, config=MSMConfig(window_size=w), engine="oracle")
        assert (got.x, got.y) == (want.x, want.y)


def test_tpu_engine_single_point():
    b = fixtures.base_point()
    cfg = MSMConfig(window_size=8, n_chunks=8, chunk_len=8)
    got = m.compute_msm([b], [987654321], config=cfg, engine="tpu")
    want = curve.to_affine(curve.scalar_mul(b, 987654321))
    assert (got.x, got.y) == want


def test_tpu_engine_device_affine():
    """config.device_affine: window sums converted to affine ON DEVICE
    (batched finv_mont finish stage) must stay bit-exact on every input
    path — planes, wire, and the fixed-base plan."""
    pts = fixtures.distinct_points(64, seed=91)
    scalars = fixtures.random_scalars(64, seed=92)
    cfg = MSMConfig(window_size=8, n_chunks=8, chunk_len=8, device_affine=True)
    want = m.compute_msm(pts, scalars, config=MSMConfig(window_size=8),
                         engine="oracle")
    got = m.compute_msm(pts, scalars, config=cfg, engine="tpu")
    assert (got.x, got.y) == (want.x, want.y)

    from webgpu_msm_tpu.utils import convert

    pw = np.zeros((64, 32), np.uint32)
    pw[:, 0:8] = convert.bigints_to_u32_be([p.x for p in pts])
    pw[:, 8:16] = convert.bigints_to_u32_be([p.y for p in pts])
    pw[:, 16:24] = convert.bigints_to_u32_be([p.t for p in pts])
    pw[:, 31] = 1
    sw = convert.bigints_to_u32_be(scalars)
    got_wire = m.compute_msm(pw, sw, config=cfg, engine="tpu")
    assert (got_wire.x, got_wire.y) == (want.x, want.y)

    plan = m.MSMPlan(pw, config=cfg, engine="tpu")
    got_plan = plan.msm(sw)
    assert (got_plan.x, got_plan.y) == (want.x, want.y)
