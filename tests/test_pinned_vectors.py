"""Full-size pinned vectors (the reference's testCases.ts:12-31 analog).

The default suite verifies the fixture generators are stable (the pinned
results are only meaningful if inputs regenerate exactly) and checks the
smallest pinned power against the oracle under `-m slow`; on a real TPU
backend (MSM_TEST_TPU=1) the TPU engine is checked against every pinned
power it can afford.
"""
import os

import numpy as np
import pytest

from webgpu_msm_tpu.oracle import curve
from webgpu_msm_tpu.oracle.pinned_vectors import PINNED
from webgpu_msm_tpu.utils import fixtures


def test_pinned_table_shape():
    assert sorted(PINNED) == [16, 17, 18, 19, 20]
    from webgpu_msm_tpu.oracle import field

    for power, (x, y) in PINNED.items():
        assert 0 < x < field.P and 0 < y < field.P


def test_fixture_generators_are_stable():
    """The pinned results are anchored to these exact generator outputs."""
    from webgpu_msm_tpu.oracle import field

    pts = fixtures.distinct_points_fast(4, seed=16)
    assert pts[0].x == (
        2461424691660256948582633390543612316570179802032036789488325319035036942379
    ), "distinct_points_fast(seed=16) changed — pinned vectors invalidated"
    sc = fixtures.random_scalars(2, seed=1016)
    assert sc[0] == (
        6743160807163218321907017891051357694302486557592168776106437157091669424322
    ), "random_scalars(seed=1016) changed — pinned vectors invalidated"
    # well-formed extended affine, distinct points, all on the curve
    assert len({p.x for p in pts}) == len(pts)
    for p in pts:
        assert p.z == 1 and p.t == p.x * p.y % field.P
        assert curve.is_on_curve(p)


@pytest.mark.slow
def test_pinned_2_16_vs_oracle():
    from webgpu_msm_tpu.oracle import msm as omsm

    n = 1 << 16
    pts = fixtures.distinct_points_fast(n, seed=16)
    scalars = fixtures.random_scalars(n, seed=1016)
    got = curve.to_affine(omsm.msm(pts, scalars, 13))
    assert got == PINNED[16]


@pytest.mark.slow
@pytest.mark.parametrize("power", [17, 20])
def test_pinned_independent_of_tpu_engine(power):
    """The pinned values must hold against an implementation sharing no code
    with the TPU engine (round-4 verdict #1: circular provenance). The
    native C++ engine verifies a large power in seconds; the FULL sweep —
    all five powers x {C++ single-thread, C++ multi-thread, python oracle} —
    is scripts/verify_pinned.py (artifact PINNED_VERIFY_r05.json)."""
    from webgpu_msm_tpu.config import best_window_size
    from webgpu_msm_tpu.engines import cpu_engine

    n = 1 << power
    pts = fixtures.distinct_points_fast(n, seed=power)
    scalars = fixtures.random_scalars(n, seed=1000 + power)
    got = cpu_engine.msm_window_partial(
        pts, scalars, best_window_size(n), n_threads=1
    )
    assert got == PINNED[power]


@pytest.mark.slow
@pytest.mark.skipif(
    os.environ.get("MSM_TEST_TPU") != "1",
    reason="full-size engine check needs the real TPU backend",
)
@pytest.mark.parametrize("power", [16, 18, 20])
def test_pinned_vs_tpu_engine(power):
    import webgpu_msm_tpu as m

    n = 1 << power
    pts = fixtures.distinct_points_fast(n, seed=power)
    scalars = fixtures.random_scalars(n, seed=1000 + power)
    got = m.compute_msm(pts, scalars, engine="tpu")
    assert (got.x, got.y) == PINNED[power]
