"""Engine parity: native C++ CPU engine, hybrid co-compute, batch API.

The reference's execution variants (cpuWorkRatio ∈ {0, 0.2, 1}, DESIGN.md:
7-34) all must agree bit-exactly; here each engine is checked against the
oracle on the same inputs (SURVEY.md §4 tier-3 analog).
"""
import numpy as np
import pytest

import webgpu_msm_tpu as m
from webgpu_msm_tpu import MSMConfig
from webgpu_msm_tpu.oracle import curve
from webgpu_msm_tpu.utils import fixtures


@pytest.fixture(scope="module")
def case():
    pts = fixtures.distinct_points(96, seed=21)
    scalars = fixtures.random_scalars(96, seed=22)
    want = m.compute_msm(pts, scalars, config=MSMConfig(window_size=8), engine="oracle")
    return pts, scalars, (want.x, want.y)


def test_cpu_engine_matches_oracle(case):
    pts, scalars, want = case
    got = m.compute_msm(pts, scalars, config=MSMConfig(window_size=8), engine="cpu")
    assert (got.x, got.y) == want


def test_cpu_engine_window_sweep(case):
    pts, scalars, want = case
    for w in (10, 13, 16):
        got = m.compute_msm(pts, scalars, config=MSMConfig(window_size=w), engine="cpu")
        assert (got.x, got.y) == want, f"w={w}"


def test_hybrid_engine_cpu_only(case):
    pts, scalars, want = case
    cfg = MSMConfig(window_size=8, cpu_work_ratio=1.0)
    got = m.compute_msm(pts, scalars, config=cfg, engine="hybrid")
    assert (got.x, got.y) == want


def test_hybrid_engine_split(case):
    """Co-compute split: CPU share + device share joined by one affine add."""
    pts, scalars, want = case
    # n_tpu = 72 pads to two 64-point batches: exercises the batched
    # accumulation scan (n_batches > 1) on CPU as well.
    cfg = MSMConfig(window_size=8, cpu_work_ratio=0.25, n_chunks=8, chunk_len=8)
    got = m.compute_msm(pts, scalars, config=cfg, engine="hybrid")
    assert (got.x, got.y) == want


@pytest.mark.slow
def test_naive_engine_matches_oracle():
    """Naive double-and-add baseline row (naiveMSMEntry.ts analog).
    slow: the 256-step ladder costs minutes of XLA:CPU compile cold."""
    pts = fixtures.distinct_points(8, seed=31)
    scalars = fixtures.random_scalars(8, seed=32)
    want = m.compute_msm(pts, scalars, engine="oracle")
    got = m.compute_msm(pts, scalars, engine="naive")
    assert (got.x, got.y) == (want.x, want.y)


def test_baseline_engine_matches_oracle():
    """Demox-baseline analog (pippengerMSMEntry.ts:54): host c=16
    bucketing + device 16-bit scalar mults + host combine. Includes a
    bucket collision (two points sharing a window digit)."""
    pts = fixtures.distinct_points(8, seed=41)
    scalars = fixtures.random_scalars(8, seed=42)
    # force a collision in window 0: same low-16-bit digit on two scalars
    scalars[1] = (scalars[1] & ~0xFFFF) | (scalars[0] & 0xFFFF)
    want = m.compute_msm(pts, scalars, engine="oracle")
    got = m.compute_msm(pts, scalars, engine="baseline")
    assert (got.x, got.y) == (want.x, want.y)


def test_point_add_affine_identity_cases():
    from webgpu_msm_tpu.engines import cpu_engine

    b = fixtures.base_point()
    ax, ay = curve.to_affine(b)
    # P + identity (0, 1)
    assert cpu_engine.add_affine((ax, ay), (0, 1)) == (ax, ay)
    # P + P == double
    dbl = curve.to_affine(curve.double(b))
    assert cpu_engine.add_affine((ax, ay), (ax, ay)) == dbl


def test_batch_api(case):
    pts, scalars, want = case
    cfg = MSMConfig(window_size=8, n_chunks=8, chunk_len=8)
    sub = (pts[:64], scalars[:64])
    res = m.compute_msm_batch([sub[0], sub[0]], [sub[1], sub[1]], config=cfg)
    single = m.compute_msm(sub[0], sub[1], config=cfg, engine="tpu")
    assert len(res) == 2
    assert (res[0].x, res[0].y) == (single.x, single.y)
    assert (res[1].x, res[1].y) == (single.x, single.y)


def test_batch_api_engine_routing(case):
    """compute_msm_batch honors engine= and cpu_work_ratio like compute_msm
    (round-4 verdict #6: the batch path silently dropped the co-compute
    knob and always ran the TPU engine)."""
    pts, scalars, want = case
    sub_p, sub_s = pts[:64], scalars[:64]

    # explicit non-TPU engine routes per job (here: the pure-Python oracle)
    res = m.compute_msm_batch(
        [sub_p, sub_p], [sub_s, sub_s],
        config=MSMConfig(window_size=8), engine="oracle",
    )
    single = m.compute_msm(sub_p, sub_s, config=MSMConfig(window_size=8),
                           engine="oracle")
    assert all((r.x, r.y) == (single.x, single.y) for r in res)

    # cpu_work_ratio > 0 routes through the hybrid co-compute split, same
    # as the single-call path
    cfg = MSMConfig(window_size=8, cpu_work_ratio=0.25, n_chunks=8, chunk_len=8)
    res = m.compute_msm_batch([sub_p], [sub_s], config=cfg)
    hybrid = m.compute_msm(sub_p, sub_s, config=cfg)
    assert (res[0].x, res[0].y) == (hybrid.x, hybrid.y)

    # length mismatch is an error, not silent zip truncation
    with pytest.raises(ValueError):
        m.compute_msm_batch([sub_p, sub_p], [sub_s], config=cfg)
