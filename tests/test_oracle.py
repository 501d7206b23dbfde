"""Oracle validation against the reference's pinned public test vectors.

Vector sources: FieldMath.test.ts (scalar-mul + getPointFromX tables) and the
AllBenchmarks.tsx base point — see webgpu_msm_tpu/oracle/testdata.py.
"""
import pytest

from webgpu_msm_tpu.oracle import field, curve
from webgpu_msm_tpu.oracle import msm as omsm  # noqa: F401

# `webgpu_msm_tpu.oracle.msm` the module, not the re-exported function.
import webgpu_msm_tpu.oracle.msm as omsm  # noqa: F811
from webgpu_msm_tpu.oracle import testdata


def test_base_point_on_curve_and_in_subgroup():
    b = testdata.base_point()
    assert curve.is_on_curve(b)
    assert b.t == field.fmul(b.x, b.y)
    assert curve.eq(curve.scalar_mul(b, field.SUBGROUP_ORDER), curve.IDENTITY)


@pytest.mark.parametrize("pt,scalar,expected", testdata.SCALAR_MUL_VECTORS)
def test_scalar_mul_vectors(pt, scalar, expected):
    p = curve.from_affine(*pt)
    assert curve.is_on_curve(p)
    result = curve.to_affine(curve.scalar_mul(p, scalar))
    assert result == expected


@pytest.mark.parametrize("x,expected_y", testdata.POINT_FROM_X_VECTORS)
def test_point_from_x_vectors(x, expected_y):
    p = testdata.point_from_x(x)
    assert curve.to_affine(p)[1] == expected_y


def test_add_double_consistency():
    b = testdata.base_point()
    assert curve.eq(curve.add(b, b), curve.double(b))
    # identity laws
    assert curve.eq(curve.add(b, curve.IDENTITY), b)
    assert curve.eq(curve.add(curve.IDENTITY, curve.IDENTITY), curve.IDENTITY)
    # p + (-p) == identity
    assert curve.eq(curve.add(b, curve.neg(b)), curve.IDENTITY)
    # associativity spot check
    p2 = curve.double(b)
    p3 = curve.add(p2, b)
    assert curve.eq(curve.add(curve.add(p3, p2), b), curve.add(p3, curve.add(p2, b)))


def test_scalar_mul_distributes():
    b = testdata.base_point()
    k1, k2 = 123456789123456789, 987654321987654321
    lhs = curve.scalar_mul(b, k1 + k2)
    rhs = curve.add(curve.scalar_mul(b, k1), curve.scalar_mul(b, k2))
    assert curve.eq(lhs, rhs)


@pytest.mark.parametrize("w", [8, 11, 13, 16, 20])
def test_split_scalar_roundtrip(w):
    s = 0xDEADBEEF_12345678_9ABCDEF0_0F1E2D3C_4B5A6978_87695A4B_3C2D1E0F_FEDCBA98
    digits = omsm.split_scalar(s, w)
    assert len(digits) == omsm.n_windows(w)
    recomposed = sum(d << (i * w) for i, d in enumerate(digits))
    assert recomposed == s


@pytest.mark.parametrize("w", [8, 13])
def test_oracle_msm_matches_naive(w):
    from webgpu_msm_tpu.utils import fixtures

    pts = fixtures.distinct_points(8, seed=7)
    scalars = fixtures.random_scalars(8, seed=8)
    got = omsm.msm(pts, scalars, window_size=w)
    want = omsm.msm_naive(pts, scalars)
    assert curve.eq(got, want)


def test_repeated_base_case_expected():
    from webgpu_msm_tpu.utils import fixtures

    case = fixtures.repeated_base_case(64, seed=3)
    want = omsm.msm_naive(case.points, case.scalars)
    assert curve.to_affine(want) == case.expected


def test_montgomery_constants():
    assert (field.P * field.N0_INV_32) % (1 << 32) == (1 << 32) - 1
    assert (field.P * field.N0_INV_16) % (1 << 16) == (1 << 16) - 1
    assert field.from_mont(field.to_mont(12345)) == 12345


def test_fixture_file_roundtrip(tmp_path):
    """save_test_case/load_test_case use the reference's fixture text format
    (one JSON point per line, one decimal scalar per line)."""
    from webgpu_msm_tpu.utils import fixtures

    case = fixtures.distinct_case(4, seed=42, window_size=8)
    pp, sp = tmp_path / "points.txt", tmp_path / "scalars.txt"
    fixtures.save_test_case(case, pp, sp)
    loaded = fixtures.load_test_case(pp, sp, expected=case.expected)
    assert [(p.x, p.y, p.t, p.z) for p in loaded.points] == [
        (p.x, p.y, p.t, p.z) for p in case.points
    ]
    assert loaded.scalars == case.scalars
    assert loaded.expected == case.expected
