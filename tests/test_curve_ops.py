"""Bit-exact tests of the vectorized curve layer against the oracle."""
import numpy as np
import jax.numpy as jnp
import pytest

from webgpu_msm_tpu.oracle import curve as oc
from webgpu_msm_tpu.oracle import field as F
from webgpu_msm_tpu.oracle.testdata import base_point
from webgpu_msm_tpu.ops import curve_ops, limbs, windows
from webgpu_msm_tpu.utils import convert, fixtures


def points_to_vec(points, mont=True):
    """list[ExtPoint] -> PointVec (Montgomery domain by default)."""
    if mont:
        points = [
            oc.ExtPoint(F.to_mont(p.x), F.to_mont(p.y), F.to_mont(p.t), F.to_mont(p.z))
            for p in points
        ]
    coords = convert.points_to_words_le(
        [p.x for p in points], [p.y for p in points],
        [p.t for p in points], [p.z for p in points],
    )
    arr = jnp.asarray(coords)  # [4, 8, n]
    return curve_ops.PointVec(
        limbs.from_words_le(arr[0]),
        limbs.from_words_le(arr[1]),
        limbs.from_words_le(arr[2]),
        limbs.from_words_le(arr[3]),
    )


def vec_to_points(vec: curve_ops.PointVec, mont=True):
    def coords(digits):
        return convert.words_le_to_bigints(np.asarray(limbs.to_words_le(digits)))

    xs, ys, ts, zs = coords(vec.x), coords(vec.y), coords(vec.t), coords(vec.z)
    pts = [oc.ExtPoint(x, y, t, z) for x, y, t, z in zip(xs, ys, ts, zs)]
    if mont:
        pts = [
            oc.ExtPoint(F.from_mont(p.x), F.from_mont(p.y), F.from_mont(p.t), F.from_mont(p.z))
            for p in pts
        ]
    return pts


def test_add_matches_oracle():
    pts_a = fixtures.distinct_points(8, seed=40)
    pts_b = fixtures.distinct_points(8, seed=41)
    got = vec_to_points(curve_ops.add(points_to_vec(pts_a), points_to_vec(pts_b)))
    want = [oc.add(a, b) for a, b in zip(pts_a, pts_b)]
    for g, w in zip(got, want):
        assert (g.x, g.y, g.t, g.z) == (w.x, w.y, w.t, w.z)


def test_add_unified_edge_cases():
    b = base_point()
    cases_a = [b, b, oc.IDENTITY, oc.IDENTITY, oc.neg(b)]
    cases_b = [b, oc.IDENTITY, b, oc.IDENTITY, b]
    got = vec_to_points(curve_ops.add(points_to_vec(cases_a), points_to_vec(cases_b)))
    want = [oc.add(a, bb) for a, bb in zip(cases_a, cases_b)]
    for g, w in zip(got, want):
        assert (g.x, g.y, g.t, g.z) == (w.x, w.y, w.t, w.z)


def test_add_mixed_matches_full():
    accs = [oc.double(p) for p in fixtures.distinct_points(6, seed=42)]
    fresh = fixtures.distinct_points(6, seed=43)  # z == 1
    fresh_vec = points_to_vec(fresh)
    got = vec_to_points(
        curve_ops.add_mixed(points_to_vec(accs), fresh_vec.x, fresh_vec.y, fresh_vec.t)
    )
    want = [oc.add(a, f) for a, f in zip(accs, fresh)]
    for g, w in zip(got, want):
        assert (g.x, g.y, g.t, g.z) == (w.x, w.y, w.t, w.z)


def test_double_matches_oracle():
    pts = fixtures.distinct_points(6, seed=44) + [oc.IDENTITY]
    got = vec_to_points(curve_ops.double(points_to_vec(pts)))
    want = [oc.double(p) for p in pts]
    for g, w in zip(got, want):
        assert (g.x, g.y, g.t, g.z) == (w.x, w.y, w.t, w.z)


def test_identity_vec():
    idv = curve_ops.identity((3,))
    pts = vec_to_points(idv)
    for p in pts:
        assert (p.x, p.y, p.t, p.z) == (0, 1, 0, 1)


@pytest.mark.parametrize("w", [8, 13, 16, 20])
def test_split_windows_matches_oracle(w):
    from webgpu_msm_tpu.oracle.msm import split_scalar

    scalars = fixtures.random_scalars(32, seed=50) + [0, 1, (1 << 256) - 1]
    words = jnp.asarray(convert.bigints_to_words_le(scalars))
    got = np.asarray(windows.split_windows(words, w))
    for i, s in enumerate(scalars):
        assert got[:, i].tolist() == split_scalar(s, w), f"scalar {i}"
