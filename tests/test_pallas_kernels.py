"""Pallas kernel tests (interpret mode on CPU — the fake-device tier).

Interpret mode lowers the ~20k-instruction kernels through XLA:CPU, which
compiles for minutes; these run under `-m slow` (or on real TPU via
scripts/tpu_check.py). The default suite covers the same math through the
jnp pipeline.
"""
import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from webgpu_msm_tpu.oracle import curve as oc
from webgpu_msm_tpu.oracle import field as F
from webgpu_msm_tpu.ops.pallas import padd_kernels as pk
from webgpu_msm_tpu.utils import convert, fixtures

W = pk.TILE  # 1024


def pts_to_stacked(points, width=W):
    """list[ExtPoint] (cycled to width) -> [4, 16, width] Montgomery stacked."""
    pts = [points[i % len(points)] for i in range(width)]
    arr = np.zeros((4, 16, width), dtype=np.uint32)
    for i, p in enumerate(pts):
        for c, v in enumerate((p.x, p.y, p.t, p.z)):
            mv = F.to_mont(v)
            for d in range(16):
                arr[c, d, i] = (mv >> (16 * d)) & 0xFFFF
    return jnp.asarray(arr), pts


def stacked_to_pts(arr):
    arr = np.asarray(arr)
    out = []
    for i in range(arr.shape[-1]):
        coords = []
        for c in range(4):
            v = 0
            for d in reversed(range(16)):
                v = (v << 16) | int(arr[c, d, i])
            coords.append(F.from_mont(v))
        out.append(oc.ExtPoint(*coords))
    return out


def test_padd_kernel_matches_oracle():
    pa = fixtures.distinct_points(5, seed=90) + [oc.IDENTITY]
    pb = fixtures.distinct_points(5, seed=91) + [oc.IDENTITY]
    a_st, pa_full = pts_to_stacked(pa)
    b_st, pb_full = pts_to_stacked(pb)
    got = stacked_to_pts(pk.padd(a_st, b_st))[:12]
    for g, (x, y) in zip(got, zip(pa_full, pb_full)):
        w = oc.add(x, y)
        assert (g.x, g.y, g.t, g.z) == (w.x, w.y, w.t, w.z)


def test_padd_masked_kernel():
    pa = fixtures.distinct_points(4, seed=92)
    pb = fixtures.distinct_points(4, seed=93)
    a_st, pa_full = pts_to_stacked(pa)
    b_st, pb_full = pts_to_stacked(pb)
    mask = jnp.asarray((np.arange(W) % 2).astype(np.uint32))
    got = stacked_to_pts(pk.padd_masked(a_st, b_st, mask))[:8]
    for i, g in enumerate(got):
        w = oc.add(pa_full[i], pb_full[i]) if i % 2 == 1 else pa_full[i]
        assert (g.x, g.y, g.t, g.z) == (w.x, w.y, w.t, w.z)


def test_grouped_running_sum_kernel():
    """T = sum_r s[r], U = sum_r r*s[r] per lane (bucket-reduction core)."""
    Gs = 3
    base = fixtures.distinct_points(2 * Gs, seed=96)
    slices, full = [], []
    for r in range(Gs):
        st, pts = pts_to_stacked(base[2 * r : 2 * r + 2])
        slices.append(st)
        full.append(pts)
    s = jnp.stack(slices)  # [Gs, 4, 16, W]
    T, U = pk.grouped_running_sum(s)
    t_pts = stacked_to_pts(T)[:4]
    u_pts = stacked_to_pts(U)[:4]
    for i in range(4):
        t_exp = oc.IDENTITY
        u_exp = oc.IDENTITY
        for r in range(Gs):
            t_exp = oc.add(t_exp, full[r][i])
            u_exp = oc.add(u_exp, oc.scalar_mul(full[r][i], r))
        assert oc.to_affine(t_pts[i]) == oc.to_affine(t_exp), f"T lane {i}"
        assert oc.to_affine(u_pts[i]) == oc.to_affine(u_exp), f"U lane {i}"


def test_fused_reduce_matches_fallback():
    """TPU reduce_buckets path (two grouped-scan kernel passes) == fallback.

    Compared as affine points: addition orders differ, so projective
    coordinates legitimately diverge."""
    import jax.numpy as jnp
    from webgpu_msm_tpu.ops import pippenger

    K, B = 2, 64
    n = K * B
    pts = fixtures.distinct_points(n, seed=97)
    st, _ = pts_to_stacked(pts, width=n)
    bs = st.reshape(4, 16, K, B)
    ref = pippenger.reduce_buckets(bs, group_size=16)
    orig = pippenger._use_pallas
    pippenger._use_pallas = lambda n: True
    try:
        fused = pippenger.reduce_buckets(bs, group_size=16)
    finally:
        pippenger._use_pallas = orig
    assert [oc.to_affine(p) for p in stacked_to_pts(ref)] == [
        oc.to_affine(p) for p in stacked_to_pts(fused)
    ]


def test_scan_step_kernel():
    accs = [oc.double(p) for p in fixtures.distinct_points(4, seed=94)]
    fresh = fixtures.distinct_points(4, seed=95)
    acc_st, acc_full = pts_to_stacked(accs)
    pts_st_full, fresh_full = pts_to_stacked(fresh)
    pts_st = pts_st_full[:3]
    acc_id = jnp.asarray((np.arange(W) % 4).astype(np.uint32))
    ids = jnp.asarray((np.arange(W) % 2).astype(np.uint32))
    nacc, nid, staged = pk.scan_step(acc_st, acc_id, pts_st, ids)
    got = stacked_to_pts(nacc)[:8]
    staged_pts = stacked_to_pts(staged)[:8]
    assert np.array_equal(np.asarray(nid), np.asarray(ids))
    for i, g in enumerate(got):
        same = (i % 4) == (i % 2)
        if same:
            w = oc.add(acc_full[i], fresh_full[i])
        else:
            w = oc.ExtPoint(fresh_full[i].x, fresh_full[i].y, fresh_full[i].t, 1)
        assert (g.x, g.y, g.t, g.z) == (w.x, w.y, w.t, w.z), f"lane {i} same={same}"
        s = staged_pts[i]
        a = acc_full[i]
        assert (s.x, s.y, s.t, s.z) == (a.x, a.y, a.t, a.z)
