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


def _mmul(a: int, b: int) -> int:
    """Montgomery product (operands already in the Montgomery domain)."""
    return F.from_mont(F.fmul(a, b))


def _niels_of(p):
    """Plain ExtPoint -> Montgomery Niels (y-x, y+x, 2d*t)."""
    return (
        F.to_mont(F.fsub(p.y, p.x)),
        F.to_mont(F.fadd(p.y, p.x)),
        F.to_mont(F.fmul(2 * F.EDWARDS_D, p.t)),
    )


def _niels_add_model(acc, niels):
    """Python model of the kernel's 7-mul Niels add — digit-exact."""
    x1, y1, t1, z1 = acc
    ym2, yp2, td2 = niels
    a = _mmul(F.fsub(y1, x1), ym2)
    b = _mmul(F.fadd(y1, x1), yp2)
    c = _mmul(t1, td2)
    d = F.fadd(z1, z1)
    e, f, g, h = F.fsub(b, a), F.fsub(d, c), F.fadd(d, c), F.fadd(b, a)
    return (_mmul(e, f), _mmul(g, h), _mmul(e, h), _mmul(f, g))


def _pack_niels(niels_lw):
    """[L][W] of (ym, yp, td) Montgomery ints -> [3, 8, L, W] packed u32."""
    L, Wd = len(niels_lw), len(niels_lw[0])
    out = np.zeros((3, 8, L, Wd), dtype=np.uint32)
    for l in range(L):
        for w_i in range(Wd):
            for c, v in enumerate(niels_lw[l][w_i]):
                for q in range(8):
                    lo = (v >> (32 * q)) & 0xFFFF
                    hi = (v >> (32 * q + 16)) & 0xFFFF
                    out[c, q, l, w_i] = lo | (hi << 16)
    return out


def _scan_model(ids_lw, niels_lw, L, n_lanes):
    """Per-lane reference scan: (staged, final_acc, final_id) in Montgomery."""
    ident = (0, F.R_MOD_P, 0, F.R_MOD_P)
    staged = [[None] * n_lanes for _ in range(L)]
    facc, fid = [None] * n_lanes, [None] * n_lanes
    for w_i in range(n_lanes):
        acc, acc_id = ident, 0xFFFFFFFF
        for l in range(L):
            raw = int(ids_lw[l][w_i])
            bid, neg = raw & 0x7FFFFFFF, raw >> 31
            ym, yp, td = niels_lw[l][w_i]
            if neg:
                ym, yp, td = yp, ym, F.fneg(td)
            staged[l][w_i] = acc
            if bid != acc_id:
                acc = ident
            acc = _niels_add_model(acc, (ym, yp, td))
            acc_id = bid
        facc[w_i], fid[w_i] = acc, acc_id
    return staged, facc, fid


def _coords_at(arr, l, w_i):
    """[4, 16, L, W] or [4, 16, W] digit planes -> 4 Montgomery ints."""
    sl = arr[:, :, l, w_i] if arr.ndim == 4 else arr[:, :, w_i]
    out = []
    for c in range(4):
        v = 0
        for d in reversed(range(16)):
            v = (v << 16) | int(sl[c, d])
        out.append(v)
    return tuple(out)


def _run_accumulate_scan_case(L, id_patterns, seed, **kw):
    """Drive pk.accumulate_scan at [3,8,L,1024] vs the python model.

    id_patterns: list of length-L id streams (bit 31 = sign flag); pattern p
    is assigned to lanes w where w % len(id_patterns) == p, so every pattern
    is exercised across block positions.
    """
    n_pat = len(id_patterns)
    pts = fixtures.distinct_points(2 * L, seed=seed)
    niels_lw = [
        [_niels_of(pts[(l + w_i) % len(pts)]) for w_i in range(W)]
        for l in range(L)
    ]
    ids_lw = [
        [id_patterns[w_i % n_pat][l] for w_i in range(W)] for l in range(L)
    ]
    xs = jnp.asarray(_pack_niels(niels_lw))
    ids = jnp.asarray(np.array(ids_lw, dtype=np.uint32))
    facc, fid, staged = pk.accumulate_scan(xs, ids, **kw)
    facc, fid, staged = np.asarray(facc), np.asarray(fid), np.asarray(staged)
    staged = staged.reshape(4, 16, L, W)

    # verify one lane per pattern at two block positions (lanes 0..2*n_pat)
    check_lanes = list(range(n_pat)) + [128 + p for p in range(n_pat)]
    e_staged, e_facc, e_fid = _scan_model(
        ids_lw, niels_lw, L, max(check_lanes) + 1
    )
    for w_i in check_lanes:
        assert int(fid[w_i]) == e_fid[w_i], f"fid lane {w_i}"
        assert _coords_at(facc, None, w_i) == e_facc[w_i], f"facc lane {w_i}"
        for l in range(L):
            assert (
                _coords_at(staged, l, w_i) == e_staged[l][w_i]
            ), f"staged lane {w_i} step {l}"


def test_accumulate_scan_kernel():
    """Production scan kernel: run boundaries at step/cell edges, signed-digit
    negation, packed-u32 unpacking, VMEM scratch carry across grid cells."""
    L = 8  # steps=4 -> 2 step-cells; boundary cases straddle the cell edge
    S = 1 << 31  # sign flag
    patterns = [
        [5] * L,                                  # one run, crosses cell edge
        [3] * 4 + [7] * 4,                        # boundary exactly at edge
        [1, 1, 2, 2, 2, 6, 6, 6],                 # mid-cell boundaries
        list(range(L)),                           # boundary every step
        [9, 9 | S, 9, 9 | S, 9, 9, 9 | S, 9],     # signs within one run
        [4 | S, 4, 2 | S, 2 | S, 2, 8, 8 | S, 1],  # signs + boundaries mixed
    ]
    _run_accumulate_scan_case(L, patterns, seed=41)


def test_accumulate_scan_kernel_odd_len():
    """L % 4 != 0 falls back to steps=1 cells."""
    L = 3
    S = 1 << 31
    patterns = [[2, 2, 2], [1, 2, 3], [5, 5 | S, 4]]
    _run_accumulate_scan_case(L, patterns, seed=42)


def test_to_niels_xy_kernel():
    """Wire-path variant: t = x*y computed in-kernel."""
    pts = fixtures.distinct_points(6, seed=44)
    arr = np.zeros((2, 16, W), dtype=np.uint32)
    for i in range(W):
        p = pts[i % len(pts)]
        for c, v in enumerate((p.x, p.y)):
            for d in range(16):
                arr[c, d, i] = (v >> (16 * d)) & 0xFFFF
    out = np.asarray(pk.to_niels_xy(jnp.asarray(arr)))
    for i in range(len(pts)):
        got = []
        for c in range(3):
            v = 0
            for d in reversed(range(16)):
                v = (v << 16) | int(out[c, d, i])
            got.append(v)
        assert tuple(got) == _niels_of(pts[i % len(pts)]), f"lane {i}"


def test_to_niels_kernel():
    pts = fixtures.distinct_points(6, seed=43)
    arr = np.zeros((3, 16, W), dtype=np.uint32)
    for i in range(W):
        p = pts[i % len(pts)]
        for c, v in enumerate((p.x, p.y, p.t)):
            for d in range(16):
                arr[c, d, i] = (v >> (16 * d)) & 0xFFFF
    out = np.asarray(pk.to_niels(jnp.asarray(arr)))
    for i in range(len(pts)):
        got = []
        for c in range(3):
            v = 0
            for d in reversed(range(16)):
                v = (v << 16) | int(out[c, d, i])
            got.append(v)
        assert tuple(got) == _niels_of(pts[i % len(pts)]), f"lane {i}"
