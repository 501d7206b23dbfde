"""Multi-chip sharded MSM on an 8-virtual-device CPU mesh (conftest.py).

The distributed test tier the reference never had (SURVEY.md §4): points
sharded over a mesh, partial bucket/window sums combined with group-law tree
adds after an all_gather, bit-exact vs the host oracle.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from webgpu_msm_tpu.engines.tpu_engine import (
    marshal_points,
    marshal_scalars,
    window_sums_to_points,
)
from webgpu_msm_tpu.oracle import curve, msm as omsm
from webgpu_msm_tpu.oracle.msm import combine_windows
from webgpu_msm_tpu.ops import field_ops, limbs
from webgpu_msm_tpu.parallel import default_mesh, msm_window_sums_sharded
from webgpu_msm_tpu.utils import fixtures


def _to_niels_stacked(planes):
    from webgpu_msm_tpu.ops import curve_ops

    # jit: eager digit-plane chains dispatch thousands of single-op
    # XLA:CPU compiles (round-4 compile diet)
    return jax.jit(curve_ops.to_niels_planes)(jnp.asarray(planes))


@jax.jit
def _from_mont_stacked(wsums):
    return jnp.stack(
        [limbs.stack(field_ops.from_mont(limbs.unstack(wsums[i]))) for i in range(4)]
    )


def _decode(wsums, w):
    out = _from_mont_stacked(wsums)
    return curve.to_affine(combine_windows(window_sums_to_points(np.asarray(out)), w))


_CASES = [("window_sums", False), ("window_sums", True)] + (
    [("buckets", False)] if os.environ.get("MSM_FULL_TESTS") else []
)


@pytest.mark.slow
@pytest.mark.parametrize("mode,signed", _CASES)
def test_sharded_msm_matches_oracle(mode, signed):
    # slow: each sharded stage costs minutes of XLA:CPU compile cold; the
    # driver's dryrun_multichip artifact covers this path every round
    # (round-4 cold-suite rebalance)
    D = len(jax.devices())
    if D != 8:
        # MSM_TEST_TPU=1 runs this tier on the real backend, where one
        # physical chip is exposed — the 8-way mesh is a virtual-CPU-mesh
        # test (conftest) also executed by the driver's dryrun_multichip
        # artifact every round; skipping here is a device-count fact, not
        # lost coverage.
        pytest.skip(f"needs 8 devices for the sharded mesh, have {D}")
    W, C, L = 8, 8, 8
    n = D * C * L  # 512
    pts = fixtures.distinct_points(n, seed=5)
    scalars = fixtures.random_scalars(n, seed=6)

    planes = marshal_points(pts, n)
    words = marshal_scalars(scalars, n)
    mesh = default_mesh(D)
    wsums = msm_window_sums_sharded(
        _to_niels_stacked(planes),
        jnp.asarray(words),
        window_size=W,
        n_chunks=C,
        chunk_len=L,
        mesh=mesh,
        mode=mode,
        signed_digits=signed,
    )
    got = _decode(wsums, W)
    want = curve.to_affine(omsm.msm(pts, scalars, window_size=W))
    assert got == want


def test_tree_add_points_matches_oracle():
    from webgpu_msm_tpu.parallel import tree_add_points
    from webgpu_msm_tpu.ops.curve_ops import PointVec, to_mont, from_mont

    pts = fixtures.distinct_points(5, seed=9)
    planes = marshal_points(pts, 5)  # [3, 16, 5] plain
    arr = jnp.asarray(planes)
    x = field_ops.to_mont(limbs.unstack(arr[0]))
    y = field_ops.to_mont(limbs.unstack(arr[1]))
    t = field_ops.to_mont(limbs.unstack(arr[2]))
    z = limbs.digits_of_int(1, (5,))
    z = field_ops.to_mont(z)
    stacked = PointVec(x, y, t, z).stacked()  # [4, 16, 5]
    # treat the point axis as the "device" axis: [5, 4, 16]
    per_dev = jnp.transpose(stacked, (2, 0, 1))
    summed = tree_add_points(per_dev)  # [4, 16]
    out = jnp.stack(
        [
            limbs.stack(field_ops.from_mont(limbs.unstack(summed[i])))
            for i in range(4)
        ]
    )[..., None]
    got_pt = window_sums_to_points(np.asarray(out))[0]
    want = curve.IDENTITY
    for p in pts:
        want = curve.add(want, p)
    assert curve.to_affine(got_pt) == curve.to_affine(want)


def test_sharded_fixed_base_plan():
    """ShardedFixedBasePlan: mesh-sharded resident bases, scalars-only jobs
    (the multi-chip form of the round-5 fixed-base prover plan). Reuses the
    dryrun statics (w=8, 8x8, signed) so the staged programs come from the
    same cache every other sharded path compiles."""
    from webgpu_msm_tpu.parallel import ShardedFixedBasePlan

    D = len(jax.devices())
    if D != 8:
        pytest.skip(f"needs the 8-device virtual mesh, have {D}")
    W, C, L = 8, 8, 8
    n = D * C * L
    pts = fixtures.distinct_points(64, seed=17)
    pts = [pts[i % 64] for i in range(n)]
    planes = marshal_points(pts, n)
    mesh = default_mesh(D)
    plan = ShardedFixedBasePlan(
        _to_niels_stacked(planes), window_size=W, n_chunks=C, chunk_len=L,
        mesh=mesh, signed_digits=True,
    )

    for seed in (18, 19):  # two jobs reuse the resident sharded bases
        scalars = fixtures.random_scalars(n, seed=seed)
        wsums = plan.window_sums(jnp.asarray(marshal_scalars(scalars, n)))
        got = _decode(wsums, W)
        want = curve.to_affine(omsm.msm(pts, scalars, window_size=W))
        assert got == want, f"job seed={seed}"

    with pytest.raises(ValueError):
        plan.window_sums(jnp.zeros((8, n // 2), jnp.uint32))
