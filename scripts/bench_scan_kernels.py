"""A/B: jnp scan body vs Pallas scan_step kernel for bucket accumulation."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from webgpu_msm_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from webgpu_msm_tpu.oracle.field import R_MOD_P
from webgpu_msm_tpu.ops import curve_ops, limbs
from webgpu_msm_tpu.ops.curve_ops import PointVec
from webgpu_msm_tpu.ops.pallas import padd_kernels

SENTINEL = jnp.uint32(0xFFFFFFFF)


def _sync(out):
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf.ravel()[0])


def timeit(fn, *args, iters=3, name=""):
    out = fn(*args)
    _sync(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:24s} {np.median(ts)*1000:9.2f} ms")
    return out


def main():
    W = 13312  # K*C at 2^14/w=10
    L = 32
    rng = np.random.default_rng(0)
    xs_np = rng.integers(0, 1 << 16, size=(L, 3, 16, W), dtype=np.uint32)
    xs_np[:, :, 15, :] = 0  # < 2^240 < p: valid field elements for both paths
    xs_pts = jnp.asarray(xs_np)
    ids = jnp.asarray(rng.integers(0, 1024, size=(L, W), dtype=np.uint32))

    one_mont = limbs.digits_of_int(R_MOD_P, (W,))
    id_pt = curve_ops.identity((W,))

    @jax.jit
    def scan_jnp(xs_pts, ids):
        def body(carry, xs):
            acc_st, acc_id = carry
            pts_j, ids_j = xs
            acc = PointVec.from_stacked(acc_st)
            px = limbs.unstack(pts_j[0])
            py = limbs.unstack(pts_j[1])
            pt = limbs.unstack(pts_j[2])
            same = ids_j == acc_id
            added = curve_ops.add_mixed(acc, px, py, pt)
            fresh = PointVec(px, py, pt, one_mont)
            new_acc = curve_ops.select(same, added, fresh)
            return (new_acc.stacked(), ids_j), acc_st

        init = (id_pt.stacked(), jnp.full((W,), SENTINEL, dtype=jnp.uint32))
        (fa, fi), staged = lax.scan(body, init, (xs_pts, ids))
        return fa, staged

    @jax.jit
    def scan_pallas(xs_pts, ids):
        def body(carry, xs):
            acc_st, acc_id = carry
            pts_j, ids_j = xs
            nacc, nid, staged = padd_kernels.scan_step(acc_st, acc_id, pts_j, ids_j)
            return (nacc, nid), staged

        init = (id_pt.stacked(), jnp.full((W,), SENTINEL, dtype=jnp.uint32))
        (fa, fi), staged = lax.scan(body, init, (xs_pts, ids))
        return fa, staged

    @jax.jit
    def fused(xs_pts, ids):
        facc, fid, staged = padd_kernels.accumulate_scan(
            jnp.transpose(xs_pts, (1, 2, 0, 3)), ids
        )
        return facc, jnp.transpose(staged, (2, 0, 1, 3))

    @jax.jit
    def fused_mxu(xs_pts, ids):
        facc, fid, staged = padd_kernels.accumulate_scan(
            jnp.transpose(xs_pts, (1, 2, 0, 3)), ids, use_mxu=True
        )
        return facc, jnp.transpose(staged, (2, 0, 1, 3))

    print(f"W={W} L={L} backend={jax.default_backend()}")
    r1 = timeit(scan_jnp, xs_pts, ids, name="jnp scan body")
    r2 = timeit(scan_pallas, xs_pts, ids, name="pallas scan_step")
    r3 = timeit(fused, xs_pts, ids, name="pallas fused scan")
    r4 = timeit(fused_mxu, xs_pts, ids, name="pallas fused scan MXU")
    print("step same:", bool(jnp.array_equal(r1[0], r2[0]) and jnp.array_equal(r1[1], r2[1])))
    print("fused same:", bool(jnp.array_equal(r1[0], r3[0]) and jnp.array_equal(r1[1], r3[1])))
    print("mxu same:", bool(jnp.array_equal(r1[0], r4[0]) and jnp.array_equal(r1[1], r4[1])))


if __name__ == "__main__":
    main()
