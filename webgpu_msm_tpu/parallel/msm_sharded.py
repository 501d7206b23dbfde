"""Multi-chip MSM: points sharded over a device mesh, partials combined
with group-law tree adds after an ICI all-gather.

TPU-native generalization of the reference's 2-way heterogeneous co-compute
split (`cpuWorkRatio` + one `point_add_affine` join, submission.ts:96-154,
lib.rs:240-251; SURVEY.md §2.5 P3): here the point vector is sharded N ways
across a `jax.sharding.Mesh` and the join is a log-depth tree of vectorized
extended-Edwards adds over gathered partials.

Point addition is a 9-mul group law, not an integer sum, so `psum` over raw
digit planes would be wrong; the collective is `all_gather` + on-device tree
combine. Two first-class payload choices (SURVEY.md §5.8):

- "window_sums": gather [4, 16, K] per-window sums (tiny payload — K points
  per device — after each device fully reduces its local buckets). Default.
- "buckets": gather [4, 16, K, B] raw bucket arrays, tree-add them, then run
  the running-sum reduction once on the combined buckets (the reference's
  `inter_bucket_reduce` applied post-collective). Heavier payload, but the
  bucket reduction cost is paid once instead of per shard.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import curve_ops, pippenger
from ..ops.curve_ops import PointVec

AXIS = "points"  # mesh axis the point vector is sharded over


def tree_add_points(stacked: jnp.ndarray) -> jnp.ndarray:
    """[D, 4, 16, *batch] stacked points -> [4, 16, *batch] group sum.

    Log-depth tree of vectorized unified adds, via a shift-based fori_loop
    so the add graph compiles once regardless of D (an unrolled halving tree
    would emit log2(D) distinct add graphs under the SPMD partitioner).
    """
    D = stacked.shape[0]
    if D == 1:
        return stacked[0]
    # move D to the trailing axis so lane masking broadcasts naturally
    moved = jnp.moveaxis(stacked, 0, -1)  # [4, 16, *batch, D]
    lane = jax.lax.broadcasted_iota(jnp.int32, moved.shape[2:], moved.ndim - 3)

    def level(i, cur):
        d = jnp.int32(1) << i
        shifted = jnp.roll(cur, -d, axis=-1)
        ok = lane + d < D
        summed = curve_ops.add(
            PointVec.from_stacked(cur), PointVec.from_stacked(shifted)
        )
        return curve_ops.select(ok, summed, PointVec.from_stacked(cur)).stacked()

    out = jax.lax.fori_loop(0, (D - 1).bit_length(), level, moved)
    return out[..., 0]


def _local_window_sums(pts, sw, *, window_size, n_chunks, chunk_len, mode,
                       signed_digits):
    """Per-device shard -> replicated combined window sums [4, 16, K]."""
    if mode == "buckets":
        local = pippenger.accumulate_buckets(
            pts, sw, window_size=window_size, n_chunks=n_chunks,
            chunk_len=chunk_len, signed_digits=signed_digits,
        )  # [4, 16, K, B]
        gathered = jax.lax.all_gather(local, AXIS)  # [D, 4, 16, K, B]
        combined = tree_add_points(gathered)
        return pippenger.reduce_buckets(combined)
    local = pippenger.accumulate_and_reduce(
        pts, sw, window_size=window_size, n_chunks=n_chunks,
        chunk_len=chunk_len, signed_digits=signed_digits,
    )  # [4, 16, K]
    gathered = jax.lax.all_gather(local, AXIS)  # [D, 4, 16, K]
    return tree_add_points(gathered)


@functools.partial(
    jax.jit,
    static_argnames=(
        "window_size", "n_chunks", "chunk_len", "mesh", "mode", "signed_digits"
    ),
)
def msm_window_sums_sharded(
    points: jnp.ndarray,  # [3, 16, n_global] uint32 Montgomery NIELS planes
    scalar_words: jnp.ndarray,  # [8, n_global] uint32 LE
    *,
    window_size: int,
    n_chunks: int,  # per-device chunking: n_global == D * n_chunks * chunk_len
    chunk_len: int,
    mesh: Mesh,
    mode: str = "window_sums",
    signed_digits: bool = False,
) -> jnp.ndarray:
    """Sharded MSM -> replicated window sums [4, 16, K] (Montgomery)."""
    fn = jax.shard_map(
        functools.partial(
            _local_window_sums,
            window_size=window_size,
            n_chunks=n_chunks,
            chunk_len=chunk_len,
            mode=mode,
            signed_digits=signed_digits,
        ),
        mesh=mesh,
        in_specs=(P(None, None, AXIS), P(None, AXIS)),
        out_specs=P(),
        check_vma=False,
    )
    return fn(points, scalar_words)


def default_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, (AXIS,))
