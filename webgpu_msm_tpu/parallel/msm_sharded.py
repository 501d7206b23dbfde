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


# ---------------------------------------------------------------------------
# Staged sharded pipeline (round-4 compile diet): the sharded MSM runs as a
# chain of independently-jitted programs instead of one monolithic
# shard_map — XLA compile cost is superlinear in module size, and the
# monolith's XLA:CPU compile blew the dryrun budget on cold machines
# (MULTICHIP_r03 rc=124). window_sums mode: [accumulate, local-reduce,
# gather+combine]; buckets mode: [accumulate, gather+combine, reduce].
# Per-device intermediates keep a leading length-1 device axis so stage
# boundaries stay sharded (out_specs P(AXIS)); exactly ONE stage holds the
# collective.
# ---------------------------------------------------------------------------


def _stage_accumulate(pts, sw, *, window_size, n_chunks, chunk_len,
                      signed_digits):
    """local shard -> [1, 4, 16, K, B] local bucket sums."""
    return pippenger.accumulate_buckets(
        pts, sw, window_size=window_size, n_chunks=n_chunks,
        chunk_len=chunk_len, signed_digits=signed_digits,
    )[None]


def _stage_reduce_local(bsums):
    """[1, 4, 16, K, B] local buckets -> [1, 4, 16, K] local window sums.

    A separate stage on purpose: fusing it into accumulate was measured
    and rejected — compile cost is superlinear in module size, so the
    fused program cost ~2x the two split compiles (round-4 dryrun A/B;
    scripts/bench_cpu_compile.py)."""
    return pippenger.reduce_buckets(bsums[0])[None]


def _stage_gather_combine(local):
    """[1, 4, 16, *rest] per-device partials -> replicated group sum.

    The only collective in the pipeline: all_gather over the point axis
    followed by the log-depth group-law tree (payload choice per mode —
    window sums [4,16,K] or raw buckets [4,16,K,B], SURVEY.md §5.8)."""
    gathered = jax.lax.all_gather(local[0], AXIS)  # [D, 4, 16, *rest]
    return tree_add_points(gathered)


_STAGE_JITS: dict = {}


def _use_stage_exports() -> bool:
    """Route single-process sharded stages through the jax.export AOT cache
    (utils/cache.exported_call): committed aot/ artifacts then let a cold
    machine skip tracing the sharded programs entirely. Multi-process runs
    keep plain jit (exports bake in a single-process device assignment)."""
    import os

    return (
        os.environ.get("MSM_NO_EXPORT_CACHE") != "1"
        and jax.process_count() == 1
    )


def _sharded_stage(name: str, fn, mesh: Mesh, in_specs, out_specs, **static):
    """jit(shard_map(...)) per (statics, mesh), cached."""
    key = (name, mesh, tuple(sorted(static.items())))
    jitted = _STAGE_JITS.get(key)
    if jitted is None:
        jitted = jax.jit(
            jax.shard_map(
                functools.partial(fn, **static) if static else fn,
                mesh=mesh,
                in_specs=in_specs,
                out_specs=out_specs,
                check_vma=False,
            )
        )
        _STAGE_JITS[key] = jitted
    if not _use_stage_exports():
        return jitted

    from ..utils.cache import exported_call

    stat = "_".join(f"{k}{v}" for k, v in sorted(static.items()))
    ename = f"sharded_{name}_D{mesh.size}_{jax.default_backend()}_{stat}"

    def call(*args):
        return exported_call(ename, jitted, *args)

    return call


def sharded_stages(
    *, window_size, n_chunks, chunk_len, mesh, mode="window_sums",
    signed_digits=False,
):
    """The ordered list of (name, jitted_fn) stages of the sharded MSM.

    Exposed so multi-host workers can AOT-compile every stage before the
    first collective executes (gloo peers must not skew by whole-module
    compile times)."""
    combine = _sharded_stage(
        "combine", _stage_gather_combine, mesh, (P(AXIS),), P()
    )
    if mode == "buckets":
        acc = _sharded_stage(
            "acc", _stage_accumulate, mesh,
            (P(None, None, AXIS), P(None, AXIS)), P(AXIS),
            window_size=window_size, n_chunks=n_chunks, chunk_len=chunk_len,
            signed_digits=signed_digits,
        )
        # gather raw bucket arrays, tree-add, reduce once (replicated)
        reduce_rep = _STAGE_JITS.get(("reduce_rep", mesh))
        if reduce_rep is None:
            reduce_rep = jax.jit(pippenger.reduce_buckets)
            _STAGE_JITS[("reduce_rep", mesh)] = reduce_rep
        return [("accumulate", acc), ("combine", combine),
                ("reduce", reduce_rep)]
    acc = _sharded_stage(
        "acc", _stage_accumulate, mesh,
        (P(None, None, AXIS), P(None, AXIS)), P(AXIS),
        window_size=window_size, n_chunks=n_chunks, chunk_len=chunk_len,
        signed_digits=signed_digits,
    )
    reduce_local = _sharded_stage(
        "reduce", _stage_reduce_local, mesh, (P(AXIS),), P(AXIS)
    )
    return [("accumulate", acc), ("reduce", reduce_local),
            ("combine", combine)]


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
    stages = sharded_stages(
        window_size=window_size, n_chunks=n_chunks, chunk_len=chunk_len,
        mesh=mesh, mode=mode, signed_digits=signed_digits,
    )
    # Place inputs on the mesh explicitly: the exported-stage path calls
    # AOT programs whose device assignment is baked in, so args must
    # already carry the mesh sharding (plain jit would have inserted the
    # same resharding implicitly).
    points = jax.device_put(points, NamedSharding(mesh, P(None, None, AXIS)))
    scalar_words = jax.device_put(scalar_words, NamedSharding(mesh, P(None, AXIS)))
    out = stages[0][1](points, scalar_words)
    for _, fn in stages[1:]:
        out = fn(out)
    return out


class ShardedFixedBasePlan:
    """Fixed-base (SRS) prover plan over a device mesh.

    The multi-chip form of the single-chip `api.MSMPlan`/`WirePlan`
    (round-5): the Montgomery-Niels base planes are placed on the mesh
    ONCE — sharded over the point axis, so an SRS larger than one chip's
    HBM scales with the mesh — and every job streams only its [8, n]
    scalar words. Jobs share the compiled staged pipeline; the only
    collective stays the one all_gather + group-law tree combine.

        plan = ShardedFixedBasePlan(pts_niels, window_size=..., mesh=mesh)
        wsums = plan.window_sums(scalar_words)   # per job

    `signed_digits` is a trace-time static of the accumulate stage, so a
    plan is built for one recoding mode; callers check the scalar range
    exactly as with `msm_window_sums_sharded`.
    """

    def __init__(
        self,
        points_niels: jnp.ndarray,  # [3, 16, n_global] Montgomery NIELS planes
        *,
        window_size: int,
        n_chunks: int,
        chunk_len: int,
        mesh: Mesh,
        mode: str = "window_sums",
        signed_digits: bool = False,
    ):
        self.mesh = mesh
        self.n_global = points_niels.shape[-1]
        assert self.n_global == mesh.size * n_chunks * chunk_len, (
            self.n_global, mesh.size, n_chunks, chunk_len,
        )
        self._stages = sharded_stages(
            window_size=window_size, n_chunks=n_chunks, chunk_len=chunk_len,
            mesh=mesh, mode=mode, signed_digits=signed_digits,
        )
        self._points = jax.device_put(
            points_niels, NamedSharding(mesh, P(None, None, AXIS))
        )

    def window_sums(self, scalar_words: jnp.ndarray) -> jnp.ndarray:
        """One job: [8, n_global] LE scalar words -> replicated Montgomery
        window sums [4, 16, K] (decode like msm_window_sums_sharded)."""
        if scalar_words.shape[-1] != self.n_global:
            raise ValueError(
                f"plan holds {self.n_global} bases but got "
                f"{scalar_words.shape[-1]} scalars"
            )
        sw = jax.device_put(
            scalar_words, NamedSharding(self.mesh, P(None, AXIS))
        )
        out = self._stages[0][1](self._points, sw)
        for _, fn in self._stages[1:]:
            out = fn(out)
        return out


def default_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, (AXIS,))
