"""Naive MSM baseline: per-point double-and-add ladder, then a tree sum.

The TPU analog of the reference's baseline `webgpu_compute_msm`
(`src/reference/webgpu/entries/naiveMSMEntry.ts:11-34`): every point gets a
full 253-bit scalar ladder (the reference staged it across 5 GPU passes in
64-bit chunks purely for watchdog reasons; one jit handles it here), and the
n per-point products are summed. ~25x more field multiplies per point than
Pippenger — kept as the benchmark's lower-bound comparison row, exactly the
role the naive entry plays in the reference's harness
(`src/ui/AllBenchmarks.tsx:183-188`).
"""
from __future__ import annotations

import functools
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..config import MSMConfig
from ..oracle import curve as ocurve
from ..oracle.curve import ExtPoint
from ..ops import curve_ops, field_ops, limbs
from ..ops.curve_ops import PointVec
from . import tpu_engine

# Full 256-bit ladder: the API accepts arbitrary u256 scalars, and the other
# engines (oracle/tpu/cpu) reduce them with full 256-bit windows; three extra
# iterations are negligible for a baseline row.
SCALAR_BITS = 256


@functools.partial(jax.jit, static_argnames=())
def _device_naive(points_plain: jnp.ndarray, scalar_words: jnp.ndarray) -> jnp.ndarray:
    """[3, 16, n] plain affine + [8, n] LE scalar words -> [4, 16] plain."""
    n = points_plain.shape[-1]
    x = field_ops.to_mont(limbs.unstack(points_plain[0]))
    y = field_ops.to_mont(limbs.unstack(points_plain[1]))
    t = field_ops.to_mont(limbs.unstack(points_plain[2]))

    # MSB-first ladder as ONE 256-step fori_loop with a dynamic word fetch:
    # the original 8-way word unroll instantiated the double+add graph 8
    # times and cost ~10 min of XLA:CPU compile cold (round-4 suite
    # measurement); a single body compiles once.
    acc_st = curve_ops.identity((n,)).stacked()

    def step(i, st):
        bit_idx = jnp.uint32(SCALAR_BITS - 1) - i.astype(jnp.uint32)
        word = lax.dynamic_index_in_dim(
            scalar_words, (bit_idx // 32).astype(jnp.int32), axis=0,
            keepdims=False,
        )
        on = (word >> (bit_idx % 32)) & jnp.uint32(1)
        acc = curve_ops.double(PointVec.from_stacked(st))
        added = curve_ops.add_mixed(acc, x, y, t)
        return curve_ops.select(on == 1, added, acc).stacked()

    acc_st = lax.fori_loop(0, SCALAR_BITS, step, acc_st)

    # tree-sum the n per-point products
    from ..ops import pippenger

    total = pippenger._tree_sum_axis(acc_st.reshape(4, 16, 1, n))[..., 0]
    return jnp.stack(
        [limbs.stack(field_ops.from_mont(limbs.unstack(total[i]))) for i in range(4)]
    )


def msm_affine(
    points: Sequence[ExtPoint], scalars: Sequence[int], config: MSMConfig
) -> tuple[int, int]:
    n = len(points)
    pad_to = max(-(-n // 128) * 128, 128)
    pts = tpu_engine.marshal_points(points, pad_to)
    sc = tpu_engine.marshal_scalars(scalars, pad_to)
    out = np.asarray(_device_naive(jnp.asarray(pts), jnp.asarray(sc)))
    p = tpu_engine.window_sums_to_points(out[:, :, None])[0]
    return ocurve.to_affine(p)
