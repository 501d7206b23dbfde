"""Vectorized extended twisted Edwards point ops over digit planes.

TPU-native re-design of the reference's WGSL curve library
(`src/submission/wgsl/curve.wgsl:36-114`): the same unified add-2008-hwcd /
dbl-2008-hwcd formulas (a = -1, d = 3021), but batched — each VPU lane holds
one point, coordinates live in the Montgomery domain as 16 uint32 digit
planes per coordinate.

A point batch is a `PointVec(x, y, t, z)` of digit-plane lists; all ops are
elementwise across the batch shape.

Cost (per lane): unified add = 9 Montgomery muls; mixed add (z2 = 1,
i.e. fresh input points, which is the accumulation hot path) = 8; double =
4 muls + 4 squares.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp

from ..oracle.field import P, R, R_MOD_P, EDWARDS_D
from . import field_ops, limbs
from .field_ops import field_add, field_sub, field_neg, mont_mul, mont_sqr, mul_plain_const


class PointVec(NamedTuple):
    """Batch of extended points; each coordinate is a list of 16 digit planes."""

    x: list
    y: list
    t: list
    z: list

    @property
    def shape(self):
        return self.x[0].shape

    def stacked(self) -> jnp.ndarray:
        """[4, 16, *batch] uint32."""
        return jnp.stack(
            [limbs.stack(self.x), limbs.stack(self.y), limbs.stack(self.t), limbs.stack(self.z)]
        )

    @staticmethod
    def from_stacked(arr: jnp.ndarray) -> "PointVec":
        return PointVec(
            limbs.unstack(arr[0]),
            limbs.unstack(arr[1]),
            limbs.unstack(arr[2]),
            limbs.unstack(arr[3]),
        )


def identity(shape=()) -> PointVec:
    """(0, 1, 0, 1) in the Montgomery domain: (0, R, 0, R)."""
    zero = limbs.digits_of_int(0, shape)
    one = limbs.digits_of_int(R_MOD_P, shape)
    return PointVec(zero, one, [z for z in zero], [o for o in one])


def add(p1: PointVec, p2: PointVec) -> PointVec:
    """Unified addition (add-2008-hwcd-3, a = -1); complete on the subgroup.

    Same group law as curve.wgsl:36-63, one fewer multiply (8 + one
    constant multiply by 2d)."""
    a = mont_mul(field_sub(p1.y, p1.x), field_sub(p2.y, p2.x))
    b = mont_mul(field_add(p1.y, p1.x), field_add(p2.y, p2.x))
    c = mul_plain_const(mont_mul(p1.t, p2.t), 2 * EDWARDS_D)
    zz = mont_mul(p1.z, p2.z)
    d = field_add(zz, zz)
    e = field_sub(b, a)
    f = field_sub(d, c)
    g = field_add(d, c)
    h = field_add(b, a)
    return PointVec(mont_mul(e, f), mont_mul(g, h), mont_mul(e, h), mont_mul(f, g))


def add_mixed(p1: PointVec, p2_x, p2_y, p2_t) -> PointVec:
    """p1 + p2 where p2.z == 1 (Montgomery R): saves the Z1*Z2 multiply."""
    a = mont_mul(field_sub(p1.y, p1.x), field_sub(p2_y, p2_x))
    b = mont_mul(field_add(p1.y, p1.x), field_add(p2_y, p2_x))
    c = mul_plain_const(mont_mul(p1.t, p2_t), 2 * EDWARDS_D)
    d = field_add(p1.z, p1.z)  # 2 * Z1 * 1
    e = field_sub(b, a)
    f = field_sub(d, c)
    g = field_add(d, c)
    h = field_add(b, a)
    return PointVec(mont_mul(e, f), mont_mul(g, h), mont_mul(e, h), mont_mul(f, g))


def add_niels(p1: PointVec, ym2, yp2, td2) -> PointVec:
    """p1 + p2 with p2 in precomputed Niels form (y-x, y+x, 2d*t; z == 1).

    7 multiplies — the bucket-accumulation hot path. The Niels transform is
    applied once per input point (to_niels), amortized over all K windows.
    """
    a = mont_mul(field_sub(p1.y, p1.x), ym2)
    b = mont_mul(field_add(p1.y, p1.x), yp2)
    c = mont_mul(p1.t, td2)
    d = field_add(p1.z, p1.z)
    e = field_sub(b, a)
    f = field_sub(d, c)
    g = field_add(d, c)
    h = field_add(b, a)
    return PointVec(mont_mul(e, f), mont_mul(g, h), mont_mul(e, h), mont_mul(f, g))


def to_niels_planes(points_plain: jnp.ndarray) -> jnp.ndarray:
    """[3, 16, n] plain (x, y, t) digit planes -> [3, 16, n] Montgomery
    Niels planes (y-x, y+x, 2d*t) — the accumulation input format."""
    x = field_ops.to_mont(limbs.unstack(points_plain[0]))
    y = field_ops.to_mont(limbs.unstack(points_plain[1]))
    t = field_ops.to_mont(limbs.unstack(points_plain[2]))
    ym = field_sub(y, x)
    yp = field_add(y, x)
    td = mul_plain_const(t, 2 * EDWARDS_D)
    return jnp.stack([limbs.stack(ym), limbs.stack(yp), limbs.stack(td)])


def to_niels_from_xy(x_planes: jnp.ndarray, y_planes: jnp.ndarray) -> jnp.ndarray:
    """[16, n] plain x and y digit planes -> [3, 16, n] Montgomery Niels.

    t = x*y is computed ON DEVICE as mont_mul(xR, yR) = (x*y)R — so the
    wire path only transfers x||y (half the reference's 32-u32 rows) and
    skips host-side t marshalling entirely. Identical residues to
    `to_niels_planes` on (x, y, x*y).
    """
    x = field_ops.to_mont(limbs.unstack(x_planes))
    y = field_ops.to_mont(limbs.unstack(y_planes))
    ym = field_sub(y, x)
    yp = field_add(y, x)
    t = mont_mul(x, y)
    td = mul_plain_const(t, 2 * EDWARDS_D)
    return jnp.stack([limbs.stack(ym), limbs.stack(yp), limbs.stack(td)])


def double(p: PointVec) -> PointVec:
    """Dedicated doubling (curve.wgsl:93-114, dbl-2008-hwcd a = -1)."""
    a = mont_sqr(p.x)
    b = mont_sqr(p.y)
    zz = mont_sqr(p.z)
    c = field_add(zz, zz)
    d = field_neg(a)
    h = field_sub(d, b)
    e = field_add(mont_sqr(field_add(p.x, p.y)), h)
    g = field_add(d, b)
    f = field_sub(g, c)
    return PointVec(mont_mul(e, f), mont_mul(g, h), mont_mul(e, h), mont_mul(f, g))


def select(mask: jnp.ndarray, a: PointVec, b: PointVec) -> PointVec:
    """Per-lane: mask ? a : b."""
    return PointVec(
        limbs.select(mask, a.x, b.x),
        limbs.select(mask, a.y, b.y),
        limbs.select(mask, a.t, b.t),
        limbs.select(mask, a.z, b.z),
    )


def to_mont(p: PointVec) -> PointVec:
    return PointVec(
        field_ops.to_mont(p.x),
        field_ops.to_mont(p.y),
        field_ops.to_mont(p.t),
        field_ops.to_mont(p.z),
    )


def from_mont(p: PointVec) -> PointVec:
    return PointVec(
        field_ops.from_mont(p.x),
        field_ops.from_mont(p.y),
        field_ops.from_mont(p.t),
        field_ops.from_mont(p.z),
    )
