"""In-kernel digit arithmetic for Pallas TPU kernels.

These helpers are called *inside* Pallas kernel bodies on VMEM-resident
values. Digit planes are [..., R, C]-shaped uint32 arrays (R sublanes,
C lanes — keep R a multiple of 8 and C of 128 for full VPU tiles).

Algorithm: CIOS Montgomery over 16-bit digits (products 16x16 -> 32 exact in
uint32 — the constraint-driven digit split the reference's WGSL used,
u256.wgsl:419-444, here vectorized over VPU tiles); lazy columns < 2^22.
Unlike the XLA-graph path (ops/field_ops.py), instruction count per tile is
what matters here, not graph node count — loops are unrolled in Python and
Mosaic schedules the straight-line vector code.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from ...oracle.field import P, N0_INV_16, R as R_CONST, R_MOD_P, R2_MOD_P

N_DIGITS = 16
DIGIT_BITS = 16
MASK = 0xFFFF  # python int: avoids captured-constant scalars in kernel bodies

P_DIGITS = [(P >> (16 * k)) & 0xFFFF for k in range(N_DIGITS)]
N0 = int(N0_INV_16)


def digits_const(value: int, shape) -> list:
    return [
        jnp.full(shape, (value >> (16 * k)) & 0xFFFF, dtype=jnp.uint32)
        for k in range(N_DIGITS)
    ]


def kadd(a: Sequence, b: Sequence) -> list:
    """(a + b) mod p, both < p."""
    out, carry = [], None
    for k in range(N_DIGITS):
        s = a[k] + b[k] if carry is None else a[k] + b[k] + carry
        out.append(s & MASK)
        carry = s >> DIGIT_BITS
    return _cond_sub_p(out, plus_carry=carry)


def ksub(a: Sequence, b: Sequence) -> list:
    """(a - b) mod p, both < p."""
    diff, borrow = [], None
    for k in range(N_DIGITS):
        d = a[k] - b[k] if borrow is None else a[k] - b[k] - borrow
        diff.append(d & MASK)
        borrow = d >> 31
    # where borrowed, add p back
    out, carry = [], None
    bmask = 0 - borrow  # 0 or 0xFFFFFFFF
    for k in range(N_DIGITS):
        pk = P_DIGITS[k]
        s = diff[k] + (pk & bmask) if carry is None else diff[k] + (pk & bmask) + carry
        out.append(s & MASK)
        carry = s >> DIGIT_BITS
    return out


def kneg(a: Sequence) -> list:
    """(-a) mod p; 0 -> 0."""
    nz = a[0]
    for k in range(1, N_DIGITS):
        nz = nz | a[k]
    is_zero = nz == 0
    out, borrow = [], None
    for k in range(N_DIGITS):
        pk = P_DIGITS[k]
        d = pk - a[k] if borrow is None else pk - a[k] - borrow
        out.append(d & MASK)
        borrow = d >> 31
    return [jnp.where(is_zero, a[k], out[k]) for k in range(N_DIGITS)]


def _cond_sub_p(a: Sequence, plus_carry=None) -> list:
    """a (< 2p, 16 digits + optional carry bit) -> a mod p."""
    diff, borrow = [], None
    for k in range(N_DIGITS):
        pk = P_DIGITS[k]
        d = a[k] - pk if borrow is None else a[k] - pk - borrow
        diff.append(d & MASK)
        borrow = d >> 31
    if plus_carry is not None:
        # carry bit from the addition: value >= 2^256 > p, so subtract p.
        keep = (borrow == 1) & (plus_carry == 0)
    else:
        keep = borrow == 1
    return [jnp.where(keep, a[k], diff[k]) for k in range(N_DIGITS)]


def kmont_mul(a: Sequence, b: Sequence) -> list:
    """CIOS Montgomery product: a*b*R^-1 mod p (inputs < p)."""
    cols = [None] * (2 * N_DIGITS + 1)

    def acc(k, v):
        cols[k] = v if cols[k] is None else cols[k] + v

    for i in range(N_DIGITS):
        ai = a[i]
        for j in range(N_DIGITS):
            prod = ai * b[j]
            acc(i + j, prod & MASK)
            acc(i + j + 1, prod >> DIGIT_BITS)
    zeros = jnp.zeros_like(a[0])
    for k in range(2 * N_DIGITS + 1):
        if cols[k] is None:
            cols[k] = zeros
    # interleaved REDC
    for i in range(N_DIGITS):
        m = (cols[i] * N0) & MASK
        for j in range(N_DIGITS):
            pj = P_DIGITS[j]
            if pj == 0:
                continue
            if pj == 1:
                cols[i + j] = cols[i + j] + m
            else:
                q = m * pj
                cols[i + j] = cols[i + j] + (q & MASK)
                cols[i + j + 1] = cols[i + j + 1] + (q >> DIGIT_BITS)
        cols[i + 1] = cols[i + 1] + (cols[i] >> DIGIT_BITS)
    out, carry = [], None
    for k in range(N_DIGITS, 2 * N_DIGITS):
        s = cols[k] if carry is None else cols[k] + carry
        out.append(s & MASK)
        carry = s >> DIGIT_BITS
    # result < 2p (carry here folds the 17th column; < 2 after reduction)
    out17 = carry + cols[2 * N_DIGITS]
    return _cond_sub_p(out, plus_carry=out17)


def kmont_mul_const(a: Sequence, c: int) -> list:
    """Montgomery product with a trace-time constant (zero digits skipped)."""
    cd = [(c % P >> (16 * k)) & 0xFFFF for k in range(N_DIGITS)]
    cols = [None] * (2 * N_DIGITS + 1)

    def acc(k, v):
        cols[k] = v if cols[k] is None else cols[k] + v

    for i in range(N_DIGITS):
        ai = a[i]
        for j in range(N_DIGITS):
            if cd[j] == 0:
                continue
            if cd[j] == 1:
                acc(i + j, ai)
                continue
            prod = ai * cd[j]
            acc(i + j, prod & MASK)
            acc(i + j + 1, prod >> DIGIT_BITS)
    zeros = jnp.zeros_like(a[0])
    for k in range(2 * N_DIGITS + 1):
        if cols[k] is None:
            cols[k] = zeros
    for i in range(N_DIGITS):
        m = (cols[i] * N0) & MASK
        for j in range(N_DIGITS):
            pj = P_DIGITS[j]
            if pj == 0:
                continue
            if pj == 1:
                cols[i + j] = cols[i + j] + m
            else:
                q = m * pj
                cols[i + j] = cols[i + j] + (q & MASK)
                cols[i + j + 1] = cols[i + j + 1] + (q >> DIGIT_BITS)
        cols[i + 1] = cols[i + 1] + (cols[i] >> DIGIT_BITS)
    out, carry = [], None
    for k in range(N_DIGITS, 2 * N_DIGITS):
        s = cols[k] if carry is None else cols[k] + carry
        out.append(s & MASK)
        carry = s >> DIGIT_BITS
    out17 = carry + cols[2 * N_DIGITS]
    return _cond_sub_p(out, plus_carry=out17)


def kmul_d(a: Sequence) -> list:
    """a * EDWARDS_D (= 3021) in the Montgomery domain."""
    from ...oracle.field import EDWARDS_D

    return kmont_mul_const(a, (EDWARDS_D * R_CONST) % P)


def kmul_2d(a: Sequence) -> list:
    """a * 2*EDWARDS_D in the Montgomery domain (hwcd-3 constant)."""
    from ...oracle.field import EDWARDS_D

    return kmont_mul_const(a, (2 * EDWARDS_D * R_CONST) % P)


def kselect(mask, a: Sequence, b: Sequence) -> list:
    return [jnp.where(mask, x, y) for x, y in zip(a, b)]
