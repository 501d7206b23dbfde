"""Vectorized Fp arithmetic in the Montgomery domain (jnp over digit planes).

TPU-native replacement for the reference's WGSL field library
(`src/submission/wgsl/field_modulus.wgsl`). The reference's production path
used double-and-add field multiplication because Montgomery lost on WebGPU
(DESIGN.md:132-138 — no mulhi, no subgroup ops); those constraints don't
bind here: with 16-bit digit planes, Montgomery product scanning (Comba
columns + interleaved REDC) is a flat sequence of elementwise vector
mul/add/shift ops, ~2.4k VPU ops per batched multiply regardless of batch
width.

Values are kept in the Montgomery domain (a*R mod p, R = 2^256) end-to-end;
add/sub/select are domain-agnostic.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from ..oracle.field import P, N0_INV_16, R_MOD_P, R2_MOD_P
from . import limbs
from .limbs import (
    DIGIT_BITS,
    DIGIT_MASK,
    N_DIGITS,
    U32,
    Digits,
)

_P_DIGITS = limbs.int_digits(P)
_N0 = N0_INV_16


def field_add(a: Sequence[jnp.ndarray], b: Sequence[jnp.ndarray]) -> Digits:
    """(a + b) mod p for a, b < p."""
    s = limbs.add_no_reduce(a, b)
    d, borrow = limbs.sub_const_with_borrow(s, P)
    # borrow == 1 means s < p: keep s.
    return limbs.select(borrow == 1, s, d)


def field_sub(a: Sequence[jnp.ndarray], b: Sequence[jnp.ndarray]) -> Digits:
    """(a - b) mod p for a, b < p."""
    d, borrow = limbs.sub_with_borrow(a, b)
    dp = limbs.add_no_reduce(d, limbs.digits_of_int(P, ()))
    return limbs.select(borrow == 1, dp, d)


def field_double(a: Sequence[jnp.ndarray]) -> Digits:
    return field_add(a, a)


def field_neg(a: Sequence[jnp.ndarray]) -> Digits:
    """(-a) mod p; maps 0 to 0. Mirrors curve.wgsl:29-33 (mul by a = -1)."""
    p_minus_a, _ = limbs.sub_with_borrow(limbs.digits_of_int(P, ()), a)
    zero = limbs.is_zero(a)
    return limbs.select(zero, a, p_minus_a)


def _accumulate_product(
    cols: list, a: Sequence[jnp.ndarray], b: Sequence[jnp.ndarray]
) -> None:
    """cols[i+j] += lo16(a_i*b_j); cols[i+j+1] += hi16 — Comba columns.

    Column magnitudes stay < 2^22 (<= 32 terms of < 2^16 plus REDC terms),
    far from uint32 overflow.
    """
    for i in range(N_DIGITS):
        ai = a[i]
        for j in range(N_DIGITS):
            prod = ai * b[j]
            lo = prod & DIGIT_MASK
            hi = prod >> DIGIT_BITS
            cols[i + j] = lo if cols[i + j] is None else cols[i + j] + lo
            cols[i + j + 1] = hi if cols[i + j + 1] is None else cols[i + j + 1] + hi


def _redc_in_place(cols: list) -> Digits:
    """Interleaved Montgomery reduction over 32 lazy columns -> 16 digits.

    For each of the 16 low digit positions: m = cols[i] * (-p^-1) mod 2^16,
    add m*p shifted by i digits, then fold the (now 16-bit-aligned) column
    into the next. p's zero digits are skipped at trace time (the jnp
    equivalent of the msm-macro's compile-time codegen, SURVEY.md §2.4.2).
    """
    for i in range(N_DIGITS):
        m = (cols[i] * U32(_N0)) & DIGIT_MASK
        for j in range(N_DIGITS):
            pj = _P_DIGITS[j]
            if pj == 0:
                continue
            q = m if pj == 1 else m * U32(pj)
            lo = q & DIGIT_MASK
            hi = q >> DIGIT_BITS
            if pj == 1:
                cols[i + j] = cols[i + j] + q
            else:
                cols[i + j] = cols[i + j] + lo
                cols[i + j + 1] = cols[i + j + 1] + hi
        # cols[i] is now ≡ 0 mod 2^16; carry it into the next column.
        cols[i + 1] = cols[i + 1] + (cols[i] >> DIGIT_BITS)
    high = cols[N_DIGITS : 2 * N_DIGITS + 1]
    digits = limbs.propagate_carries(high, N_DIGITS)
    # REDC output < 2p: one conditional subtract.
    d, borrow = limbs.sub_const_with_borrow(digits, P)
    return limbs.select(borrow == 1, digits, d)


def mont_mul(a: Sequence[jnp.ndarray], b: Sequence[jnp.ndarray]) -> Digits:
    """Montgomery product: (a*b*R^-1) mod p, inputs/outputs in [0, p)."""
    cols: list = [None] * (2 * N_DIGITS + 1)
    _accumulate_product(cols, a, b)
    zeros = jnp.zeros_like(a[0])
    cols = [zeros if c is None else c for c in cols]
    return _redc_in_place(cols)


def mont_sqr(a: Sequence[jnp.ndarray]) -> Digits:
    """Montgomery square; exploits product symmetry (~45% fewer multiplies)."""
    cols: list = [None] * (2 * N_DIGITS + 1)

    def acc(k: int, v: jnp.ndarray) -> None:
        cols[k] = v if cols[k] is None else cols[k] + v

    for i in range(N_DIGITS):
        prod = a[i] * a[i]
        acc(2 * i, prod & DIGIT_MASK)
        acc(2 * i + 1, prod >> DIGIT_BITS)
        for j in range(i + 1, N_DIGITS):
            prod = a[i] * a[j]
            lo = (prod & DIGIT_MASK) << 1  # < 2^17: still lazy-safe
            hi = (prod >> DIGIT_BITS) << 1
            acc(i + j, lo)
            acc(i + j + 1, hi)
    zeros = jnp.zeros_like(a[0])
    cols[:] = [zeros if c is None else c for c in cols]
    return _redc_in_place(cols)


def mont_mul_const(a: Sequence[jnp.ndarray], c: int) -> Digits:
    """Montgomery product with a python-int constant: (a*c*R^-1) mod p.

    The constant's digits fold at trace time (zero digits skipped, unit
    digits become adds) — the jnp analog of the reference's msm-macro
    compile-time monomorphization. To multiply a Montgomery value by a
    plain constant k, pass c = k*R mod p (so the R^-1 cancels).
    """
    cd = limbs.int_digits(c % P)
    cols: list = [None] * (2 * N_DIGITS + 1)

    def acc(k: int, v: jnp.ndarray) -> None:
        cols[k] = v if cols[k] is None else cols[k] + v

    for i in range(N_DIGITS):
        ai = a[i]
        for j in range(N_DIGITS):
            if cd[j] == 0:
                continue
            if cd[j] == 1:
                acc(i + j, ai)
                continue
            prod = ai * U32(cd[j])
            acc(i + j, prod & DIGIT_MASK)
            acc(i + j + 1, prod >> DIGIT_BITS)
    zeros = jnp.zeros_like(a[0])
    cols = [zeros if col is None else col for col in cols]
    return _redc_in_place(cols)


def mul_plain_const(a: Sequence[jnp.ndarray], k: int) -> Digits:
    """(a * k) mod p for a constant k, correct for Montgomery-domain a.

    (a*R) * (k*R) * R^-1 = a*k*R — stays in domain. Used for the curve
    constant d = 3021 (curve.wgsl:49).
    """
    from ..oracle.field import R

    return mont_mul_const(a, (k * R) % P)


def to_mont(a: Sequence[jnp.ndarray]) -> Digits:
    """a -> a*R mod p (constant multiply by R^2)."""
    return mont_mul_const(a, R2_MOD_P)


def from_mont(a: Sequence[jnp.ndarray]) -> Digits:
    """a*R -> a mod p (REDC with multiplier 1)."""
    return mont_mul_const(a, 1)
