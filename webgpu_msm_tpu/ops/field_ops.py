"""Vectorized Fp arithmetic in the Montgomery domain (jnp over digit planes).

TPU-native replacement for the reference's WGSL field library
(`src/submission/wgsl/field_modulus.wgsl`). The reference's production path
used double-and-add field multiplication because Montgomery lost on WebGPU
(DESIGN.md:132-138 — no mulhi, no subgroup ops); those constraints don't
bind here.

Design: **separated-operand-scanning (SOS) Montgomery** over 16-bit digit
planes, tensorized so each 256x256-bit multiply is a handful of large fused
VPU ops instead of hundreds of scalar-graph nodes:

    T    = a * b                      (one broadcasted [16,16,batch] multiply)
    m    = (T mod R) * (-p^-1) mod R  (low-half multiply, R = 2^256)
    res  = (T + m*p) / R              (constant multiply + carry propagation)

Digit products are 16x16 -> 32-bit (exact in uint32 — the same digit split
WGSL's u256_mul uses, u256.wgsl:419-444); columns accumulate lazily up to
~2^22 before one carry-propagation pass. Values are kept in the Montgomery
domain (a*R mod p) end-to-end; add/sub/select are domain-agnostic.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
import jax.numpy as jnp

from ..oracle.field import P, N0_INV_256, R_MOD_P, R2_MOD_P, R
from . import limbs
from .limbs import DIGIT_BITS, DIGIT_MASK, N_DIGITS, U32, Digits

_P_DIGITS = limbs.int_digits(P)
_N0_DIGITS = limbs.int_digits(N0_INV_256)


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


def _const_planes(digits16: list[int], batch_rank: int) -> jnp.ndarray:
    """[16] int digits -> [16, 1, ...] uint32 broadcastable constant."""
    arr = np.asarray(digits16, dtype=np.uint32).reshape((16,) + (1,) * batch_rank)
    return jnp.asarray(arr)


def _mul_columns(A: jnp.ndarray, B: jnp.ndarray, n_cols: int) -> list:
    """Lazy Comba columns of the digit product of A [16,*S] and B.

    B is [16,*S] or a broadcastable constant [16,1..]. Returns `n_cols`
    columns (pass 32 for a full product, 16 for a mod-2^256 low half).
    Column k collects lo16(a_i*b_j) for i+j == k and hi16 for i+j+1 == k;
    each column stays < 2^21.
    """
    prod = A[:, None] * B[None, :]  # [16, 16, *S]
    lo = prod & DIGIT_MASK
    hi = prod >> DIGIT_BITS
    batch = prod.shape[2:]
    width = n_cols
    rows = []
    pad_cfg = [(0, 0)] * (1 + len(batch))
    for i in range(N_DIGITS):
        # row i of lo contributes to columns i..i+15; hi to i+1..i+16.
        lo_row = lo[i]
        hi_row = hi[i]
        if i < width:
            take = min(width - i, N_DIGITS)
            r = jnp.pad(lo_row[:take], [(i, width - i - take)] + pad_cfg[1:])
            rows.append(r)
        if i + 1 < width:
            take = min(width - i - 1, N_DIGITS)
            r = jnp.pad(hi_row[:take], [(i + 1, width - i - 1 - take)] + pad_cfg[1:])
            rows.append(r)
    cols = rows[0]
    for r in rows[1:]:
        cols = cols + r
    return [cols[k] for k in range(width)]


def _normalize(cols: list, n_out: int, keep_carry: bool):
    """Carry-propagate lazy columns into 16-bit digits.

    Returns (digits[:n_out], final_carry or None). Columns beyond n_out are
    not consumed — callers slice what they pass.
    """
    out = []
    carry = None
    for k in range(len(cols)):
        s = cols[k] if carry is None else cols[k] + carry
        out.append(s & DIGIT_MASK)
        carry = s >> DIGIT_BITS
    return out[:n_out], (carry if keep_carry else None)


def _cond_sub_p(digits: Digits) -> Digits:
    d, borrow = limbs.sub_const_with_borrow(digits, P)
    return limbs.select(borrow == 1, digits, d)


def _mont_reduce(colsT: list, batch_rank: int) -> Digits:
    """SOS Montgomery reduction of 33 lazy product columns -> [0, p)."""
    # Exact low half (T mod 2^256) feeds the m computation.
    t_lo, carry = _normalize(colsT[:N_DIGITS], N_DIGITS, keep_carry=True)
    colsT_hi = list(colsT[N_DIGITS:])
    colsT_hi[0] = colsT_hi[0] + carry

    T_lo = jnp.stack(t_lo)
    n0 = _const_planes(_N0_DIGITS, batch_rank)
    m_cols = _mul_columns(T_lo, n0, N_DIGITS)
    m_dig, _ = _normalize(m_cols, N_DIGITS, keep_carry=False)  # m mod 2^256

    M = jnp.stack(m_dig)
    pc = _const_planes(_P_DIGITS, batch_rank)
    mp_cols = _mul_columns(M, pc, 2 * N_DIGITS + 1)

    # (T + m*p): low 256 bits vanish; propagate their carries into the top.
    low = [a + b for a, b in zip(t_lo, mp_cols[:N_DIGITS])]
    _, carry_low = _normalize(low, 0, keep_carry=True)
    high = [a + b for a, b in zip(colsT_hi, mp_cols[N_DIGITS:])]
    high[0] = high[0] + carry_low
    digits, _ = _normalize(high, N_DIGITS, keep_carry=False)
    return _cond_sub_p(digits)


def mont_mul(a: Sequence[jnp.ndarray], b: Sequence[jnp.ndarray]) -> Digits:
    """Montgomery product: (a*b*R^-1) mod p, inputs/outputs in [0, p)."""
    A = jnp.stack(list(a))
    B = jnp.stack(list(b))
    colsT = _mul_columns(A, B, 2 * N_DIGITS + 1)
    return _mont_reduce(colsT, A.ndim - 1)


def mont_sqr(a: Sequence[jnp.ndarray]) -> Digits:
    """Montgomery square (the tensorized product makes symmetry moot)."""
    return mont_mul(a, a)


def mont_mul_const(a: Sequence[jnp.ndarray], c: int) -> Digits:
    """Montgomery product with a python-int constant: (a*c*R^-1) mod p."""
    A = jnp.stack(list(a))
    cc = _const_planes(limbs.int_digits(c % P), A.ndim - 1)
    colsT = _mul_columns(A, cc, 2 * N_DIGITS + 1)
    return _mont_reduce(colsT, A.ndim - 1)


def mul_plain_const(a: Sequence[jnp.ndarray], k: int) -> Digits:
    """(a * k) mod p for a constant k, correct for Montgomery-domain a.

    (a*R) * (k*R) * R^-1 = a*k*R — stays in domain. Used for the curve
    constant d = 3021 (curve.wgsl:49).
    """
    return mont_mul_const(a, (k * R) % P)


def mont_pow_const(a: Sequence[jnp.ndarray], e: int) -> Digits:
    """â = a·R -> (a^e)·R for a python-int exponent (device field_pow).

    Left-to-right square-and-multiply under ONE lax.scan over the
    (trace-time constant) exponent bits — 2 Montgomery products per step,
    so the compiled graph is 2 montmuls regardless of e. The analog of the
    reference's WGSL field_pow (FieldModulus.ts:119-145), which WebGPU ran
    as a data-dependent while-loop per thread.
    """
    from jax import lax

    if e == 0:
        return limbs.digits_of_int(R_MOD_P, jnp.stack(list(a)).shape[1:])
    A = jnp.stack(list(a))
    bits = np.array(
        [(e >> i) & 1 for i in reversed(range(e.bit_length()))], dtype=np.uint32
    )
    acc0 = jnp.stack(limbs.digits_of_int(R_MOD_P, A.shape[1:]))  # mont 1

    def step(acc_st, bit):
        sq = mont_sqr(limbs.unstack(acc_st))
        mul = mont_mul(sq, limbs.unstack(A))
        return jnp.stack(limbs.select(bit == 1, mul, sq)), None

    acc_st, _ = lax.scan(step, acc0, jnp.asarray(bits))
    return limbs.unstack(acc_st)


def finv_mont(a: Sequence[jnp.ndarray]) -> Digits:
    """Montgomery-domain field inverse: â = a·R -> (a^-1)·R; maps 0 to 0.

    Fermat (e = p - 2) — the device-side field_inverse capability of the
    reference's WGSL library (FieldModulus.ts:147-164), used here for
    on-device affine conversion (config.device_affine).
    """
    return mont_pow_const(a, P - 2)


def to_mont(a: Sequence[jnp.ndarray]) -> Digits:
    """a -> a*R mod p (constant multiply by R^2)."""
    return mont_mul_const(a, R2_MOD_P)


def from_mont(a: Sequence[jnp.ndarray]) -> Digits:
    """a*R -> a mod p (REDC with multiplier 1)."""
    return mont_mul_const(a, 1)
