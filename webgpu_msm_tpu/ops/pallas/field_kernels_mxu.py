"""MXU-offloaded Montgomery multiplication for Pallas TPU kernels.

The CIOS form (field_kernels.kmont_mul) interleaves 16 serial REDC rounds,
each a data-dependent carry chain — poor ILP on a deep-pipelined VPU. Here
REDC is restructured as two *constant-matrix* products that run on the MXU:

    m  = (T mod R) * N0' mod R      -> m8  = M1 @ bytes(T_lo)
    mp = m * p                      -> mp8 = M2 @ bytes(m8)

Both maps are linear over lazy (un-carried) digit columns: a dropped term
c_i * n_j * 2^(8(i+j)) with i+j >= 32 is 0 mod 2^256, so no normalization
is needed before the truncated product. Inputs are split into exact 8-bit
bytes (mask/shift only — no carry chains); every f32 contraction stays below
2^24 (exact): byte products <= 255^2, contracted over <= 96 terms < 2^23.

The only remaining serial chains are one 16-step carry fold of the low half
and one 16-step final normalization — versus 16 dependent REDC rounds of
~40 ops each in CIOS.

Algorithm spec from the reference: u256 digit product (u256.wgsl:419-444),
Montgomery constants (field_modulus.wgsl:96-110); the MXU mapping is new.
"""
from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from ...oracle.field import P, N0_INV_256
from . import field_kernels as fk

N16 = 16  # 16-bit digits per 256-bit value
N8 = 32  # 8-bit digits
MASK8 = 0xFF


def _digits8(v: int, n: int) -> list[int]:
    return [(v >> (8 * k)) & MASK8 for k in range(n)]


@functools.cache
def _m1_matrix() -> np.ndarray:
    """[32, 48] f32: 48 byte-planes of T_lo (16 lazy u32 16-bit cols x 3
    bytes) -> 32 lazy 8-bit columns of m = T*N0' mod 2^256."""
    n0 = _digits8(N0_INV_256, N8)
    m = np.zeros((N8, N16 * 3), dtype=np.float32)
    for k in range(N16):  # 16-bit column index (8-bit position 2k)
        for j in range(3):  # byte j of the lazy u32 column (position 2k+j)
            pos = 2 * k + j
            for c in range(N8):  # output 8-bit column
                q = c - pos
                if 0 <= q < N8 and n0[q]:
                    m[c, 3 * k + j] = n0[q]
    return m


@functools.cache
def _m2_matrix() -> np.ndarray:
    """[64, 32] f32: 32 normalized 8-bit digits of m -> lazy 8-bit columns
    of m * p (positions 0..63); products <= 255^2 * 32 < 2^24, f32-exact."""
    p8 = _digits8(P, N8)
    out_cols = 2 * N8
    m = np.zeros((out_cols, N8), dtype=np.float32)
    for c in range(N8):
        for o in range(out_cols):
            q = o - c
            if 0 <= q < N8 and p8[q]:
                m[o, c] = p8[q]
    return m


def _to_f32(x):
    # Mosaic lacks a direct uint32->float32 cast; values are < 2^24 so the
    # int32 route is exact.
    return x.astype(jnp.int32).astype(jnp.float32)


def _to_u32(x):
    return x.astype(jnp.int32).astype(jnp.uint32)


def _bytes3(cols):
    """Lazy u32 columns (< 2^24) -> 3 exact byte planes each (no carries)."""
    out = []
    for c in cols:
        out.append(_to_f32(c & MASK8))
        out.append(_to_f32((c >> 8) & MASK8))
        out.append(_to_f32(c >> 16))
    return out


def const_inputs() -> tuple[np.ndarray, np.ndarray]:
    """(M1 [32,48], M2 [64,32]) f32 — pass as pallas_call inputs (Pallas
    kernels cannot capture array constants)."""
    return _m1_matrix(), _m2_matrix()


def _matvec(mat: jnp.ndarray, planes) -> list:
    """[O, I] matrix @ I stacked planes [*S] -> O planes, via MXU."""
    x = jnp.stack(planes)  # [I, *S]
    s = x.shape[1:]
    x2 = x.reshape(x.shape[0], -1)  # [I, prod(S)]
    out = jnp.dot(mat, x2, preferred_element_type=jnp.float32)  # [O, prod(S)]
    return [out[i].reshape(s) for i in range(mat.shape[0])]


def _product_cols(a, b) -> list:
    """Lazy Comba columns (33) of the 256x256 digit product, u32."""
    cols = [None] * (2 * N16 + 1)

    def acc(k, v):
        cols[k] = v if cols[k] is None else cols[k] + v

    for i in range(N16):
        ai = a[i]
        for j in range(N16):
            prod = ai * b[j]
            acc(i + j, prod & 0xFFFF)
            acc(i + j + 1, prod >> 16)
    z = jnp.zeros_like(a[0])
    return [c if c is not None else z for c in cols]


def kmont_mul_mxu(a, b, m1, m2) -> list:
    """Montgomery product a*b*R^-1 mod p via MXU REDC; inputs/outputs < p,
    16-bit digit planes (same contract as fk.kmont_mul). m1/m2 are the
    `const_inputs()` matrices, read inside the kernel."""
    colsT = _product_cols(a, b)  # 33 lazy u32 cols, < 2^21

    # m = (T mod 2^256) * N0' mod 2^256, in lazy 8-bit cols (f32 <= 2^23)
    t_bytes = _bytes3(colsT[:N16])
    m8f = _matvec(m1, t_bytes)

    # Normalize m to true 8-bit digits mod 2^256 (m must be < 2^256 for the
    # (T + m*p)/R < 2p bound; the carry past digit 31 drops mod 2^256).
    m8 = []
    carry = None
    for c in m8f:
        ci = _to_u32(c)
        s = ci if carry is None else ci + carry
        m8.append(s & MASK8)
        carry = s >> 8

    # mp = m * p via MXU, lazy 8-bit cols
    mp8f = _matvec(m2, [_to_f32(d) for d in m8])
    mp8 = [_to_u32(c) for c in mp8f]

    # merge mp8 into 16-bit column space: mp16[k] = mp8[2k] + (mp8[2k+1] << 8)
    n_mp16 = (len(mp8) + 1) // 2
    mp16 = []
    for k in range(n_mp16):
        lo = mp8[2 * k]
        hi = mp8[2 * k + 1] if 2 * k + 1 < len(mp8) else None
        mp16.append(lo if hi is None else lo + (hi << 8))

    # total = T + m*p; low 16 columns vanish mod 2^256 — fold their carries.
    carry = None
    for k in range(N16):
        s = colsT[k] + mp16[k] if carry is None else colsT[k] + mp16[k] + carry
        carry = s >> 16
    out = []
    for k in range(N16):
        hi_t = colsT[N16 + k]
        hi_mp = mp16[N16 + k] if N16 + k < len(mp16) else None
        s = hi_t if hi_mp is None else hi_t + hi_mp
        s = s + carry
        out.append(s & 0xFFFF)
        carry = s >> 16
    extra = colsT[2 * N16]
    if len(mp16) > 2 * N16:
        extra = extra + mp16[2 * N16]
    out17 = carry + extra
    return fk._cond_sub_p(out, plus_carry=out17)
