"""Limb-planar 256-bit integer arithmetic on the VPU (jnp, uint32 lanes).

The device ISA layer — the TPU-native re-design of the reference's WGSL u256
library (`src/submission/wgsl/u256.wgsl`). Key differences from the WGSL:

- **SoA limb planes**: a batch of field elements is a list of 16 uint32
  arrays ("digit planes"), digit k holding bits [16k, 16k+16) for every
  element in the batch (little-endian digit order). Each VPU lane owns one
  element; all arithmetic is elementwise over planes.
- **16-bit digits in 32-bit lanes**: the TPU VPU has no u32xu32->u64
  multiply (same constraint WebGPU had, DESIGN.md:132-138), so products are
  16x16->32, exact in uint32 — the same digit split the WGSL `u256_mul`
  uses (u256.wgsl:419-444), but vectorized across the batch instead of
  unrolled per thread.
- **Lazy carries**: columns accumulate up to 2^22 before a single carry
  propagation pass, instead of per-addition carry chains.

All loops are Python trace-time loops over the 16 digit positions; XLA sees
a fully unrolled elementwise graph and fuses it.
"""
from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp

N_DIGITS = 16  # 16-bit digits per 256-bit value
DIGIT_BITS = 16
DIGIT_MASK = (1 << DIGIT_BITS) - 1
U32 = jnp.uint32

Digits = List[jnp.ndarray]  # 16 planes of identical shape, dtype uint32


def digits_of_int(value: int, shape=()) -> Digits:
    """Broadcast a python int constant to digit planes of the given shape."""
    return [
        jnp.full(shape, (value >> (DIGIT_BITS * k)) & DIGIT_MASK, dtype=U32)
        for k in range(N_DIGITS)
    ]


def int_digits(value: int) -> list[int]:
    """Python-int digit list (for trace-time constant folding)."""
    return [(value >> (DIGIT_BITS * k)) & DIGIT_MASK for k in range(N_DIGITS)]


def from_words_le(words: jnp.ndarray) -> Digits:
    """[8, ...] uint32 little-endian words -> 16 digit planes."""
    words = words.astype(U32)
    out: Digits = []
    for w in range(8):
        out.append(words[w] & DIGIT_MASK)
        out.append(words[w] >> DIGIT_BITS)
    return out


def to_words_le(digits: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """16 digit planes -> [8, ...] uint32 little-endian words."""
    rows = [
        digits[2 * w] | (digits[2 * w + 1] << DIGIT_BITS) for w in range(8)
    ]
    return jnp.stack(rows)


def stack(digits: Sequence[jnp.ndarray]) -> jnp.ndarray:
    return jnp.stack(list(digits))


def unstack(arr: jnp.ndarray) -> Digits:
    return [arr[k] for k in range(N_DIGITS)]


def add_no_reduce(a: Sequence[jnp.ndarray], b: Sequence[jnp.ndarray]) -> Digits:
    """a + b with carry propagation; result may be >= 2^256's digit range
    only if inputs are full-range (callers keep values < 2^255)."""
    out: Digits = []
    carry = None
    for k in range(N_DIGITS):
        s = a[k] + b[k] if carry is None else a[k] + b[k] + carry
        out.append(s & DIGIT_MASK)
        carry = s >> DIGIT_BITS
    return out


def sub_with_borrow(
    a: Sequence[jnp.ndarray], b: Sequence[jnp.ndarray]
) -> tuple[Digits, jnp.ndarray]:
    """(a - b) mod 2^256 and the final borrow (1 where a < b)."""
    out: Digits = []
    borrow = None
    for k in range(N_DIGITS):
        d = a[k] - b[k] if borrow is None else a[k] - b[k] - borrow
        out.append(d & DIGIT_MASK)
        # uint32 wraparound: borrow iff the subtraction went negative,
        # visible as high bits set beyond the digit mask.
        borrow = d >> 31
    return out, borrow


def sub_const_with_borrow(
    a: Sequence[jnp.ndarray], c: int
) -> tuple[Digits, jnp.ndarray]:
    """(a - c) for a python int constant c; skips zero digits at trace time."""
    cd = int_digits(c)
    out: Digits = []
    borrow = None
    for k in range(N_DIGITS):
        d = a[k]
        if cd[k]:
            d = d - U32(cd[k])
        if borrow is not None:
            d = d - borrow
        if cd[k] or borrow is not None:
            out.append(d & DIGIT_MASK)
            borrow = d >> 31
        else:
            out.append(d)
    if borrow is None:
        borrow = jnp.zeros_like(a[0])
    return out, borrow


def select(mask: jnp.ndarray, a: Sequence[jnp.ndarray], b: Sequence[jnp.ndarray]) -> Digits:
    """Elementwise: mask ? a : b, per digit plane. mask is boolean."""
    return [jnp.where(mask, a[k], b[k]) for k in range(N_DIGITS)]


def propagate_carries(cols: Sequence[jnp.ndarray], n_out: int = N_DIGITS) -> Digits:
    """Normalize lazy columns (< 2^32 each) to 16-bit digits.

    Columns beyond n_out are folded into the carry chain; the final carry is
    dropped (callers guarantee the true value fits in n_out digits).
    """
    out: Digits = []
    carry = None
    for k in range(len(cols)):
        s = cols[k] if carry is None else cols[k] + carry
        if k < n_out:
            out.append(s & DIGIT_MASK)
        carry = s >> DIGIT_BITS
    return out


def is_zero(a: Sequence[jnp.ndarray]) -> jnp.ndarray:
    acc = a[0]
    for k in range(1, N_DIGITS):
        acc = acc | a[k]
    return acc == 0
