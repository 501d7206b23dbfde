"""Windowed scalar decomposition on device (jnp shifts/masks).

TPU-native equivalent of the reference's Rust `split_dynamic`
(`msm-wasm/src/lib.rs:58-84`) and the msm-macro compile-time splitter
(`msm-macro/src/lib.rs:73-178`): the per-window shift/mask program is
generated at *trace time* per window size — the Python loop below compiles
away exactly like the proc macro's unrolled expression did.

Scalars arrive as [8, n] little-endian uint32 word planes; output is the
[n_windows, n] uint32 digit matrix, window k holding bits [k*w, (k+1)*w)
(LSB-first indexing; the reference's MSB-first order is an indexing choice,
see oracle/msm.py).
"""
from __future__ import annotations

import jax.numpy as jnp

SCALAR_BITS = 256
WORD_BITS = 32
N_WORDS = 8


def n_windows(window_size: int) -> int:
    return -(-SCALAR_BITS // window_size)


def split_windows_signed(
    scalar_words: jnp.ndarray, window_size: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Signed-digit (balanced) decomposition: digits in [-2^(w-1), 2^(w-1)].

    Returns (buckets [K, n] = |digit|, signs [K, n] in {0, 1}). Negating an
    Edwards point is one field negation of x and t, so signed digits halve
    the bucket range: B = 2^(w-1)+1 instead of 2^w, letting a larger w (fewer
    windows -> fewer point adds) pay the same reduction cost.

    Requires scalars < 2^254 so the top window cannot produce a carry-out
    (callers check the top word; inputs are 253-bit field scalars,
    README.md:66-96).
    """
    w = window_size
    digits = split_windows(scalar_words, w)  # [K, n], values < 2^w
    K = n_windows(w)
    half = jnp.uint32(1 << (w - 1))
    full = jnp.uint32(1 << w)
    buckets, signs = [], []
    carry = jnp.zeros_like(digits[0])
    for k in range(K):
        v = digits[k] + carry  # <= 2^w
        neg = v >= half
        buckets.append(jnp.where(neg, full - v, v))  # |signed|; v==2^w -> 0
        signs.append(neg.astype(jnp.uint32))
        carry = neg.astype(jnp.uint32)
    return jnp.stack(buckets), jnp.stack(signs)


def split_windows(scalar_words: jnp.ndarray, window_size: int) -> jnp.ndarray:
    """[8, n] LE u32 words -> [n_windows, n] u32 digits."""
    w = window_size
    mask = jnp.uint32((1 << w) - 1)
    words = scalar_words.astype(jnp.uint32)
    rows = []
    for k in range(n_windows(w)):
        bit0 = k * w
        word = bit0 // WORD_BITS
        off = bit0 % WORD_BITS
        val = words[word] >> jnp.uint32(off)
        # Bits spilling into the next word (trace-time constant decision).
        if off + w > WORD_BITS and word + 1 < N_WORDS:
            val = val | (words[word + 1] << jnp.uint32(WORD_BITS - off))
        rows.append(val & mask)
    return jnp.stack(rows)
