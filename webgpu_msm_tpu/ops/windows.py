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
