"""Pure-Python prime-field arithmetic for the ed-on-bls12-377 base field.

This is the host-side correctness oracle (the TPU build's equivalent of the
reference's prebuilt Aleo/snarkVM WASM oracle, see SURVEY.md §2.4.4). The
modulus is the 253-bit prime from the reference's
`src/reference/params/AleoConstants.ts:2` (== the BLS12-377 scalar field Fr).

Everything here is exact bigint math; the device kernels in
`webgpu_msm_tpu.ops` are tested bit-exactly against this module.
"""
from __future__ import annotations

# Base field modulus of Aleo's embedded twisted Edwards curve
# (ark-ed-on-bls12-377 Fq == BLS12-377 Fr).
P = 8444461749428370424248824938781546531375899335154063827935233455917409239041

# Twisted Edwards curve coefficients (AleoConstants.ts:3-4): a = -1, d = 3021.
EDWARDS_A = P - 1
EDWARDS_D = 3021

# Order of the prime-order subgroup (AleoConstants.ts:5).
SUBGROUP_ORDER = 2111115437357092606062206234695386632838870926408408195193685246394721360383

# Montgomery parameters used by the device kernels (R = 2^256).
R_BITS = 256
R = 1 << R_BITS
R_MOD_P = R % P
R2_MOD_P = (R * R) % P
R_INV_MOD_P = pow(R % P, P - 2, P)
# -p^{-1} mod 2^32 / 2^16 (per-digit Montgomery constants).
N0_INV_32 = (-pow(P, -1, 1 << 32)) % (1 << 32)
N0_INV_16 = (-pow(P, -1, 1 << 16)) % (1 << 16)
# -p^{-1} mod 2^256 (full-width Montgomery constant for SOS-form REDC).
N0_INV_256 = (-pow(P, -1, 1 << 256)) % (1 << 256)


def fadd(a: int, b: int) -> int:
    return (a + b) % P


def fsub(a: int, b: int) -> int:
    return (a - b) % P


def fmul(a: int, b: int) -> int:
    return (a * b) % P


def fneg(a: int) -> int:
    return (-a) % P


def finv(a: int) -> int:
    if a % P == 0:
        raise ZeroDivisionError("field inverse of zero")
    return pow(a, P - 2, P)


def fsqrt(a: int) -> int | None:
    """Tonelli-Shanks square root; returns None if `a` is a non-residue."""
    a %= P
    if a == 0:
        return 0
    if pow(a, (P - 1) // 2, P) != 1:
        return None
    # P - 1 = q * 2^s with q odd.
    q, s = P - 1, 0
    while q % 2 == 0:
        q //= 2
        s += 1
    # Find a non-residue.
    z = 2
    while pow(z, (P - 1) // 2, P) != P - 1:
        z += 1
    m, c, t, r = s, pow(z, q, P), pow(a, q, P), pow(a, (q + 1) // 2, P)
    while t != 1:
        # Find least i, 0 < i < m, with t^(2^i) == 1.
        i, t2i = 0, t
        while t2i != 1:
            t2i = t2i * t2i % P
            i += 1
        b = pow(c, 1 << (m - i - 1), P)
        m, c = i, b * b % P
        t = t * c % P
        r = r * b % P
    return r


def to_mont(a: int) -> int:
    """Map a -> a * R mod p (Montgomery domain)."""
    return (a * R) % P


def from_mont(a: int) -> int:
    """Map a*R -> a mod p."""
    return (a * R_INV_MOD_P) % P


def mont_mul(a: int, b: int) -> int:
    """Montgomery product (a*R)*(b*R) -> a*b*R mod p, via plain bigint math."""
    return (a * b * R_INV_MOD_P) % P
