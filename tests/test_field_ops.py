"""Bit-exact tests of the jnp digit-plane field layer against the oracle.

Style mirrors the reference's utils.test.ts round-trips and
FieldMath-vector tables (SURVEY.md §4.1), plus randomized property checks.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from webgpu_msm_tpu.oracle import field as F
from webgpu_msm_tpu.ops import limbs, field_ops
from webgpu_msm_tpu.utils import convert


def to_digits(values):
    """list[int] -> digit planes [16, n]."""
    words = convert.bigints_to_words_le(values)  # [8, n]
    return limbs.from_words_le(jnp.asarray(words))


def from_digits(digits):
    words = np.asarray(limbs.to_words_le(digits))
    return convert.words_le_to_bigints(words)


def rand_field_elems(n, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        v = 0
        for _ in range(8):
            v = (v << 32) | int(rng.integers(0, 1 << 32))
        out.append(v % F.P)
    return out


def test_words_roundtrip():
    vals = [0, 1, F.P - 1, 2**255 - 1, 0xDEADBEEF] + rand_field_elems(11, 3)
    # full 256-bit round trip (not reduced mod p)
    digs = to_digits(vals)
    assert from_digits(digs) == vals


@pytest.mark.parametrize("op,oracle_op", [
    ("add", F.fadd),
    ("sub", F.fsub),
])
def test_field_add_sub(op, oracle_op):
    a = rand_field_elems(64, 10) + [0, 0, F.P - 1, F.P - 1]
    b = rand_field_elems(64, 11) + [0, F.P - 1, 0, F.P - 1]
    da, db = to_digits(a), to_digits(b)
    fn = field_ops.field_add if op == "add" else field_ops.field_sub
    got = from_digits(fn(da, db))
    want = [oracle_op(x, y) for x, y in zip(a, b)]
    assert got == want


def test_field_neg():
    a = rand_field_elems(32, 12) + [0, 1, F.P - 1]
    got = from_digits(field_ops.field_neg(to_digits(a)))
    assert got == [F.fneg(x) for x in a]


def test_mont_mul_random():
    a = rand_field_elems(128, 20) + [0, 1, F.P - 1, F.R_MOD_P]
    b = rand_field_elems(128, 21) + [F.P - 1, 0, F.P - 1, 1]
    da, db = to_digits(a), to_digits(b)
    got = from_digits(field_ops.mont_mul(da, db))
    want = [F.mont_mul(x, y) for x, y in zip(a, b)]
    assert got == want


def test_mont_sqr_random():
    a = rand_field_elems(96, 22) + [0, 1, F.P - 1]
    got = from_digits(field_ops.mont_sqr(to_digits(a)))
    want = [F.mont_mul(x, x) for x in a]
    assert got == want


def test_mont_mul_const_and_plain():
    a = rand_field_elems(64, 23) + [0, 1, F.P - 1]
    for c in [1, 2, 3021, F.R2_MOD_P, F.P - 1]:
        got = from_digits(field_ops.mont_mul_const(to_digits(a), c))
        want = [F.mont_mul(x, c) for x in a]
        assert got == want, f"mont_mul_const c={c}"
    # plain-constant multiply in the Montgomery domain: d * x
    xs = rand_field_elems(32, 24)
    mont_xs = [F.to_mont(x) for x in xs]
    got = from_digits(field_ops.mul_plain_const(to_digits(mont_xs), 3021))
    want = [F.to_mont(F.fmul(3021, x)) for x in xs]
    assert got == want


def test_to_from_mont_roundtrip():
    a = rand_field_elems(48, 25) + [0, 1, F.P - 1]
    d = to_digits(a)
    mont = field_ops.to_mont(d)
    assert from_digits(mont) == [F.to_mont(x) for x in a]
    back = field_ops.from_mont(mont)
    assert from_digits(back) == a


def test_scalar_mul_chain_exactness():
    """Long dependent chains must not accumulate any drift (bit-exactness)."""
    a = rand_field_elems(8, 30)

    d = to_digits(a)
    for _ in range(12):
        d = field_ops.mont_mul(d, d)
        d = field_ops.field_add(d, d)
    got = from_digits(d)
    want = list(a)
    for _ in range(12):
        want = [F.fadd(z, z) for z in (F.mont_mul(x, x) for x in want)]
    assert got == want


def test_device_field_inverse_and_pow():
    """finv_mont / mont_pow_const vs the oracle (FieldModulus.ts:119-164
    parity — the device-side field_inverse/field_pow capability)."""
    a = rand_field_elems(6, 31) + [1, F.P - 1, 3021]
    mont = to_digits([F.to_mont(x) for x in a])

    inv = field_ops.finv_mont(mont)
    got = from_digits(field_ops.from_mont(inv))
    assert got == [F.finv(x) for x in a]

    # finv_mont(0) == 0 (Fermat maps 0 to 0; matches WGSL field_inverse)
    z = field_ops.finv_mont(to_digits([0]))
    assert from_digits(field_ops.from_mont(z)) == [0]

    # generic pow: x^5 in the Montgomery domain
    p5 = field_ops.mont_pow_const(mont, 5)
    got5 = from_digits(field_ops.from_mont(p5))
    assert got5 == [pow(x, 5, F.P) for x in a]
    # e == 0 -> mont 1
    p0 = field_ops.mont_pow_const(mont, 0)
    assert from_digits(field_ops.from_mont(p0)) == [1] * len(a)
