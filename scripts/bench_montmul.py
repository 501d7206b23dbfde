"""Correctness + throughput: CIOS montmul vs MXU-REDC montmul (Pallas).

Chains of dependent Montgomery products (8 parallel chains for ILP) inside
one kernel; slope timing over two grid sizes cancels the tunnel round-trip.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from webgpu_msm_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from webgpu_msm_tpu.oracle import field as ofield
from webgpu_msm_tpu.ops.pallas import field_kernels as fk
from webgpu_msm_tpu.ops.pallas import field_kernels_mxu as fkm

R, C = 8, 128
CHAIN = 8  # dependent montmuls per chain
N_CHAINS = 2


def make_kernel(mul, with_consts):
    def kernel(a_ref, b_ref, *rest):
        if with_consts:
            m1_ref, m2_ref, o_ref = rest
            m1, m2 = m1_ref[...], m2_ref[...]
            op = lambda x, y: mul(x, y, m1, m2)
        else:
            (o_ref,) = rest
            op = mul
        a = [a_ref[d] for d in range(16)]
        b = [b_ref[d] for d in range(16)]
        accs = [a] * N_CHAINS
        for _ in range(CHAIN):
            accs = [op(acc, b) for acc in accs]
        out = accs[0]
        for acc in accs[1:]:
            out = [x ^ y for x, y in zip(out, acc)]
        for d in range(16):
            o_ref[d] = out[d]

    return kernel


def run(mul, grid, a, b, interpret=False, with_consts=False):
    spec = pl.BlockSpec((16, R, C), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    in_specs = [spec, spec]
    args = [a, b]
    if with_consts:
        m1, m2 = fkm.const_inputs()
        for m in (m1, m2):
            in_specs.append(
                pl.BlockSpec(m.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            )
            args.append(jnp.asarray(m))
    return pl.pallas_call(
        make_kernel(mul, with_consts),
        out_shape=jax.ShapeDtypeStruct((16, R, C), jnp.uint32),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=spec,
        interpret=interpret,
    )(*args)


def digits_of(vals):
    out = np.zeros((16, R, C), dtype=np.uint32)
    for i, v in enumerate(np.asarray(vals).ravel()):
        r, c = divmod(i, C)
        for d in range(16):
            out[d, r, c] = (int(v) >> (16 * d)) & 0xFFFF
    return out


def vals_of(digits):
    digits = np.asarray(digits)
    out = np.zeros((R, C), dtype=object)
    for r in range(R):
        for c in range(C):
            v = 0
            for d in range(16):
                v |= int(digits[d, r, c]) << (16 * d)
            out[r, c] = v
    return out


def main():
    interpret = jax.default_backend() != "tpu"
    rng = np.random.default_rng(0)
    av = [int.from_bytes(rng.bytes(31), "little") % ofield.P for _ in range(R * C)]
    bv = [int.from_bytes(rng.bytes(31), "little") % ofield.P for _ in range(R * C)]
    a = jnp.asarray(digits_of(av))
    b = jnp.asarray(digits_of(bv))

    # correctness: one chain step vs oracle
    for name, mul, wc in [("cios", fk.kmont_mul, False), ("mxu", fkm.kmont_mul_mxu, True)]:
        out = np.asarray(run(mul, 1, a, b, interpret=interpret, with_consts=wc))
        got = vals_of(out)
        ok = True
        for i in range(R * C):
            r, c = divmod(i, C)
            acc = [av[i]] * N_CHAINS
            for _ in range(CHAIN):
                acc = [ofield.mont_mul(x, bv[i]) for x in acc]
            want = 0
            for x in acc:
                want ^= x
            if int(got[r, c]) != want:
                ok = False
                print(f"{name} MISMATCH at {i}: {got[r,c]} != {want}")
                break
        print(f"{name:6s} correct: {ok}")

    if interpret:
        return

    def slope(mul, wc):
        def measure(g):
            out = run(mul, g, a, b, with_consts=wc)
            np.asarray(out.ravel()[0])
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                np.asarray(run(mul, g, a, b, with_consts=wc).ravel()[0])
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        g1, g2 = 2048, 8192
        d1, d2 = measure(g1), measure(g2)
        per_mul = (d2 - d1) / ((g2 - g1) * CHAIN * N_CHAINS)
        return per_mul, d1, d2

    for name, mul, wc in [("cios", fk.kmont_mul, False), ("mxu", fkm.kmont_mul_mxu, True)]:
        per_mul, d1, d2 = slope(mul, wc)
        print(
            f"{name:6s} {per_mul*1e9:8.1f} ns per (8,128)-tile montmul "
            f"({per_mul*1e9*0.94:7.1f} cyc)  [{d1*1e3:.1f}/{d2*1e3:.1f} ms]"
        )


if __name__ == "__main__":
    main()
