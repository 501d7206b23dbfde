"""Pallas TPU kernels for batched twisted Edwards point operations.

The device ISA layer of the TPU build — replacing the reference's WGSL
entry_padd_idx.wgsl (one PADD per GPU thread driven by host-computed index
triples) with VMEM-resident vector kernels:

- `padd(a, b)`            unified add over point batches
- `padd_masked(a,b,m)`    lane-masked add (`m ? a+b : a`) — the building
                          block of the log-depth segmented/suffix scans
- `accumulate_scan(...)`  the production fused bucket-accumulation scan
- `grouped_running_sum`   the fused bucket-reduction scan
- `to_niels(...)`         input conversion to Montgomery Niels form

Point batches are stacked uint32 arrays [4, 16, W] (coords x Montgomery
digits x width); kernels view width as [W/128, 128] 2D tiles so every digit
op fills full 8x128 VPU tiles. Width must be a multiple of 1024.

On non-TPU backends the kernels run in Pallas interpret mode — the "fake
device" tier the reference never had (SURVEY.md §4).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import field_kernels as fk

LANES = 128
SUBLANES = 8
TILE = LANES * SUBLANES  # minimum width granularity


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _unified_add(p1c, p2c, mul=None):
    """add-2008-hwcd-3 (a=-1) on digit-list coordinate tuples.

    Same group law as the reference's curve.wgsl:36-63, one fewer multiply.
    `mul` selects the Montgomery-product engine (default CIOS on the VPU;
    the scan kernel passes the MXU-REDC variant when enabled)."""
    if mul is None:
        mul = fk.kmont_mul
    x1, y1, t1, z1 = p1c
    x2, y2, t2, z2 = p2c
    a = mul(fk.ksub(y1, x1), fk.ksub(y2, x2))
    b = mul(fk.kadd(y1, x1), fk.kadd(y2, x2))
    c = fk.kmul_2d(mul(t1, t2))
    zz = mul(z1, z2) if z2 is not None else z1
    d = fk.kadd(zz, zz)
    e = fk.ksub(b, a)
    f = fk.ksub(d, c)
    g = fk.kadd(d, c)
    h = fk.kadd(b, a)
    return (
        mul(e, f),
        mul(g, h),
        mul(e, h),
        mul(f, g),
    )


def _niels_add(p1c, niels, mul=None):
    """p1 + p2 with p2 in Niels form (y-x, y+x, 2d*t; z == 1): 7 multiplies."""
    if mul is None:
        mul = fk.kmont_mul
    x1, y1, t1, z1 = p1c
    ym2, yp2, td2 = niels
    a = mul(fk.ksub(y1, x1), ym2)
    b = mul(fk.kadd(y1, x1), yp2)
    c = mul(t1, td2)
    d = fk.kadd(z1, z1)
    e = fk.ksub(b, a)
    f = fk.ksub(d, c)
    g = fk.kadd(d, c)
    h = fk.kadd(b, a)
    return (
        mul(e, f),
        mul(g, h),
        mul(e, h),
        mul(f, g),
    )


def _coords(ref_val, n_coords=4):
    """[n_coords, 16, R, C] array -> tuple of digit lists."""
    return tuple(
        [ref_val[c, d] for d in range(16)] for c in range(n_coords)
    )


def _stack_coords(coords):
    return jnp.stack([jnp.stack(cd) for cd in coords])


def _padd_kernel(a_ref, b_ref, o_ref):
    pa = _coords(a_ref[...])
    pb = _coords(b_ref[...])
    o_ref[...] = _stack_coords(_unified_add(pa, pb))


def _padd_masked_kernel(a_ref, b_ref, m_ref, o_ref):
    pa = _coords(a_ref[...])
    pb = _coords(b_ref[...])
    mask = m_ref[...] != 0
    summed = _unified_add(pa, pb)
    out = tuple(fk.kselect(mask, s, a) for s, a in zip(summed, pa))
    o_ref[...] = _stack_coords(out)


def _width_grid(W: int):
    assert W % TILE == 0, f"width {W} must be a multiple of {TILE}"
    rows = W // LANES
    grid = rows // SUBLANES
    return rows, grid


def _pts_spec(n_coords):
    return pl.BlockSpec(
        (n_coords, 16, SUBLANES, LANES),
        lambda i: (0, 0, i, 0),
        memory_space=pltpu.VMEM,
    )


def _mask_spec():
    return pl.BlockSpec(
        (SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )


def _reshape_pts(arr, rows):
    return arr.reshape(arr.shape[:-1] + (rows, LANES))


def padd(a_st: jnp.ndarray, b_st: jnp.ndarray) -> jnp.ndarray:
    """Unified add over stacked [4, 16, W] point batches."""
    W = a_st.shape[-1]
    rows, grid = _width_grid(W)
    a4 = _reshape_pts(a_st, rows)
    b4 = _reshape_pts(b_st, rows)
    out = pl.pallas_call(
        _padd_kernel,
        out_shape=jax.ShapeDtypeStruct(a4.shape, jnp.uint32),
        grid=(grid,),
        in_specs=[_pts_spec(4), _pts_spec(4)],
        out_specs=_pts_spec(4),
        interpret=_interpret(),
    )(a4, b4)
    return out.reshape(a_st.shape)


def padd_masked(a_st: jnp.ndarray, b_st: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """mask ? a+b : a over stacked [4, 16, W] batches; mask is [W] uint32."""
    W = a_st.shape[-1]
    rows, grid = _width_grid(W)
    out = pl.pallas_call(
        _padd_masked_kernel,
        out_shape=jax.ShapeDtypeStruct((4, 16, rows, LANES), jnp.uint32),
        grid=(grid,),
        in_specs=[_pts_spec(4), _pts_spec(4), _mask_spec()],
        out_specs=_pts_spec(4),
        interpret=_interpret(),
    )(_reshape_pts(a_st, rows), _reshape_pts(b_st, rows), mask.reshape(rows, LANES))
    return out.reshape(a_st.shape)


def _accumulate_scan_kernel(*refs, use_mxu=False, steps=1):
    """One (width-block, step-block) cell of the fused accumulation scan.

    Grid = (n_width_blocks, L // steps); the accumulator lives in VMEM
    scratch between cells and in REGISTERS across the `steps` unrolled inner
    steps of a cell (amortizing per-cell pipeline overhead — DMA waits and
    scratch round-trips — which costs ~2x at steps=1). Points stream
    HBM->VMEM via the grid pipeline (the reference's double-buffered
    staging, gpu.ts:146-155, for free), flushes stream back per cell.
    """
    if use_mxu:
        from . import field_kernels_mxu as fkm

        (pts_ref, ids_ref, m1_ref, m2_ref,
         staged_ref, facc_ref, fid_ref, acc_ref, accid_ref) = refs
        m1, m2 = m1_ref[...], m2_ref[...]
        mul = lambda x, y: fkm.kmont_mul_mxu(x, y, m1, m2)
    else:
        (pts_ref, ids_ref,
         staged_ref, facc_ref, fid_ref, acc_ref, accid_ref) = refs
        mul = None
    lb = pl.program_id(1)

    @pl.when(lb == 0)
    def _():
        # acc = identity (0, R, 0, R), acc_id = sentinel
        one = fk.digits_const(fk.R_MOD_P, acc_ref.shape[2:])
        zero = jnp.zeros(acc_ref.shape[2:], dtype=jnp.uint32)
        for d in range(16):
            acc_ref[0, d] = zero
            acc_ref[1, d] = one[d]
            acc_ref[2, d] = zero
            acc_ref[3, d] = one[d]
        accid_ref[...] = jnp.full(accid_ref.shape, 0xFFFFFFFF, dtype=jnp.uint32)

    acc = _coords(acc_ref[...])
    acc_id = accid_ref[...]
    one = fk.digits_const(fk.R_MOD_P, acc_id.shape)
    zero = fk.digits_const(0, acc_id.shape)

    for s in range(steps):
        raw = ids_ref[s]
        # bit 31 carries the signed-digit flag (pippenger.py packs it); the
        # run id is the bucket alone — a sign change must NOT split a run.
        ids = raw & 0x7FFFFFFF
        sgn = raw >> 31
        p = pts_ref[:, :, s]  # packed Niels planes [3, 8]: (y-x, y+x, 2d*t)
        ym0, yp0, td0 = [], [], []
        for c, dst in ((0, ym0), (1, yp0), (2, td0)):
            for q in range(8):
                v = p[c, q]
                dst.append(v & 0xFFFF)
                dst.append(v >> 16)
        neg = sgn == 1
        # Negation in Niels form: swap (y-x) <-> (y+x), negate 2d*t.
        ym = fk.kselect(neg, yp0, ym0)
        yp = fk.kselect(neg, ym0, yp0)
        td = fk.kselect(neg, fk.kneg(td0), td0)

        # Run boundary: reset the accumulator to the identity, then always
        # add (identity + P = P projectively) — the incoming point never
        # needs its extended coordinates reconstructed from Niels form.
        same = ids == acc_id
        accx = fk.kselect(same, acc[0], zero)
        accy = fk.kselect(same, acc[1], one)
        acct = fk.kselect(same, acc[2], zero)
        accz = fk.kselect(same, acc[3], one)
        # Emit the pre-update acc: the flush candidate for this position.
        staged_ref[0, :, s] = jnp.stack(acc[0])
        staged_ref[1, :, s] = jnp.stack(acc[1])
        staged_ref[2, :, s] = jnp.stack(acc[2])
        staged_ref[3, :, s] = jnp.stack(acc[3])
        acc = _niels_add((accx, accy, acct, accz), (ym, yp, td), mul=mul)
        acc_id = ids

    new_st = _stack_coords(acc)
    acc_ref[...] = new_st
    accid_ref[...] = acc_id

    @pl.when(lb == pl.num_programs(1) - 1)
    def _():
        facc_ref[...] = new_st
        fid_ref[...] = acc_id


def accumulate_scan(xs_pts: jnp.ndarray, ids: jnp.ndarray, block_rows: int = 0,
                    use_mxu: bool = False, steps: int = 0):
    """Fused bucket-accumulation scan.

    xs_pts [3, 8, L, W] PACKED Montgomery Niels planes (two 16-bit digits
    per u32, sorted run order — the layout the payload-carrying sort emits,
    halving the HBM->VMEM stream), ids [L, W] bucket ids ->
    (final_acc [4,16,W], final_id [W], staged [4,16,L,W]) with semantics
    identical to the lax.scan version in ops/pippenger.py (staged[..., l, :]
    = pre-update accumulator at step l; the [4,16,L,W] layout is exactly
    what the bucket-combine gather consumes, so neither input nor output
    pays a relayout pass).
    use_mxu selects the MXU-REDC Montgomery engine (field_kernels_mxu).
    """
    _, _, L, W = xs_pts.shape
    rows = W // LANES
    if block_rows <= 0:
        # 16 sublanes/cell measured fastest (scripts/bench_scan_blocks.py);
        # 64+ exceeds the 16 MB scoped-VMEM budget.
        block_rows = 16 if rows % 16 == 0 else SUBLANES
    if steps <= 0:
        steps = 4 if L % 4 == 0 else 1
    assert W % (block_rows * LANES) == 0, (W, block_rows)
    assert L % steps == 0, (L, steps)
    n_wb = rows // block_rows
    pts5 = xs_pts.reshape(3, 8, L, rows, LANES)
    ids3 = ids.reshape(L, rows, LANES)

    grid = (n_wb, L // steps)
    in_specs = [
        pl.BlockSpec(
            (3, 8, steps, block_rows, LANES),
            lambda wb, lb: (0, 0, lb, wb, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (steps, block_rows, LANES),
            lambda wb, lb: (lb, wb, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    args = [pts5, ids3]
    if use_mxu:
        from . import field_kernels_mxu as fkm

        for mat in fkm.const_inputs():
            in_specs.append(
                pl.BlockSpec(
                    mat.shape, lambda wb, lb: (0, 0), memory_space=pltpu.VMEM
                )
            )
            args.append(jnp.asarray(mat))
    staged, facc, fid = pl.pallas_call(
        functools.partial(
            _accumulate_scan_kernel, use_mxu=use_mxu, steps=steps
        ),
        grid=grid,
        in_specs=in_specs,
        out_shape=(
            jax.ShapeDtypeStruct((4, 16, L, rows, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((4, 16, rows, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.uint32),
        ),
        out_specs=(
            pl.BlockSpec(
                (4, 16, steps, block_rows, LANES),
                lambda wb, lb: (0, 0, lb, wb, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (4, 16, block_rows, LANES),
                lambda wb, lb: (0, 0, wb, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_rows, LANES), lambda wb, lb: (wb, 0), memory_space=pltpu.VMEM
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((4, 16, block_rows, LANES), jnp.uint32),
            pltpu.VMEM((block_rows, LANES), jnp.uint32),
        ],
        interpret=_interpret(),
    )(*args)
    return (
        facc.reshape(4, 16, W),
        fid.reshape(W),
        staged.reshape(4, 16, L, W),
    )


def _grouped_sum_kernel(s_ref, t_ref, u_ref, run_ref, u_acc_ref):
    """One (width-block, step) cell of the grouped running sum.

    Grid = (n_width_blocks, Gs); step i streams slice r = Gs-1-i of the
    [Gs, 4, 16, W] bucket array (the index_map reverses). Scratch carries
    running = sum_{r' >= r} s[r'] and U = sum of the running values; after
    the last step (r = 0):  T = running (+s[0]),  U = sum_{r>=1} prefix —
    exactly the fori_loop in ops/pippenger.reduce_buckets, in ONE kernel
    launch instead of 2 launches + a strided HBM slice per step."""
    i = pl.program_id(1)
    s = _coords(s_ref[...])

    @pl.when(i == 0)
    def _():
        one = fk.digits_const(fk.R_MOD_P, run_ref.shape[2:])
        zero = jnp.zeros(run_ref.shape[2:], dtype=jnp.uint32)
        for d in range(16):
            run_ref[0, d] = zero
            run_ref[1, d] = one[d]
            run_ref[2, d] = zero
            run_ref[3, d] = one[d]
            u_acc_ref[0, d] = zero
            u_acc_ref[1, d] = one[d]
            u_acc_ref[2, d] = zero
            u_acc_ref[3, d] = one[d]

    run = _unified_add(_coords(run_ref[...]), s)
    run_st = _stack_coords(run)
    run_ref[...] = run_st

    last = i == pl.num_programs(1) - 1

    @pl.when(jnp.logical_not(last))
    def _():
        u_acc_ref[...] = _stack_coords(_unified_add(_coords(u_acc_ref[...]), run))

    @pl.when(last)
    def _():
        t_ref[...] = run_st
        u_ref[...] = u_acc_ref[...]


def grouped_running_sum(s: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused grouped running sum for the bucket reduction.

    s: [Gs, 4, 16, W] stacked points, group element r = s[r] (W lanes of
    independent groups; pad with identity points). Returns (T, U) [4,16,W]:
    T = sum_r s[r],  U = sum_{k=1..Gs-1} sum_{r>=k} s[r]
      = sum_r r * s[r]  (the within-group weighted sum).
    """
    Gs, _, _, W = s.shape
    rows = W // LANES
    block_rows = 16 if rows % 16 == 0 else SUBLANES
    assert W % (block_rows * LANES) == 0, (W, block_rows)
    n_wb = rows // block_rows
    s5 = s.reshape(Gs, 4, 16, rows, LANES)
    out_spec = pl.BlockSpec(
        (4, 16, block_rows, LANES), lambda wb, i: (0, 0, wb, 0),
        memory_space=pltpu.VMEM,
    )
    t, u = pl.pallas_call(
        _grouped_sum_kernel,
        grid=(n_wb, Gs),
        in_specs=[
            pl.BlockSpec(
                (None, 4, 16, block_rows, LANES),
                lambda wb, i: (Gs - 1 - i, 0, 0, wb, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_shape=(
            jax.ShapeDtypeStruct((4, 16, rows, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((4, 16, rows, LANES), jnp.uint32),
        ),
        out_specs=(out_spec, out_spec),
        scratch_shapes=[
            pltpu.VMEM((4, 16, block_rows, LANES), jnp.uint32),
            pltpu.VMEM((4, 16, block_rows, LANES), jnp.uint32),
        ],
        interpret=_interpret(),
    )(s5)
    return t.reshape(4, 16, W), u.reshape(4, 16, W)


def _to_niels_kernel(pts_ref, o_ref):
    """Plain (x, y, t) -> Montgomery Niels (y-x, y+x, 2d*t)."""
    from ...oracle.field import EDWARDS_D, R2_MOD_P
    from .field_kernels import R_CONST, P

    x = fk.kmont_mul_const([pts_ref[0, d] for d in range(16)], R2_MOD_P)
    y = fk.kmont_mul_const([pts_ref[1, d] for d in range(16)], R2_MOD_P)
    t = [pts_ref[2, d] for d in range(16)]
    ym = fk.ksub(y, x)
    yp = fk.kadd(y, x)
    # t (plain) * (2d * R^2) * R^-1 = 2d*t*R: one fused constant multiply.
    td = fk.kmont_mul_const(t, (2 * EDWARDS_D * R2_MOD_P) % P)
    for d in range(16):
        o_ref[0, d] = ym[d]
        o_ref[1, d] = yp[d]
        o_ref[2, d] = td[d]


def _to_niels_xy_kernel(pts_ref, o_ref):
    """Plain (x, y) -> Montgomery Niels (y-x, y+x, 2d*x*y): t computed
    in-kernel, so the wire path never marshals or transfers t at all."""
    from ...oracle.field import EDWARDS_D, R2_MOD_P, R_MOD_P
    from .field_kernels import P

    x = fk.kmont_mul_const([pts_ref[0, d] for d in range(16)], R2_MOD_P)
    y = fk.kmont_mul_const([pts_ref[1, d] for d in range(16)], R2_MOD_P)
    ym = fk.ksub(y, x)
    yp = fk.kadd(y, x)
    t = fk.kmont_mul(x, y)  # (x*y)R
    # (xyR) * (2d*R) * R^-1 = 2d*xy*R
    td = fk.kmont_mul_const(t, (2 * EDWARDS_D * R_MOD_P) % P)
    for d in range(16):
        o_ref[0, d] = ym[d]
        o_ref[1, d] = yp[d]
        o_ref[2, d] = td[d]


def _coordwise_call(kernel, pts_st: jnp.ndarray, block_rows: int = 16) -> jnp.ndarray:
    n_coords = pts_st.shape[0]
    W = pts_st.shape[-1]
    rows = W // LANES
    if rows % block_rows:
        block_rows = SUBLANES
    assert W % (block_rows * LANES) == 0, W
    spec = pl.BlockSpec(
        (n_coords, 16, block_rows, LANES),
        lambda i: (0, 0, i, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_coords, 16, rows, LANES), jnp.uint32),
        grid=(rows // block_rows,),
        in_specs=[spec],
        out_specs=spec,
        interpret=_interpret(),
    )(pts_st.reshape(n_coords, 16, rows, LANES))
    return out.reshape(pts_st.shape)


def to_niels(pts_st: jnp.ndarray, block_rows: int = 16) -> jnp.ndarray:
    """Plain (x, y, t) [3, 16, W] -> Montgomery Niels (y-x, y+x, 2d*t)."""
    return _coordwise_call(_to_niels_kernel, pts_st, block_rows)


def to_niels_xy(pts_st: jnp.ndarray, block_rows: int = 16) -> jnp.ndarray:
    """Plain (x, y) [2, 16, W] -> Montgomery Niels [3, 16, W] with
    t = x*y computed in-kernel (the wire path's device-side marshal)."""
    n_coords, _, W = pts_st.shape
    assert n_coords == 2, pts_st.shape
    rows = W // LANES
    if rows % block_rows:
        block_rows = SUBLANES
    assert W % (block_rows * LANES) == 0, W

    def spec(nc):
        return pl.BlockSpec(
            (nc, 16, block_rows, LANES),
            lambda i: (0, 0, i, 0),
            memory_space=pltpu.VMEM,
        )

    out = pl.pallas_call(
        _to_niels_xy_kernel,
        out_shape=jax.ShapeDtypeStruct((3, 16, rows, LANES), jnp.uint32),
        grid=(rows // block_rows,),
        in_specs=[spec(2)],
        out_specs=spec(3),
        interpret=_interpret(),
    )(pts_st.reshape(2, 16, rows, LANES))
    return out.reshape(3, 16, W)
