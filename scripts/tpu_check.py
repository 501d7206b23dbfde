import time
import numpy as np
import jax, jax.numpy as jnp
from webgpu_msm_tpu.oracle import curve as oc, field as F
from webgpu_msm_tpu.ops.pallas import padd_kernels as pk
from webgpu_msm_tpu.utils import fixtures

W = 1 << 13  # 8192 lanes

def pts_to_stacked(points, width):
    pts = [points[i % len(points)] for i in range(width)]
    arr = np.zeros((4, 16, width), dtype=np.uint32)
    for i, p in enumerate(pts):
        for c, v in enumerate((p.x, p.y, p.t, p.z)):
            mv = F.to_mont(v)
            for d in range(16):
                arr[c, d, i] = (mv >> (16 * d)) & 0xFFFF
    return jnp.asarray(arr), pts

def stacked_to_pt(arr, i):
    arr = np.asarray(arr)
    coords = []
    for c in range(4):
        v = 0
        for d in reversed(range(16)):
            v = (v << 16) | int(arr[c, d, i])
        coords.append(F.from_mont(v))
    return oc.ExtPoint(*coords)

pa = fixtures.distinct_points(4, seed=90) + [oc.IDENTITY]
pb = fixtures.distinct_points(4, seed=91) + [oc.IDENTITY]
a_st, pa_full = pts_to_stacked(pa, W)
b_st, pb_full = pts_to_stacked(pb, W)

t0 = time.time()
out = pk.padd(a_st, b_st)
jax.block_until_ready(out)
print("padd first call (mosaic compile+run):", time.time() - t0)

ok = True
for i in range(10):
    g = stacked_to_pt(out, i)
    w = oc.add(pa_full[i], pb_full[i])
    if (g.x, g.y, g.t, g.z) != (w.x, w.y, w.t, w.z):
        ok = False
        print("MISMATCH lane", i)
print("padd correct:", ok)

# throughput: chain REP iterations inside one jit
REP = 300
@jax.jit
def chain(a, b):
    def body(i, st):
        return pk.padd(st, b)
    return jax.lax.fori_loop(0, REP, body, a)
r = chain(a_st, b_st); jax.block_until_ready(r)
t = time.time()
r = chain(a_st, b_st); jax.block_until_ready(r)
dt = (time.time() - t) / REP
print(f"padd W={W}: {dt*1e6:.1f} us/call -> {W/dt/1e6:.1f} M padd-lanes/s")
