"""Sweep fused-scan block_rows (VPU cell size) on TPU."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np, jax, jax.numpy as jnp
from webgpu_msm_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from webgpu_msm_tpu.ops.pallas import padd_kernels

W, L = 16384, 32
rng = np.random.default_rng(0)
xs_np = rng.integers(0, 1 << 16, size=(L, 3, 16, W), dtype=np.uint32)
xs_np[:, :, 15, :] = 0
xs = jnp.asarray(xs_np)
ids = jnp.asarray(rng.integers(0, 1024, size=(L, W), dtype=np.uint32))

ref = None
for br in (8, 16, 32, 64):
  try:
    fn = jax.jit(lambda x, i, br=br: padd_kernels.accumulate_scan(jnp.transpose(x, (1, 2, 0, 3)), i, block_rows=br)[0])
    out = fn(xs, ids); np.asarray(out.ravel()[0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(fn(xs, ids).ravel()[0]); ts.append(time.perf_counter()-t0)
    ok = True if ref is None else bool(jnp.array_equal(ref, out))
    if ref is None: ref = out
    print(f"block_rows={br:3d}  {np.median(ts)*1000:8.2f} ms  same={ok}", flush=True)
  except Exception as e:
    print(f"block_rows={br:3d}  FAILED: {str(e)[:120]}", flush=True)
