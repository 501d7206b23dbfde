#!/usr/bin/env python
"""Re-trace the production TPU stage exports WITHOUT a reachable device.

The committed `aot/` seed must be packed from the final source tree (the
export key embeds the source hash), which normally means re-running the
production paths on the TPU after the last code change. When the device
tunnel is down (round 5: the relay died mid-round), the same artifacts can
be produced offline: `jax.export(..., platforms=["tpu"])` lowers Pallas to
Mosaic custom calls without touching a device — only `exp.call` needs one.

Two things make the offline artifact byte-compatible with what the TPU
runtime would produce and look up:

- `jax.default_backend` is patched to "tpu" BEFORE tracing so the
  engine's backend routing (`pippenger._use_pallas`, `_to_niels_any`,
  `reduce_buckets` group sizing) takes the Pallas/TPU paths — without the
  patch a cpu-pinned process would silently serialize the jnp-fallback
  graphs (correct but slow on device).
- the disk key is computed exactly as `utils.cache.export_cache_key`
  does on a TPU host (backend string "tpu", same source hash / jax
  version / shape signature).

Usage: python scripts/trace_aot_offline.py   (then scripts/pack_aot.py)
"""
import hashlib
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
jax.default_backend = lambda: "tpu"  # engine routing: take the Pallas paths

import functools

import jax.numpy as jnp
from jax import export as jexport

from webgpu_msm_tpu.engines import tpu_engine
from webgpu_msm_tpu.ops import pippenger, windows
from webgpu_msm_tpu.utils import cache as msm_cache

EXPORT_DIR = Path(__file__).resolve().parent.parent / ".cache" / "jax_export"


def carry_shape(w: int, signed: bool):
    K = windows.n_windows(w)
    B = pippenger.n_buckets(w, signed)
    return (4, 16, K, B)


def u32(shape):
    return jax.ShapeDtypeStruct(shape, jnp.uint32)


def tpu_key(name: str, shapes) -> str:
    sig = ";".join(f"{s.shape}:{s.dtype}" for s in shapes)
    raw = (
        f"{name}|{jax.__version__}|tpu|{msm_cache._source_hash()}|{sig}"
    )
    return hashlib.sha256(raw.encode()).hexdigest()[:32]


def specs():
    """The production stage set (mirrors the round-4 aot/ inventory plus
    the round-5 fixed-base stages). Shapes follow the resolved plans:
    device path = single 2^20 batch at w=16; wire/fixed path = 2^18
    batches at w=13; entry() = the (w=8, 64x8) driver compile check."""
    M20, M18 = 1 << 20, 1 << 18
    s = []
    s.append((
        "batch_planes_w16_c2048x512_s1", tpu_engine._batch_planes_impl,
        dict(window_size=16, n_chunks=2048, chunk_len=512, signed_digits=True),
        [u32((3, 16, M20)), u32((8, M20)), u32(carry_shape(16, True))],
    ))
    s.append((
        "finish_w16_s1", tpu_engine._finish_impl, {},
        [u32(carry_shape(16, True))],
    ))
    s.append((
        "wire_batch_w13_c2048x128_s1", tpu_engine._wire_batch_impl,
        dict(window_size=13, n_chunks=2048, chunk_len=128, signed_digits=True),
        [u32((M18, 16)), u32((M18, 8)), u32(carry_shape(13, True))],
    ))
    s.append((
        "finish_w13_s1", tpu_engine._finish_impl, {},
        [u32(carry_shape(13, True))],
    ))
    s.append((
        f"plan_niels_m{M18}", tpu_engine._plan_niels_impl, {},
        [u32((M18, 16))],
    ))
    s.append((
        "fixed_batch_w13_c2048x128_s1", tpu_engine._fixed_batch_impl,
        dict(window_size=13, n_chunks=2048, chunk_len=128, signed_digits=True),
        [u32((3, 16, M18)), u32((M18, 8)), u32(carry_shape(13, True))],
    ))
    s.append((
        "batch_planes_w8_c64x8_s0", tpu_engine._batch_planes_impl,
        dict(window_size=8, n_chunks=64, chunk_len=8, signed_digits=False),
        [u32((3, 16, 512)), u32((8, 512)), u32(carry_shape(8, False))],
    ))
    s.append((
        "finish_w8_s0", tpu_engine._finish_impl, {},
        [u32(carry_shape(8, False))],
    ))
    return s


def main() -> int:
    EXPORT_DIR.mkdir(parents=True, exist_ok=True)
    src = msm_cache._source_hash()
    for name, fn, static, shapes in specs():
        key = tpu_key(name, shapes)
        path = EXPORT_DIR / f"{name}-{key}.stablehlo"
        if path.exists():
            print(f"{name}: exists", flush=True)
            continue
        t0 = time.time()
        exp = jexport.export(
            jax.jit(functools.partial(fn, **static)), platforms=["tpu"]
        )(*shapes)
        data = exp.serialize()
        assert b"tpu_custom_call" in data or "w8" in name, (
            f"{name}: export lacks Mosaic custom calls — backend routing "
            "fell back to the jnp path"
        )
        path.write_bytes(data)
        path.with_name(path.name + ".meta").write_text(src)
        print(f"{name}: {len(data)//1024} KB in {time.time()-t0:.1f}s",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
