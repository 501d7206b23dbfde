#!/usr/bin/env python
"""Measure host->device transfer strategies for the wire path (round 3).

The round-2 streamed wire path interleaves per-batch device_put with queued
batch programs (tpu_engine._device_msm_wire_staged) and lands at ~1.5 s
wall at 2^20 — attributed to the tunnel's ~77 MB/s execution-adjacent
transfer rate. But a standalone device_put reportedly bursts >1 GB/s, which
would make "transfer everything first, then compute" strictly better.
This script measures, with a reliable fence (tiny dependent fetch, see
bench.py's note on block_until_ready on this platform):

  A. bulk device_put of the full 2^20 wire arrays (xy 64 MB + sc 32 MB)
  B. per-batch device_put x4 (no compute in between)
  C. bulk put THEN the monolithic wire program (internal lax.scan batches)
  D. the round-2 streamed path (put+queue interleaved) for comparison
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def fence(*arrays):
    import jax.numpy as jnp

    # A dependent reduction fetched to host is the only reliable fence on
    # the tunneled platform (block_until_ready can return early).
    s = sum(jnp.sum(a[:: max(1, a.shape[0] // 8)]) for a in arrays)
    return np.asarray(s)


def main() -> int:
    import jax
    import jax.numpy as jnp

    from webgpu_msm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    n_pow = 20
    n = 1 << n_pow
    M = 1 << 18  # batch size (C=2048, L=128)
    rng = np.random.default_rng(0)
    xy = rng.integers(0, 1 << 32, size=(n, 16), dtype=np.uint64).astype(np.uint32)
    sc = rng.integers(0, 1 << 32, size=(n, 8), dtype=np.uint64).astype(np.uint32)
    mb = (xy.nbytes + sc.nbytes) / 1e6
    print(f"wire payload: {mb:.0f} MB", flush=True)

    # Warm the fence program.
    d0 = jax.device_put(xy[:1024])
    fence(d0)

    def timed(label, f, iters=3):
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            f()
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        print(f"{label:35s} {med*1e3:9.1f} ms  ({mb/med:7.1f} MB/s)  all={[round(t,3) for t in ts]}", flush=True)
        return med

    # A: bulk puts, fenced
    def bulk():
        dxy = jax.device_put(xy)
        dsc = jax.device_put(sc)
        fence(dxy, dsc)

    timed("A bulk device_put (xy+sc)", bulk)

    # B: per-batch puts, fenced once at the end
    def batched():
        ds = []
        for b in range(n // M):
            ds.append(jax.device_put(xy[b * M : (b + 1) * M]))
            ds.append(jax.device_put(sc[b * M : (b + 1) * M]))
        fence(*ds)

    timed("B 4x per-batch device_put", batched)

    # C: the staged wire pipeline (per-batch puts + batch programs)
    from webgpu_msm_tpu.config import MSMConfig
    from webgpu_msm_tpu.engines import tpu_engine

    cfg = MSMConfig()
    w = cfg.resolved_window_size(n)
    C, L = cfg.resolved_chunking(n)
    kw = dict(window_size=w, n_chunks=C, chunk_len=L, signed_digits=True)

    # (the monolithic single-program wire path was removed in round 4's
    # stage-split compile diet; variant C is the staged path on a bulk put)
    def streamed():
        out = tpu_engine._device_msm_wire_staged(xy, sc, **kw)
        np.asarray(out)

    print("compiling streamed batch program ...", flush=True)
    t0 = time.perf_counter()
    streamed()
    print(f"  first call (compile) {time.perf_counter()-t0:.1f} s", flush=True)
    timed("C staged wire path (per-batch puts)", streamed)
    return 0


if __name__ == "__main__":
    sys.exit(main())
