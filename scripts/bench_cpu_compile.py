#!/usr/bin/env python
"""A/B harness for XLA:CPU compile time of the sharded dryrun stages.

The dryrun (MULTICHIP artifact) must pass COLD on an arbitrary machine in
<5 min (round-3 verdict #1); this measures where its compile time goes and
what the candidate XLA flags buy. Run in a FRESH process per variant:

    python scripts/bench_cpu_compile.py [--stage reduce] [--flags fast]
"""
import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

FAST_FLAGS = "--xla_backend_optimization_level=0 --xla_llvm_disable_expensive_passes=true"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="reduce",
                    choices=["accumulate", "reduce", "combine"])
    ap.add_argument("--flags", default="none", choices=["none", "fast"])
    ap.add_argument("--group-size", type=int, default=0)
    args = ap.parse_args()

    flags = "--xla_force_host_platform_device_count=8"
    if args.flags == "fast":
        flags += " " + FAST_FLAGS
    os.environ["XLA_FLAGS"] = flags
    os.environ["JAX_PLATFORMS"] = "cpu"
    # measure the raw jit stages (the export-cache wrapper has no .lower)
    os.environ["MSM_NO_EXPORT_CACHE"] = "1"

    import jax

    jax.config.update("jax_platforms", "cpu")
    # deliberately NO persistent cache: measure the true cold compile
    import jax.numpy as jnp
    import numpy as np

    from webgpu_msm_tpu.ops import pippenger, windows
    from webgpu_msm_tpu.parallel import default_mesh, msm_sharded

    W, C, L = 8, 8, 8
    D = 8
    K = windows.n_windows(W)
    B = pippenger.n_buckets(W, False)
    mesh = default_mesh(D)
    rng = np.random.default_rng(0)

    def timed(name, jitted, *arrs):
        t0 = time.perf_counter()
        lowered = jitted.lower(*arrs)
        t_lower = time.perf_counter() - t0
        t0 = time.perf_counter()
        lowered.compile()
        t_comp = time.perf_counter() - t0
        print(f"{name:<40s} lower {t_lower:6.1f}s  compile {t_comp:7.1f}s",
              flush=True)

    stages = dict(
        msm_sharded.sharded_stages(
            window_size=W, n_chunks=C, chunk_len=L, mesh=mesh,
            mode="window_sums", signed_digits=False,
        )
    )
    if args.stage == "accumulate":
        pts = jnp.asarray(rng.integers(0, 1 << 16, size=(3, 16, D * C * L),
                                       dtype=np.uint64).astype(np.uint32))
        sw = jnp.asarray(rng.integers(0, 1 << 32, size=(8, D * C * L),
                                      dtype=np.uint64).astype(np.uint32))
        timed(f"accumulate [{args.flags}]", stages["accumulate"], pts, sw)
    elif args.stage == "reduce":
        bs = jnp.asarray(rng.integers(0, 1 << 16, size=(D, 4, 16, K, B),
                                      dtype=np.uint64).astype(np.uint32))
        timed(f"reduce [{args.flags}] gs={args.group_size}",
              stages["reduce"], bs)
    else:
        ws = jnp.asarray(rng.integers(0, 1 << 16, size=(D, 4, 16, K),
                                      dtype=np.uint64).astype(np.uint32))
        timed(f"combine [{args.flags}]", stages["combine"], ws)


if __name__ == "__main__":
    main()
