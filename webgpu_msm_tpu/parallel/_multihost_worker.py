"""One process of a multi-host MSM run (test / dryrun harness).

Exercises the real multi-host layer — `distributed.init` (explicit
coordinator), `distributed.global_mesh`, `distributed.host_local_slice`,
and `msm_window_sums_sharded` with cross-process collectives — on CPU
devices, so the DCN/multi-host path runs without a TPU pod. This is the
executable analog of the reference's SharedArrayBuffer + worker-pool
substrate (submission.ts:35-38, webpack.dev.config.cjs:76-79): the layer
that turns N isolated processes into one shared-memory compute domain.

Usage:
    python -m webgpu_msm_tpu.parallel._multihost_worker \
        <process_id> <num_processes> <coordinator_port> [mode]

Env: MSM_WORKER_LOCAL_DEVICES (virtual CPU devices per process, default 4).

Each process builds the same global inputs deterministically, feeds only
its `host_local_slice`, and verifies the replicated result against the
host oracle; prints "MULTIHOST_OK ..." on success.
"""
from __future__ import annotations

import os
import sys


def main(argv: list[str]) -> int:
    pid, nproc, port = int(argv[0]), int(argv[1]), int(argv[2])
    mode = argv[3] if len(argv) > 3 else "window_sums"
    local_devices = int(os.environ.get("MSM_WORKER_LOCAL_DEVICES", "4"))

    # CPU multi-process: force the CPU platform (the env var alone is not
    # enough when a TPU plugin is force-registered) and gloo collectives,
    # all before anything touches the backend.
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from . import distributed

    distributed.init(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc, jax.process_count()

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from ..engines.tpu_engine import (
        marshal_points,
        marshal_scalars,
        window_sums_to_points,
    )
    from ..oracle import curve, msm as omsm
    from ..oracle.msm import combine_windows
    from ..ops import curve_ops, field_ops, limbs
    from ..utils import fixtures
    from .msm_sharded import AXIS, sharded_stages

    mesh = distributed.global_mesh()
    D = nproc * local_devices
    W, C, L = 8, 4, 4  # per-device chunking
    n_global = D * C * L

    # Deterministic global inputs, identical on every process.
    pts = fixtures.distinct_points(n_global, seed=5)
    scalars = fixtures.random_scalars(n_global, seed=6)
    planes = marshal_points(pts, n_global)
    words = marshal_scalars(scalars, n_global)
    niels = np.asarray(jax.jit(curve_ops.to_niels_planes)(jnp.asarray(planes)))

    # Feed only this host's slice; assemble the global sharded arrays.
    sl = distributed.host_local_slice(n_global)
    gpts = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(None, None, AXIS)), niels[:, :, sl]
    )
    gsc = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(None, AXIS)), words[:, sl]
    )

    # The staged pipeline has exactly one collective stage ("combine").
    # Collective-free stages compile AND execute freely (per-process compile
    # skew is harmless there); the combine stage is AOT-compiled, then all
    # processes barrier before executing it — gloo context init (at the
    # first collective) has a ~30 s peer timeout, and per-process XLA:CPU
    # compiles can skew by minutes on small hosts.
    print(f"[worker {pid}] compiling/running pre-collective stages", flush=True)
    stages = sharded_stages(
        window_size=W, n_chunks=C, chunk_len=L, mesh=mesh, mode=mode
    )
    out = stages[0][1](gpts, gsc)
    idx = 1
    while stages[idx][0] != "combine":
        out = stages[idx][1](out)
        idx += 1
    out.block_until_ready()
    combine_compiled = stages[idx][1].lower(out).compile()
    from jax._src import distributed as _jdist

    _jdist.global_state.client.wait_at_barrier(
        "msm_compiled", timeout_in_ms=3_600_000
    )
    print(f"[worker {pid}] compiled; running collective", flush=True)
    wsums = combine_compiled(out)
    for _, fn in stages[idx + 1 :]:
        wsums = fn(wsums)
    wsums.block_until_ready()
    print(f"[worker {pid}] device step done", flush=True)
    out = jax.jit(
        lambda ws: jnp.stack(
            [
                limbs.stack(field_ops.from_mont(limbs.unstack(ws[i])))
                for i in range(4)
            ]
        )
    )(wsums)
    got = curve.to_affine(
        combine_windows(window_sums_to_points(np.asarray(out)), W)
    )
    want = curve.to_affine(omsm.msm(pts, scalars, window_size=W))
    assert got == want, f"process {pid}: {got} != {want}"
    print(
        f"MULTIHOST_OK process={pid}/{nproc} devices={D} mode={mode} "
        f"x={got[0]}",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
