"""Cold-start budget: the multichip dryrun must pass on a cache-less
machine within the driver budget (round-3 verdict #1 — MULTICHIP_r03 timed
out at 20 min because the monolithic sharded program's XLA:CPU compile blew
up on a fresh host).

Marked `cold` (excluded from the default suite — it deliberately bypasses
the warm caches and re-compiles the staged pipeline, ~minutes of CPU):

    python -m pytest tests/test_cold_start.py -m cold -q

Budget override: MSM_COLD_BUDGET_S (default 600 s; the <300 s goal holds on
multi-core hosts — XLA:CPU compiles are LLVM-bound and parallelize, this
repo's CI floor is a 1-core machine where the measured staged time is
~6-7 min vs the monolith's ~24 min).
"""
import os
import subprocess
import sys
import time
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.cold
def test_dryrun_multichip_cold_budget(tmp_path):
    budget = int(os.environ.get("MSM_COLD_BUDGET_S", "600"))
    env = dict(os.environ)
    # fresh caches: simulate a machine that has never compiled anything
    # (the committed aot/ seed legitimately stays — it ships with a clone)
    env["MSM_CACHE_DIR"] = str(tmp_path / "jax")
    env["MSM_EXPORT_DIR"] = str(tmp_path / "export")
    env.pop("MSM_NO_EXPORT_CACHE", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, str(REPO / "__graft_entry__.py"), "8"],
        env=env,
        capture_output=True,
        text=True,
        timeout=budget + 60,
        cwd=REPO,
    )
    took = time.perf_counter() - t0
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    assert "dryrun_multichip(8) OK" in proc.stdout
    assert took < budget, f"cold dryrun took {took:.0f}s (budget {budget}s)"
