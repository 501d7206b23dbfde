"""Phase timing / tracing.

The reference instruments phases with console.time/timeEnd
(submission.ts:42-153) and a Rust label->start map logging milliseconds
(msm-wasm/src/utils.rs:15-57). This is the same facility: nested phase
timers with a summary table, plus optional jax.profiler trace capture for
per-kernel XLA timelines.

    from webgpu_msm_tpu.utils.trace import time_begin, time_end, phase

    time_begin("convert inputs")
    ...
    time_end("convert inputs")          # logs "convert inputs: 12.3 ms"

    with phase("device msm"):
        ...

    with xla_trace("/tmp/jax-trace"):   # open in TensorBoard / xprof
        ...
"""
from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict, List, Optional

logger = logging.getLogger("webgpu_msm_tpu")

_starts: Dict[str, float] = {}
_records: List[tuple[str, float]] = []
enabled = True


def time_begin(label: str) -> None:
    if enabled:
        _starts[label] = time.perf_counter()


def time_end(label: str) -> float:
    if not enabled or label not in _starts:
        return 0.0
    ms = (time.perf_counter() - _starts.pop(label)) * 1000
    _records.append((label, ms))
    logger.info("%s: %.1f ms", label, ms)
    return ms


@contextlib.contextmanager
def phase(label: str):
    time_begin(label)
    try:
        yield
    finally:
        time_end(label)


def records() -> List[tuple[str, float]]:
    return list(_records)


def reset() -> None:
    _starts.clear()
    _records.clear()


def summary() -> str:
    lines = [f"{label:32s} {ms:10.1f} ms" for label, ms in _records]
    return "\n".join(lines)


@contextlib.contextmanager
def xla_trace(log_dir: str, enable: bool = True):
    """Capture a jax.profiler trace (per-kernel XLA timeline) to log_dir."""
    if not enable:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
