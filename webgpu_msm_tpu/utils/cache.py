"""Persistent XLA compilation cache setup.

The MSM pipeline graphs are expensive to compile (minutes on XLA:CPU, tens of
seconds to minutes on TPU); cache compiled executables across processes. Safe
to call multiple times.
"""
from __future__ import annotations

import os
from pathlib import Path

_DEFAULT_DIR = Path(__file__).resolve().parents[2] / ".cache" / "jax"


def enable_compilation_cache(path: str | os.PathLike | None = None) -> None:
    import jax

    d = Path(path) if path is not None else _DEFAULT_DIR
    d.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(d))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
