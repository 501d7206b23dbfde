"""Persistent program caches: XLA executables AND traced programs.

Two independent costs dominate MSM pipeline startup (measured at the
production 2^20 shape, scripts/profile_compile.py):

- **Backend compile** (~106 s XLA:TPU): covered by jax's persistent
  compilation cache (`enable_compilation_cache`) — skipped on re-runs.
- **Trace + lower** (~73 s of Python tracing of the montmul-heavy graph):
  paid on EVERY fresh process by plain `jax.jit`. `exported_call` removes
  it by serializing the lowered StableHLO (`jax.export`) to disk, keyed by
  (jax version, backend, source-tree hash, shape signature); warm
  processes deserialize in ~a second and the backend compile then hits the
  persistent cache.

Safe to call multiple times.
"""
from __future__ import annotations

import hashlib
import os
from pathlib import Path

_DEFAULT_DIR = Path(__file__).resolve().parents[2] / ".cache" / "jax"
_EXPORT_DIR = Path(__file__).resolve().parents[2] / ".cache" / "jax_export"


def enable_compilation_cache(path: str | os.PathLike | None = None) -> None:
    import jax

    d = Path(path) if path is not None else _DEFAULT_DIR
    d.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(d))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


_SOURCE_HASH: str | None = None


def _source_hash() -> str:
    """Hash of the package's compute-path sources: a stale exported program
    must never outlive a code change (it would silently compute old math)."""
    global _SOURCE_HASH
    if _SOURCE_HASH is None:
        pkg = Path(__file__).resolve().parents[1]
        h = hashlib.sha256()
        for f in sorted(pkg.rglob("*.py")):
            h.update(f.read_bytes())
        _SOURCE_HASH = h.hexdigest()[:16]
    return _SOURCE_HASH


_EXPORTED: dict[str, object] = {}


def exported_call(name: str, fn, *args):
    """Call `fn(*args)` through a disk-cached `jax.export` artifact.

    `fn` must be shape-stable for the given args (the cache key includes
    every arg's shape/dtype). On a cache miss the function is traced,
    lowered, serialized to .cache/jax_export/, and called; on a hit the
    StableHLO deserializes without any Python tracing. Set
    MSM_NO_EXPORT_CACHE=1 to bypass (e.g. under interpret-mode tests).
    """
    import jax
    from jax import export as jexport

    if os.environ.get("MSM_NO_EXPORT_CACHE") == "1":
        return jax.jit(fn)(*args)

    sig = ";".join(f"{a.shape}:{a.dtype}" for a in args)
    backend = jax.default_backend()
    key_raw = f"{name}|{jax.__version__}|{backend}|{_source_hash()}|{sig}"
    key = hashlib.sha256(key_raw.encode()).hexdigest()[:32]

    exp = _EXPORTED.get(key)
    if exp is None:
        path = _EXPORT_DIR / f"{name}-{key}.stablehlo"
        if path.exists():
            exp = jexport.deserialize(path.read_bytes())
        else:
            shapes = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in args]
            exp = jexport.export(jax.jit(fn))(*shapes)
            _EXPORT_DIR.mkdir(parents=True, exist_ok=True)
            tmp = path.with_suffix(".tmp")
            tmp.write_bytes(exp.serialize())
            os.replace(tmp, path)
        _EXPORTED[key] = exp
    return exp.call(*args)
