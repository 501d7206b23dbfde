"""Persistent program caches: XLA executables AND traced programs.

Two independent costs dominate MSM pipeline startup (measured at the
production 2^20 shape, scripts/profile_compile.py):

- **Backend compile**: covered by jax's persistent compilation cache
  (`enable_compilation_cache`) — skipped on re-runs on the same machine.
- **Trace + lower** (Python tracing of the montmul-heavy graphs): paid on
  EVERY fresh process by plain `jax.jit`. `exported_call` removes it by
  serializing the lowered StableHLO (`jax.export`) to disk, keyed by
  (jax version, backend, source-tree hash, shape signature); warm
  processes deserialize in ~a second and the backend compile then hits the
  persistent cache.

**Committed AOT seed (`aot/` at the repo root).** Both caches normally live
in the gitignored `.cache/`, so a fresh checkout on a new machine starts
cold. `aot/` ships (gzipped) artifacts in git:

- `aot/export/*.stablehlo.gz` — traced programs. StableHLO is machine-
  independent; any host with the same jax version + source tree skips
  tracing entirely.
- `aot/jax/*.gz` — persistent-cache entries (compiled executables). TPU
  executables are keyed to the TPU + runtime version, not host CPU
  features, so they transfer between hosts driving the same device class;
  XLA:CPU entries are CPU-feature-keyed and simply miss on a different
  host (jax falls back to compiling — harmless).

`scripts/pack_aot.py` populates `aot/` from a warm `.cache/`.

Env overrides: MSM_CACHE_DIR (persistent cache), MSM_EXPORT_DIR (export
cache), MSM_NO_EXPORT_CACHE=1 (bypass exports, e.g. interpret-mode tests).

Safe to call multiple times.
"""
from __future__ import annotations

import gzip
import hashlib
import os
from pathlib import Path

_REPO = Path(__file__).resolve().parents[2]
_DEFAULT_DIR = _REPO / ".cache" / "jax"
_EXPORT_DIR = _REPO / ".cache" / "jax_export"
_AOT_DIR = _REPO / "aot"


def _export_dir() -> Path:
    d = os.environ.get("MSM_EXPORT_DIR")
    return Path(d) if d else _EXPORT_DIR


def _seed_cache_from_aot(cache_dir: Path) -> None:
    """Decompress committed aot/jax/*.gz entries into the live cache dir
    (once per entry; existing files win)."""
    seed = _AOT_DIR / "jax"
    if not seed.is_dir():
        return
    for f in seed.glob("*.gz"):
        dst = cache_dir / f.name[: -len(".gz")]
        if dst.exists():
            continue
        try:
            data = gzip.decompress(f.read_bytes())
            tmp = dst.with_suffix(".tmp")
            tmp.write_bytes(data)
            os.replace(tmp, dst)
        except OSError:
            pass  # seeding is best-effort; a miss just means a compile


_CACHE_ENABLED_DIR: str | None = None


def enable_compilation_cache(path: str | os.PathLike | None = None) -> None:
    global _CACHE_ENABLED_DIR
    import jax

    if path is None:
        path = os.environ.get("MSM_CACHE_DIR")
    d = Path(path) if path is not None else _DEFAULT_DIR
    d.mkdir(parents=True, exist_ok=True)
    if str(d) != _CACHE_ENABLED_DIR:
        _seed_cache_from_aot(d)
        _CACHE_ENABLED_DIR = str(d)
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


def _load_export_bytes(name: str, key: str) -> bytes | None:
    path = _export_dir() / f"{name}-{key}.stablehlo"
    if path.exists():
        return path.read_bytes()
    seed = _AOT_DIR / "export" / f"{name}-{key}.stablehlo.gz"
    if seed.exists():
        try:
            return gzip.decompress(seed.read_bytes())
        except OSError:
            return None
    return None


def export_cache_key(name: str, *args) -> str:
    """The disk key for an exported program (also used by pack_aot)."""
    import jax

    sig = ";".join(f"{a.shape}:{a.dtype}" for a in args)
    backend = jax.default_backend()
    key_raw = f"{name}|{jax.__version__}|{backend}|{_source_hash()}|{sig}"
    return hashlib.sha256(key_raw.encode()).hexdigest()[:32]


def exported_call(name: str, fn, *args):
    """Call `fn(*args)` through a disk-cached `jax.export` artifact.

    `fn` must be shape-stable for the given args (the cache key includes
    every arg's shape/dtype). On a cache miss the function is traced,
    lowered, serialized to the export dir, and called; on a hit the
    StableHLO deserializes without any Python tracing. Set
    MSM_NO_EXPORT_CACHE=1 to bypass (e.g. under interpret-mode tests).
    """
    import jax
    from jax import export as jexport

    if os.environ.get("MSM_NO_EXPORT_CACHE") == "1":
        return jax.jit(fn)(*args)

    key = export_cache_key(name, *args)

    def trace_and_store():
        shapes = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in args]
        exp = jexport.export(jax.jit(fn))(*shapes)
        d = _export_dir()
        d.mkdir(parents=True, exist_ok=True)
        path = d / f"{name}-{key}.stablehlo"
        tmp = path.with_suffix(".tmp")
        tmp.write_bytes(exp.serialize())
        os.replace(tmp, path)
        # Sidecar provenance: the key already *contains* the source hash
        # (stale programs can't load), but the hash inside the key is
        # opaque — the sidecar lets pack_aot.py detect artifacts from an
        # older tree instead of silently committing dead weight
        # (round-4 advice: aot/ staleness detection).
        path.with_name(path.name + ".meta").write_text(_source_hash())
        return exp

    exp = _EXPORTED.get(key)
    if exp is None:
        data = _load_export_bytes(name, key)
        if data is not None:
            # A disk/seed artifact is a CACHE: any failure deserializing or
            # calling it (corrupt file, runtime/serialization skew vs the
            # machine that traced it) must degrade to a fresh trace, never
            # break the production path.
            try:
                exp = jexport.deserialize(data)
                out = exp.call(*args)
                _EXPORTED[key] = exp
                return out
            except Exception as e:
                import warnings

                warnings.warn(
                    f"cached export {name!r} unusable ({e!r}); re-tracing"
                )
                exp = trace_and_store()
        else:
            exp = trace_and_store()
        _EXPORTED[key] = exp
    return exp.call(*args)
