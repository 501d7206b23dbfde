#!/usr/bin/env python
"""Populate the committed `aot/` seed from a warm `.cache/`.

The AOT seed ships program artifacts in git so a fresh machine skips the
expensive parts of cold start (utils/cache.py module docstring):

- every `.cache/jax_export/*.stablehlo` (traced programs; machine-
  independent) -> `aot/export/*.stablehlo.gz`
- `.cache/jax/*-cache` persistent-cache entries matching --patterns
  (compiled executables; TPU entries transfer across hosts, CPU entries
  miss harmlessly) -> `aot/jax/*.gz`

Run AFTER the production programs are warm (e.g. after `python bench.py`)
and AFTER the source tree is final — the export key includes the source
hash, so packing before a code change ships dead artifacts.

    python scripts/pack_aot.py [--patterns batch,finish,wire] [--max-mb 200]
"""
import argparse
import gzip
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
CACHE = REPO / ".cache"
AOT = REPO / "aot"


def pack(src: Path, dst: Path) -> int:
    dst.parent.mkdir(parents=True, exist_ok=True)
    data = gzip.compress(src.read_bytes(), compresslevel=9)
    dst.write_bytes(data)
    return len(data)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--patterns",
        default="batch_planes,wire_batch,finish,stage",
        help="comma-separated substrings selecting .cache/jax entries",
    )
    ap.add_argument("--newer-than-min", type=float, default=0,
                    help="only pack cache entries modified in the last N min")
    ap.add_argument("--max-mb", type=float, default=250,
                    help="abort if the packed seed would exceed this size")
    ap.add_argument("--clean", action="store_true",
                    help="remove existing aot/ contents first")
    args = ap.parse_args()
    patterns = [p for p in args.patterns.split(",") if p]

    if args.clean and AOT.exists():
        for f in list(AOT.rglob("*")):
            if f.is_file():
                f.unlink()

    sys.path.insert(0, str(REPO))
    from webgpu_msm_tpu.utils.cache import _source_hash

    src_hash = _source_hash()

    total = 0
    n_exp = 0
    n_stale = 0
    for f in sorted((CACHE / "jax_export").glob("*.stablehlo")):
        # Skip artifacts traced from an older source tree: their key embeds
        # the old source hash, so they can never load against this tree —
        # committing them would be silent dead weight (round-4 advice).
        # Missing sidecar == pre-sidecar era == stale by construction.
        meta = f.with_name(f.name + ".meta")
        if not meta.exists() or meta.read_text().strip() != src_hash:
            n_stale += 1
            continue
        total += pack(f, AOT / "export" / (f.name + ".gz"))
        n_exp += 1
    if n_stale:
        print(f"WARNING: skipped {n_stale} stale exports (older source tree);"
              " re-run the production paths to re-trace", file=sys.stderr)
    (AOT / "SOURCE_HASH").write_text(src_hash + "\n")

    n_cache = 0
    cutoff = time.time() - args.newer_than_min * 60 if args.newer_than_min else 0
    for f in sorted((CACHE / "jax").glob("*-cache")):
        if not any(p in f.name for p in patterns):
            continue
        if f.stat().st_mtime < cutoff:
            continue
        total += pack(f, AOT / "jax" / (f.name + ".gz"))
        n_cache += 1

    mb = total / 1e6
    print(f"packed {n_exp} exports + {n_cache} cache entries -> {mb:.1f} MB")
    if mb > args.max_mb:
        print(f"ERROR: exceeds --max-mb {args.max_mb}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    main()
