"""Build/load the native CPU MSM library (ctypes; no pybind11 in image).

Compiles `csrc/msm_cpu.cpp` into `_build/libmsm_cpu.so` on first use and
caches by source mtime. The reference ships a prebuilt pkg.zip fallback for
its wasm engine (DESIGN.md:159); here the fallback is the pure-Python oracle
if no C++ toolchain is present.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

_DIR = Path(__file__).resolve().parent
_SRC = _DIR / "csrc" / "msm_cpu.cpp"
_BUILD = _DIR / "_build"
_LIB = _BUILD / "libmsm_cpu.so"

_lib = None


class NativeBuildError(RuntimeError):
    pass


def build(force: bool = False) -> Path:
    _BUILD.mkdir(exist_ok=True)
    if not force and _LIB.exists() and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
        return _LIB
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        "-std=c++17", "-o", str(_LIB), str(_SRC),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except FileNotFoundError as e:
        raise NativeBuildError(f"no C++ toolchain: {e}") from e
    except subprocess.CalledProcessError as e:
        raise NativeBuildError(f"native build failed:\n{e.stderr}") from e
    return _LIB


def load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(str(build()))
    lib.msm_run.restype = ctypes.c_int
    lib.msm_run.argtypes = [
        ctypes.POINTER(ctypes.c_uint64),  # points
        ctypes.POINTER(ctypes.c_uint64),  # scalars
        ctypes.c_size_t,                  # n
        ctypes.c_int,                     # window_bits
        ctypes.c_int,                     # n_threads
        ctypes.POINTER(ctypes.c_uint64),  # out_xy
    ]
    lib.point_add_affine.restype = ctypes.c_int
    lib.point_add_affine.argtypes = [ctypes.POINTER(ctypes.c_uint64)] * 3
    _lib = lib
    return lib
