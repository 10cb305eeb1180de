"""ctypes bindings for the native ingest library (ingest.cpp).

Compiled lazily on first use with g++ (cached in ``build/``); falls back
gracefully when no toolchain or image libraries are present —
``native_available()`` gates the fast path, PIL remains the parity path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "ingest.cpp")
_BUILD_DIR = os.path.join(_DIR, "build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libvtp_ingest.so")

_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None

MODE_ADM_CROP = 0
MODE_NAIVE_RESIZE = 1
MODE_RESIZE_CROP = 2


def _build() -> Optional[str]:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        _SRC, "-o", _LIB_PATH, "-ljpeg", "-lpng", "-lpthread",
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=180)
    except (OSError, subprocess.TimeoutExpired) as e:
        return f"build failed: {e}"
    if proc.returncode != 0:
        return f"build failed: {proc.stderr[-2000:]}"
    return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_error
    if _lib is not None:
        return _lib
    if _build_error is not None:
        return None
    if not os.path.exists(_LIB_PATH) or (
        os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
    ):
        _build_error = _build()
        if _build_error:
            return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.vtp_ingest_batch.restype = ctypes.c_int
    lib.vtp_ingest_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _build_error


def ingest_batch(
    paths: Sequence[str],
    target: int,
    *,
    mode: int = MODE_ADM_CROP,
    aux: int = 0,
    mean: Sequence[float] = (0.485, 0.456, 0.406),
    std: Sequence[float] = (0.229, 0.224, 0.225),
    flips: Optional[Sequence[int]] = None,
    num_threads: int = 0,
    out: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Decode+preprocess a batch of image files into (N, 3, T, T) fp32.

    mode: MODE_ADM_CROP (reconstruction/extraction protocol),
    MODE_NAIVE_RESIZE (zero-shot), MODE_RESIZE_CROP with aux=resize size
    (linear-probe eval). Failed decodes produce zero-filled rows; the
    failure count is attached as ``out.failures`` is NOT — check the
    return of ``ingest_batch_with_failures`` when that matters.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native ingest unavailable: {_build_error}")
    n = len(paths)
    if out is None:
        out = np.empty((n, 3, target, target), np.float32)
    assert out.shape == (n, 3, target, target) and out.dtype == np.float32
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    mean_arr = (ctypes.c_float * 3)(*[float(m) for m in mean])
    std_arr = (ctypes.c_float * 3)(*[float(s) for s in std])
    flips_arr = (ctypes.c_int * n)(*[int(f) for f in flips]) if flips is not None else None
    nt = num_threads or min(os.cpu_count() or 8, 16)
    lib.vtp_ingest_batch(
        c_paths, n, target, aux, mode, mean_arr, std_arr,
        flips_arr, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nt,
    )
    return out
