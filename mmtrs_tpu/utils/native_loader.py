"""ctypes bindings for the native C++ batch loader (native/loader.cpp).

Builds the shared library on first use (g++ + system libjpeg) and falls back
to the PIL path in mmtrs_tpu.utils.images transparently if the toolchain or
libjpeg is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SO = _NATIVE_DIR / "build" / "libmmtrs_loader.so"
_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
            check=True, capture_output=True, timeout=120,
        )
        return _SO.exists()
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not _SO.exists() and not _build():
        return None
    lib = ctypes.CDLL(str(_SO))
    lib.mmtrs_decode_batch.restype = ctypes.c_int
    lib.mmtrs_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
    ]
    lib.mmtrs_encode_jpeg.restype = ctypes.c_int
    lib.mmtrs_encode_jpeg.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_ubyte),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return get_lib() is not None


def decode_batch(
    paths: list,
    out_hw: tuple[int, int],
    min_edge: int = 0,
    num_threads: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Decode JPEGs → [N, H, W, 3] uint8 + status array (0 ok / 1 rejected /
    2 error). Raises RuntimeError when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    h, w = out_hw
    out = np.zeros((n, h, w, 3), dtype=np.uint8)
    status = np.zeros(n, dtype=np.int32)
    c_paths = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    nt = num_threads or min(8, os.cpu_count() or 1)
    lib.mmtrs_decode_batch(
        c_paths, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), h, w,
        min_edge, nt,
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return out, status


def encode_jpeg(path, img: np.ndarray, quality: int = 95) -> None:
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    rc = lib.mmtrs_encode_jpeg(
        str(path).encode(), img.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        h, w, quality,
    )
    if rc != 0:
        raise IOError(f"jpeg encode failed ({rc}) for {path}")
