"""Native (C++) runtime components with Python fallbacks.

The reference is a C++ program end to end; in the rebuild the TPU compute
path is JAX/Pallas, and the host-side runtime pieces that the reference
implements natively (the flex scene lexer, src/core/pbrtlex.ll) are C++ here
too, bound via ctypes.  ``g++ -O2 -shared`` builds on first use and caches
the shared object next to the source; any failure falls back to the pure-
Python implementation transparently.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import List, Optional

_DIR = Path(__file__).parent
_SO = _DIR / "libpbrt_lexer.so"
_SRC = _DIR / "pbrt_lexer.cpp"
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", str(_SRC), "-o", str(_SO)],
                check=True, capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(str(_SO))
        lib.pbrt_tokenize.restype = ctypes.c_int64
        lib.pbrt_tokenize.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


_PLY_SO = _DIR / "libply_reader.so"
_PLY_SRC = _DIR / "ply_reader.cpp"
_ply_lib = None
_ply_tried = False


def _load_ply() -> Optional[ctypes.CDLL]:
    global _ply_lib, _ply_tried
    if _ply_lib is not None or _ply_tried:
        return _ply_lib
    _ply_tried = True
    try:
        if (not _PLY_SO.exists()
                or _PLY_SO.stat().st_mtime < _PLY_SRC.stat().st_mtime):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", str(_PLY_SRC),
                 "-o", str(_PLY_SO)],
                check=True, capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(str(_PLY_SO))
        lib.ply_load.restype = ctypes.c_void_p
        lib.ply_load.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.ply_copy.restype = None
        lib.ply_copy.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.ply_free.restype = None
        lib.ply_free.argtypes = [ctypes.c_void_p]
        _ply_lib = lib
    except Exception:
        _ply_lib = None
    return _ply_lib


def read_ply_native(path):
    """Read a PLY mesh with the C++ reader (the rply analog, see
    ply_reader.cpp).  Returns (verts (nv,3) float32, tris (nt,3) int32)
    numpy arrays, or None if the native path is unavailable or parsing
    fails (caller falls back to the pure-Python reader)."""
    import numpy as np

    lib = _load_ply()
    if lib is None:
        return None
    nv = ctypes.c_int64(0)
    nt = ctypes.c_int64(0)
    h = lib.ply_load(str(path).encode(), ctypes.byref(nv), ctypes.byref(nt))
    if not h:
        return None
    try:
        verts = np.empty((nv.value, 3), np.float32)
        tris = np.empty((nt.value, 3), np.int32)
        lib.ply_copy(
            h,
            verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
    finally:
        lib.ply_free(h)
    return verts, tris


_IMG_SO = _DIR / "libimage_filters.so"
_IMG_SRC = _DIR / "image_filters.cpp"
_img_lib = None
_img_tried = False


def _load_img() -> Optional[ctypes.CDLL]:
    global _img_lib, _img_tried
    if _img_lib is not None or _img_tried:
        return _img_lib
    _img_tried = True
    try:
        if (not _IMG_SO.exists()
                or _IMG_SO.stat().st_mtime < _IMG_SRC.stat().st_mtime):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", str(_IMG_SRC),
                 "-o", str(_IMG_SO)],
                check=True, capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(str(_IMG_SO))
        lib.png_unfilter.restype = ctypes.c_int64
        lib.png_unfilter.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
        ]
        _img_lib = lib
    except Exception:
        _img_lib = None
    return _img_lib


def png_unfilter_native(raw: bytes, h: int, stride: int, fbpp: int):
    """Reconstruct PNG scanlines with the C++ filter decoder (the lodepng
    analog).  Returns an (h, stride) uint8 array, or None to signal the
    caller to use the pure-Python fallback."""
    import numpy as np

    lib = _load_img()
    if lib is None or len(raw) != h * (stride + 1):
        return None
    src = np.frombuffer(raw, np.uint8)
    out = np.empty((h, stride), np.uint8)
    rc = lib.png_unfilter(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, stride, fbpp,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out if rc == 0 else None


def tokenize_native(text: str) -> Optional[List[str]]:
    """Tokenize with the C++ lexer; None if the native path is unavailable."""
    lib = _load()
    if lib is None:
        return None
    data = text.encode("utf-8")
    cap = max(1024, len(data) // 2)
    for _ in range(3):
        starts = (ctypes.c_int64 * cap)()
        lens = (ctypes.c_int64 * cap)()
        n = lib.pbrt_tokenize(data, len(data), starts, lens, cap)
        if n >= 0:
            return [data[starts[i]: starts[i] + lens[i]].decode("utf-8")
                    for i in range(n)]
        cap = -n
    return None
