"""ctypes bindings + on-demand build for the native JPEG decoder.

``decode_jpeg(path_or_bytes)`` returns an HWC uint8 RGB array or None when
the native path cannot handle the file (caller falls back to PIL). The
shared library is compiled once per machine into the package's build dir;
any build/toolchain failure degrades silently to the PIL path.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).parent / "native"
_SO_PATH = _NATIVE_DIR / "libgvrjpeg.so"
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    src = _NATIVE_DIR / "jpeg_decoder.cpp"
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", str(_SO_PATH), str(src),
             "-ljpeg"],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not _SO_PATH.exists() and not _build():
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(str(_SO_PATH))
            lib.gvr_decode_jpeg.restype = ctypes.c_int
            lib.gvr_decode_jpeg.argtypes = [
                ctypes.c_char_p, ctypes.c_ulong,
                ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
            assert lib.gvr_version() == 1
            _lib = lib
        except Exception:
            _build_failed = True
        return _lib


def native_available() -> bool:
    return _load() is not None


_MAX_SIDE = 4096
_tls = threading.local()


def _scratch() -> np.ndarray:
    buf = getattr(_tls, "buf", None)
    if buf is None:
        buf = np.empty((_MAX_SIDE * _MAX_SIDE * 3,), np.uint8)
        _tls.buf = buf
    return buf


def decode_jpeg(source: str | Path | bytes) -> np.ndarray | None:
    """Decode a JPEG to an HWC uint8 RGB array; None → caller falls back."""
    lib = _load()
    if lib is None:
        return None
    if isinstance(source, (str, Path)):
        p = Path(source)
        if p.suffix.lower() not in (".jpg", ".jpeg"):
            return None
        data = p.read_bytes()
    else:
        data = source
    buf = _scratch()
    out_h = ctypes.c_int()
    out_w = ctypes.c_int()
    rc = lib.gvr_decode_jpeg(
        data, len(data),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        _MAX_SIDE, _MAX_SIDE,
        ctypes.byref(out_h), ctypes.byref(out_w),
    )
    if rc != 0:
        return None
    h, w = out_h.value, out_w.value
    return buf[: h * w * 3].reshape(h, w, 3).copy()
