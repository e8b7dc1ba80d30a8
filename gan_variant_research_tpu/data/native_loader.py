"""ctypes bindings + on-demand build for the native host-IO codec.

``decode_jpeg(path_or_bytes)`` returns an HWC uint8 RGB array or None when
the native path cannot handle the file (caller falls back to PIL).
``encode_jpeg(arr)`` returns JPEG bytes with the submission contract's
settings (quality, 4:4:4, optimized Huffman) or None. ``crc32c(data)``
is the Castagnoli CRC used by TFRecord framing, or None. The shared
library is compiled once per machine into the package's build dir; any
build/toolchain failure degrades silently to the PIL / no-verify paths.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).parent / "native"
_SO_PATH = _NATIVE_DIR / "libgvrnative.so"
_ABI_VERSION = 3
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    # Compile to a temp file and os.replace into place: a stale-ABI .so may
    # still be mapped by the dlopen that just failed the version check
    # (ctypes never dlcloses), and the loader caches handles by inode —
    # rewriting the mapped inode in place both corrupts the live mapping and
    # makes the second dlopen return the stale cached handle. A fresh inode
    # avoids both (and keeps concurrent processes from racing the write).
    import os

    src = _NATIVE_DIR / "codec.cpp"
    tmp = _SO_PATH.with_name(f".libgvrnative.{os.getpid()}.tmp.so")
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", str(tmp), str(src),
             "-ljpeg"],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(tmp, _SO_PATH)
        return True
    except Exception:
        try:
            tmp.unlink(missing_ok=True)
        except OSError:
            pass
        return False


def _open_lib():
    lib = ctypes.CDLL(str(_SO_PATH))
    if lib.gvr_version() != _ABI_VERSION:
        raise OSError("stale libgvrnative.so")
    lib.gvr_decode_jpeg.restype = ctypes.c_int
    lib.gvr_decode_jpeg.argtypes = [
        ctypes.c_char_p, ctypes.c_ulong,
        ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.gvr_encode_jpeg.restype = ctypes.c_long
    lib.gvr_encode_jpeg.argtypes = [
        ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_ubyte), ctypes.c_ulong,
    ]
    lib.gvr_crc32c.restype = ctypes.c_uint
    lib.gvr_crc32c.argtypes = [
        ctypes.c_char_p, ctypes.c_ulong, ctypes.c_uint,
    ]
    return lib


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if _SO_PATH.exists():
            try:
                _lib = _open_lib()
                return _lib
            except Exception:
                # stale ABI (OSError), or a foreign/corrupt .so that dlopens
                # but lacks our symbols (AttributeError) — rebuild below; the
                # module contract is that ANY load failure degrades to PIL
                pass
        if not _build():
            _build_failed = True
            return None
        try:
            _lib = _open_lib()
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


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 95,
    subsampling: int = 0,
    optimize: bool = True,
) -> bytes | None:
    """Encode an HWC uint8 RGB array to JPEG bytes; None → caller falls
    back to PIL. ``subsampling=0`` means 4:4:4 (the reference's PIL
    setting, generate_folder.py:248-250); any other value defers to
    libjpeg's quality-derived default."""
    lib = _load()
    if lib is None:
        return None
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        return None
    arr = np.ascontiguousarray(arr)
    h, w = arr.shape[:2]
    capacity = h * w * 3 + (1 << 16)  # uncompressed size + header slack
    out = np.empty((capacity,), np.uint8)
    rc = lib.gvr_encode_jpeg(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), h, w,
        int(quality), 1 if subsampling == 0 else 0, 1 if optimize else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), capacity,
    )
    if rc < 0:
        return None
    return out[:rc].tobytes()


_CRC32C_TABLE: list[int] | None = None


def _crc32c_python(data: bytes, crc: int) -> int:
    """Table-driven Castagnoli CRC32 fallback (reflected poly 0x82F63B78).

    ~10 MB/s — slow, but a TFRecord shard written with zero/absent CRCs is
    poisoned: this repo's own reader (and every standard TFRecord reader)
    rejects it as corrupt on the next host where verification IS available.
    Correct-but-slow beats fast-but-unreadable when the native codec failed
    to build."""
    global _CRC32C_TABLE
    if _CRC32C_TABLE is None:
        table = []
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ 0x82F63B78 if c & 1 else c >> 1
            table.append(c)
        _CRC32C_TABLE = table
    c = ~crc & 0xFFFFFFFF
    for b in data:
        c = _CRC32C_TABLE[(c ^ b) & 0xFF] ^ (c >> 8)
    return ~c & 0xFFFFFFFF


def crc32c(data: bytes, crc: int = 0) -> int:
    """Castagnoli CRC32 (TFRecord checksums). Uses the native codec when
    available, else a pure-Python table fallback — never unavailable, so
    written shards always carry real checksums and reads always verify."""
    lib = _load()
    if lib is None:
        return _crc32c_python(data, crc & 0xFFFFFFFF)
    return int(lib.gvr_crc32c(data, len(data), crc & 0xFFFFFFFF))
