"""ctypes bindings for the native C++ image pipeline.

Compiles unimp_tpu/native/imagepipe.cc on first use (g++ -O3, cached by
source hash under ~/.cache/unimp_tpu) and exposes decode+resize for
single images and multithreaded batches. ctypes releases the GIL for
the duration of the call, so the DataLoader's Python threads get real
parallel decode. Falls back to PIL when the toolchain or libjpeg is
unavailable (see transforms.py).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "native", "imagepipe.cc")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_FAILED = False


def _cache_dir() -> str:
    d = os.environ.get(
        "UNIMP_CACHE", os.path.join(os.path.expanduser("~"), ".cache", "unimp_tpu")
    )
    os.makedirs(d, exist_ok=True)
    return d


def _build() -> Optional[str]:
    with open(_SRC, "rb") as f:
        src = f.read()
    tag = hashlib.sha256(src).hexdigest()[:16]
    so_path = os.path.join(_cache_dir(), f"imagepipe_{tag}.so")
    if os.path.exists(so_path):
        return so_path
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
        "-o", so_path, "-ljpeg", "-pthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return so_path
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired,
            FileNotFoundError) as e:
        msg = getattr(e, "stderr", b"")
        print(f"[native] build failed ({e}); {msg[:200]!r}; using PIL fallback")
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _FAILED
    if _LIB is not None or _FAILED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _FAILED:
            return _LIB
        so = _build()
        if so is None:
            _FAILED = True
            return None
        lib = ctypes.CDLL(so)
        lib.unimp_decode_resize.restype = ctypes.c_int
        lib.unimp_decode_resize.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte),
        ]
        lib.unimp_decode_resize_batch.restype = ctypes.c_int
        lib.unimp_decode_resize_batch.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_long), ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int,
        ]
        _LIB = lib
        return _LIB


def available() -> bool:
    return get_lib() is not None


def decode_resize(jpeg_bytes: bytes, out_size: int) -> Optional[np.ndarray]:
    """JPEG bytes -> uint8 [out_size, out_size, 3]; None on failure."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty((out_size, out_size, 3), np.uint8)
    rc = lib.unimp_decode_resize(
        jpeg_bytes, len(jpeg_bytes), out_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    return out if rc == 0 else None


def decode_resize_batch(
    jpeg_blobs: List[bytes], out_size: int, n_threads: int = 4
) -> Optional[np.ndarray]:
    """List of JPEG byte strings -> uint8 [N, S, S, 3]; failed decodes
    are zero-filled (count reported by the return code internally)."""
    lib = get_lib()
    if lib is None:
        return None
    blob = b"".join(jpeg_blobs)
    offsets = np.zeros(len(jpeg_blobs) + 1, np.int64)
    np.cumsum([len(b) for b in jpeg_blobs], out=offsets[1:])
    out = np.empty((len(jpeg_blobs), out_size, out_size, 3), np.uint8)
    lib.unimp_decode_resize_batch(
        blob,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        len(jpeg_blobs), out_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        n_threads,
    )
    return out
