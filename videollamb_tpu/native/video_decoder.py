"""ctypes binding for the native libav video decoder.

Builds lazily (``make`` in videollamb_tpu/native) on first use if the
shared library is missing; all callers fall back to the OpenCV reader when
unavailable (videollamb_tpu/data/video_reader.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libvideodecoder.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _DIR], check=True,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) and not _build():
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _load_failed = True
            return None
        lib.vd_probe.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.vd_probe.restype = ctypes.c_int
        lib.vd_read_frames.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ]
        lib.vd_read_frames.restype = ctypes.c_int
        lib.vd_last_error.restype = ctypes.c_char_p
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def probe(path: str) -> Tuple[int, float]:
    lib = _load()
    assert lib is not None
    total = ctypes.c_int64()
    fps = ctypes.c_double()
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.vd_probe(path.encode(), ctypes.byref(total), ctypes.byref(fps),
                      ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise ValueError(f"probe failed for {path}: {lib.vd_last_error().decode()}")
    return int(total.value), float(fps.value)


def probe_dims(path: str) -> Tuple[int, int]:
    lib = _load()
    assert lib is not None
    total = ctypes.c_int64()
    fps = ctypes.c_double()
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.vd_probe(path.encode(), ctypes.byref(total), ctypes.byref(fps),
                      ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise ValueError(f"probe failed for {path}: {lib.vd_last_error().decode()}")
    return int(h.value), int(w.value)


def read_frames(path: str, indices: Sequence[int], n_threads: int = 0) -> np.ndarray:
    """Decode the frames at the given sorted indices -> (n, H, W, 3) uint8."""
    lib = _load()
    assert lib is not None
    h, w = probe_dims(path)
    idx = np.asarray(sorted(int(i) for i in indices), dtype=np.int64)
    out = np.empty((len(idx), h, w, 3), dtype=np.uint8)
    if n_threads <= 0:
        n_threads = min(os.cpu_count() or 1, 8)
    rc = lib.vd_read_frames(
        path.encode(),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(idx),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n_threads,
    )
    if rc != 0:
        raise ValueError(f"decode failed for {path}: {lib.vd_last_error().decode()}")
    return out
