"""ctypes bindings for the C++ batch audio loader (a2v_runtime.cc).

Auto-builds the shared library with g++ on first use (no pybind11 in this
environment; plain C ABI + ctypes). Every entry point has a pure-Python
fallback (data/wavio.py), so the native path is an optimization, never a
requirement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "liba2v_runtime.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def ensure_built(force: bool = False) -> bool:
    """Compile the shared library if missing; returns availability."""
    global _lib, _tried
    with _lock:
        if _lib is not None and not force:
            return True
        if _tried and not force:
            return _lib is not None
        _tried = True
        src = os.path.join(_HERE, "a2v_runtime.cc")
        if force or not os.path.isfile(_SO) or (
            os.path.isfile(src) and os.path.getmtime(src) > os.path.getmtime(_SO)
        ):
            try:
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-fPIC", "-pthread", "-shared",
                     "-o", _SO, src],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                return False
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return False
        lib.a2v_wav_info.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.a2v_wav_info.restype = ctypes.c_int
        lib.a2v_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_uint64,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int,
        ]
        lib.a2v_decode_batch.restype = ctypes.c_int
        _lib = lib
        return True


def available() -> bool:
    return ensure_built()


def wav_info_native(path: str) -> Tuple[int, int]:
    assert ensure_built(), "native runtime unavailable"
    frames = ctypes.c_int64()
    sr = ctypes.c_int()
    rc = _lib.a2v_wav_info(path.encode(), ctypes.byref(frames), ctypes.byref(sr))
    if rc != 0:
        raise ValueError(f"cannot decode {path}")
    return int(frames.value), int(sr.value)


def decode_batch(
    paths: List[str],
    target_len: int,
    normalize: bool = True,
    train: bool = True,
    seed: int = 0,
    expected_sr: int = 0,
    num_threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode+normalize+pad/crop a batch: returns
    (out (N, target_len) f32, valid_lens (N,), crop_starts (N,))."""
    assert ensure_built(), "native runtime unavailable"
    n = len(paths)
    out = np.empty((n, target_len), dtype=np.float32)
    valid = np.empty((n,), dtype=np.int64)
    starts = np.empty((n,), dtype=np.int64)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = _lib.a2v_decode_batch(
        arr,
        n,
        target_len,
        int(normalize),
        int(train),
        ctypes.c_uint64(seed),
        expected_sr,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        num_threads,
    )
    if failures:
        bad = [paths[i] for i in range(n) if valid[i] == 0]
        raise ValueError(f"{failures} files failed to decode, e.g. {bad[:3]}")
    return out, valid, starts
