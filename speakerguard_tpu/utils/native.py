"""ctypes binding for the native C++ batch WAV loader (native/wavloader.cpp).

Builds lazily with g++ on first use (cached as native/build/libwavloader.so);
falls back to None when no toolchain is available — callers then use the
scipy path.
"""

import ctypes
import os
import subprocess
import threading

_lock = threading.Lock()
_lib = None
_tried = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "wavloader.cpp")
_SO = os.path.join(_NATIVE_DIR, "build", "libwavloader.so")


def _build():
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Returns the loaded ctypes library or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_SO)
            lib.load_wav_batch.restype = ctypes.c_int
            lib.load_wav_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.c_long,
                ctypes.POINTER(ctypes.c_long), ctypes.c_float, ctypes.c_int]
            lib.wav_num_samples.restype = ctypes.c_long
            lib.wav_num_samples.argtypes = [ctypes.c_char_p]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def load_wav_batch(paths, wav_length, starts, scale=1.0, n_threads=8):
    """paths: list[str]; returns (n, wav_length) float32 or None if the
    native loader is unavailable/failed."""
    import numpy as np
    lib = get_lib()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, wav_length), dtype=np.float32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    c_starts = (ctypes.c_long * n)(*[int(s) for s in starts])
    rc = lib.load_wav_batch(
        c_paths, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        wav_length, c_starts, ctypes.c_float(scale), n_threads)
    return out if rc == 0 else None


def wav_num_samples(path):
    lib = get_lib()
    if lib is None:
        return None
    n = lib.wav_num_samples(path.encode())
    return None if n < 0 else int(n)
