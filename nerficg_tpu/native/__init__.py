"""Native (C++) runtime components, built on demand with the system g++.

Currently: the image decode + threaded prefetch library (image_io.cpp),
replacing Python-side PIL decoding on the dataset-loading path — the
reference's equivalent is its torch.multiprocessing loader pools
(src/Datasets/utils.py:115-149).  Bindings are plain ctypes over a C ABI
(pybind11 is not available in this environment).

The shared object is compiled once into ``~/.cache/nerficg_tpu/`` keyed by
a source hash; if no compiler or headers are available the package reports
unavailable and callers fall back to PIL.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

__all__ = ['native_io_available', 'decode_image', 'decode_batch']

_SRC = Path(__file__).with_name('image_io.cpp')
_CACHE_DIR = Path(os.environ.get('NERFICG_NATIVE_CACHE',
                                 Path.home() / '.cache' / 'nerficg_tpu'))
_lib: Optional[ctypes.CDLL] = None
_checked = False


def _build() -> Optional[Path]:
    src = _SRC.read_bytes()
    tag = hashlib.sha256(src).hexdigest()[:16]
    out = _CACHE_DIR / f'image_io_{tag}.so'
    if out.is_file():
        return out
    _CACHE_DIR.mkdir(parents=True, exist_ok=True)
    tmp = out.with_suffix('.so.tmp')
    cmd = ['g++', '-O3', '-shared', '-fPIC', '-std=c++17', str(_SRC),
           '-o', str(tmp), '-lpng', '-ljpeg', '-lz', '-lpthread']
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception:
        return None
    os.replace(tmp, out)
    return out


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _checked
    if _checked:
        return _lib
    _checked = True
    if os.environ.get('NERFICG_DISABLE_NATIVE'):
        return None
    path = _build()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(str(path))
    except OSError:
        return None
    lib.decode_image.restype = ctypes.c_int
    lib.decode_image.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int)]
    lib.decode_batch.restype = ctypes.c_int
    lib.decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.free_buffer.argtypes = [ctypes.POINTER(ctypes.c_float)]
    _lib = lib
    return _lib


def native_io_available() -> bool:
    return _load() is not None


def _take(lib, ptr, h, w, c) -> np.ndarray:
    n = h * w * c
    arr = np.ctypeslib.as_array(ptr, shape=(n,)).astype(np.float32,
                                                        copy=True)
    lib.free_buffer(ptr)
    return arr.reshape(h, w, c)


def decode_image(path: str | Path) -> Optional[np.ndarray]:
    """Decode a png/jpeg into float32 HWC [0,1]; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    ptr = ctypes.POINTER(ctypes.c_float)()
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    rc = lib.decode_image(str(path).encode(), ctypes.byref(ptr),
                          ctypes.byref(h), ctypes.byref(w), ctypes.byref(c))
    if rc != 0:
        return None
    return _take(lib, ptr, h.value, w.value, c.value)


def decode_batch(paths: list, n_threads: int = 8) -> Optional[list]:
    """Decode many images with the native thread pool; None on failure."""
    lib = _load()
    if lib is None or not paths:
        return None
    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    ptrs = (ctypes.POINTER(ctypes.c_float) * n)()
    hs = (ctypes.c_int * n)()
    ws = (ctypes.c_int * n)()
    cs = (ctypes.c_int * n)()
    rcs = (ctypes.c_int * n)()
    rc = lib.decode_batch(c_paths, n, n_threads, ptrs, hs, ws, cs, rcs)
    if rc != 0:
        for i in range(n):
            if rcs[i] == 0 and ptrs[i]:
                lib.free_buffer(ptrs[i])
        return None
    return [_take(lib, ptrs[i], hs[i], ws[i], cs[i]) for i in range(n)]
