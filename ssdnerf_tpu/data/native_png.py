"""ctypes loader for the native batched PNG decoder (pngdec.c).

Compiles the C source on first use into a content-hashed shared object
under ``~/.cache/ssdnerf_tpu`` (no build step in the package install; the
reference JIT-compiles its CUDA ops the same way via
torch.utils.cpp_extension.load, lib/ops/raymarching/backend.py).  Every
entry point degrades gracefully: if a compiler or libpng is missing the
callers fall back to per-file cv2 decoding.
"""
import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'pngdec.c')
_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    with open(_SRC, 'rb') as f:
        src = f.read()
    tag = hashlib.sha256(src).hexdigest()[:16]
    cache_dir = os.path.join(
        os.path.expanduser(os.environ.get('SSDNERF_CACHE',
                                          '~/.cache/ssdnerf_tpu')))
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, f'pngdec_{tag}.so')
    if not os.path.exists(so_path):
        tmp = so_path + f'.tmp{os.getpid()}'
        cmd = ['cc', '-O2', '-shared', '-fPIC', _SRC,
               '-lpng', '-lz', '-lpthread', '-o', tmp]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, so_path)  # atomic under concurrent builders
    lib = ctypes.CDLL(so_path)
    lib.png_batch_decode.restype = ctypes.c_int
    lib.png_batch_decode.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
        ctypes.c_int]
    lib.png_batch_dims.restype = ctypes.c_int
    lib.png_batch_dims.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int)]
    return lib


def get_lib():
    """The compiled decoder, or None when it can't be built here."""
    global _lib, _tried
    if _lib is None and not _tried:
        with _lock:
            if _lib is None and not _tried:
                try:
                    _lib = _build()
                except Exception:
                    _lib = None
                _tried = True
    return _lib


def png_dims(path):
    """(h, w) from the IHDR header, or None if not a readable PNG."""
    lib = get_lib()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.png_batch_dims(path.encode(), ctypes.byref(h),
                          ctypes.byref(w)) != 0:
        return None
    return h.value, w.value


def decode_batch(paths, num_threads=8):
    """Decode same-sized PNGs to a (N, H, W, 3) uint8 array without the
    GIL (one ctypes call; pthread pool inside).  Returns None when the
    native decoder is unavailable or any image can't be decoded at the
    batch's shape — callers fall back to cv2."""
    lib = get_lib()
    if lib is None or not paths:
        return None
    dims = png_dims(paths[0])
    if dims is None:
        return None
    h, w = dims
    if h <= 0 or w <= 0:
        return None
    out = np.empty((len(paths), h, w, 3), np.uint8)
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    rc = lib.png_batch_decode(
        arr, len(paths),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        h, w, int(num_threads))
    if rc != 0:
        return None
    return out
