"""Native (C++) data-path acceleration.

`fastnifti.cpp` provides GIL-releasing NIfTI decode + fused quantile
clip/normalize; this module builds it on demand with g++ (cached next to
the source) and exposes ctypes bindings with a clean "unavailable" signal
so callers can fall back to the pure-Python path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fastnifti.cpp")
_LIB = os.path.join(_DIR, "libfastnifti.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    # pid-unique tmp: concurrent cold-starts (e.g. complete_dataset --shard
    # fleet sweeps on one host) each link into their own file — a shared
    # ".tmp" would let one process os.replace() a half-written library that
    # another process's linker still holds open
    tmp = f"{_LIB}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-shared", "-fPIC", _SRC, "-lz", "-o", tmp]
    try:
        subprocess.run(
            cmd, check=True, capture_output=True, timeout=120
        )
        os.replace(tmp, _LIB)  # atomic: loaders see old or new, never half
        return True
    except Exception:
        return False
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass


def get_lib():
    """ctypes handle to libfastnifti, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.fastnifti_probe.restype = ctypes.c_int
        lib.fastnifti_probe.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int)
        ]
        lib.fastnifti_load.restype = ctypes.c_long
        lib.fastnifti_load.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.fastnifti_clip_normalize.restype = None
        lib.fastnifti_clip_normalize.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
            ctypes.c_double,
            ctypes.c_double,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def load_volume(path: str) -> tuple[np.ndarray, np.ndarray] | None:
    """Decode a NIfTI volume natively → (float32 F-ordered array, affine).

    Returns None if the native library is unavailable or the file uses an
    unsupported feature (caller falls back to the Python reader).
    """
    lib = get_lib()
    if lib is None:
        return None
    dims = (ctypes.c_int * 8)()
    nd = lib.fastnifti_probe(path.encode(), dims)
    if nd <= 0:
        return None
    shape = tuple(dims[1 : 1 + nd])
    n = int(np.prod(shape))
    out = np.empty(n, dtype=np.float32)
    affine_rows = (ctypes.c_float * 12)()
    has_sform = ctypes.c_int(0)
    got = lib.fastnifti_load(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n,
        dims,
        affine_rows,
        ctypes.byref(has_sform),
    )
    if got != n:
        return None
    vol = out.reshape(shape, order="F")
    affine = np.eye(4)
    if has_sform.value:
        affine[:3, :4] = np.frombuffer(
            bytes(affine_rows), dtype=np.float32
        ).reshape(3, 4)
    return vol, affine


def clip_and_normalize_inplace(
    vol: np.ndarray, qlo: float = 0.001, qhi: float = 0.999
) -> np.ndarray | None:
    """Native fused quantile clip + min-max normalize (in place on a
    contiguous float32 array). Returns the array, or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    assert vol.dtype == np.float32 and vol.flags["FORC"]
    flat = vol.reshape(-1, order="A")
    lib.fastnifti_clip_normalize(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        flat.size,
        qlo,
        qhi,
    )
    return vol
