"""Native (C++) components, built on demand with g++ and loaded via ctypes.

The runtime pieces around the XLA compute path that the reference keeps in
C++/CUDA host code live here; each has a pure-python fallback.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess

import numpy as np

logger = logging.getLogger(__name__)

_SRC_DIR = os.path.dirname(os.path.abspath(__file__))
_CACHE_DIR = os.environ.get(
    "PPP_TPU_NATIVE_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "patchperpix_tpu",
                 "native"))

_libs: dict[str, ctypes.CDLL | None] = {}


def _build_and_load(name: str) -> ctypes.CDLL | None:
    """Compile native/<name>.cpp to a shared lib (content-hashed cache)."""
    if name in _libs:
        return _libs[name]
    src = os.path.join(_SRC_DIR, name + ".cpp")
    try:
        with open(src, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        os.makedirs(_CACHE_DIR, exist_ok=True)
        so_path = os.path.join(_CACHE_DIR, f"{name}-{digest}.so")
        if not os.path.exists(so_path):
            cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                   "-std=c++17", src, "-o", so_path + ".tmp"]
            subprocess.run(cmd, check=True, capture_output=True)
            os.replace(so_path + ".tmp", so_path)
        lib = ctypes.CDLL(so_path)
        _libs[name] = lib
        return lib
    except Exception as e:  # pragma: no cover - fallback path
        logger.warning("native %s unavailable (%s); using python fallback",
                       name, e)
        _libs[name] = None
        return None


def skeletonize_3d_native(volume: np.ndarray) -> np.ndarray | None:
    """In-C++ 3D thinning; returns None if the native lib is unavailable."""
    lib = _build_and_load("thinning")
    if lib is None:
        return None
    fn = lib.ppp_skeletonize_3d
    fn.restype = ctypes.c_longlong
    fn.argtypes = [ctypes.POINTER(ctypes.c_uint8), ctypes.c_longlong,
                   ctypes.c_longlong, ctypes.c_longlong]
    vol = np.ascontiguousarray(volume > 0, dtype=np.uint8)
    nz, ny, nx = vol.shape
    fn(vol.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), nz, ny, nx)
    return vol


def skeletonize_2d_native(image: np.ndarray) -> np.ndarray | None:
    """In-C++ 2D thinning (8/4-connectivity, exact python-fallback
    semantics); returns None if the native lib is unavailable."""
    lib = _build_and_load("thinning")
    if lib is None:
        return None
    try:
        fn = lib.ppp_skeletonize_2d
    except AttributeError:  # stale cached lib without the 2D entry
        return None
    fn.restype = ctypes.c_longlong
    fn.argtypes = [ctypes.POINTER(ctypes.c_uint8), ctypes.c_longlong,
                   ctypes.c_longlong]
    img = np.ascontiguousarray(image > 0, dtype=np.uint8)
    ny, nx = img.shape
    fn(img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), ny, nx)
    return img
