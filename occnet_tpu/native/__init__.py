"""Native (C++) runtime components, built on demand with g++ and loaded via
ctypes — the framework's counterpart of the reference's JIT-compiled dvr
extension (`torch.utils.cpp_extension.load` at ray_metrics.py:12)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None


def _build_lib() -> str:
    src = os.path.join(_HERE, "dvr_cpu.cc")
    out = os.path.join(_HERE, "_dvr_cpu.so")
    if (not os.path.exists(out)
            or os.path.getmtime(out) < os.path.getmtime(src)):
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               "-fopenmp", src, "-o", out]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except subprocess.CalledProcessError:
            # retry without openmp (not all toolchains ship libgomp)
            cmd = ["g++", "-O3", "-shared", "-fPIC", src, "-o", out]
            subprocess.run(cmd, check=True, capture_output=True)
    return out


def _get_lib() -> ctypes.CDLL:
    global _LIB
    with _LOCK:
        if _LIB is None:
            lib = ctypes.CDLL(_build_lib())
            lib.dvr_render_forward.restype = None
            lib.dvr_render_forward.argtypes = [
                ctypes.POINTER(ctypes.c_float),            # occ
                ctypes.c_int, ctypes.c_int, ctypes.c_int,  # X, Y, Z
                ctypes.POINTER(ctypes.c_float),            # origins
                ctypes.POINTER(ctypes.c_float),            # dirs
                ctypes.c_int,                              # n_rays
                ctypes.c_int,                              # max_steps
                ctypes.POINTER(ctypes.c_float),            # dist_out
                ctypes.POINTER(ctypes.c_int32),            # coord_out
                ctypes.POINTER(ctypes.c_uint8),            # hit_out
            ]
            _LIB = lib
    return _LIB


def dvr_render_forward_cpu(
    occ: np.ndarray,          # (X, Y, Z) float32
    origins: np.ndarray,      # (R, 3) float32, voxel units
    dirs: np.ndarray,         # (R, 3) float32
    max_steps: int = 448,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Native DDA render: returns (dist (R,), coord (R, 3) int32, hit (R,))
    with dvr.render_forward semantics (see dvr_cpu.cc)."""
    lib = _get_lib()
    occ = np.ascontiguousarray(occ, np.float32)
    origins = np.ascontiguousarray(origins, np.float32)
    dirs = np.ascontiguousarray(dirs, np.float32)
    n = origins.shape[0]
    dist = np.zeros(n, np.float32)
    coord = np.zeros((n, 3), np.int32)
    hit = np.zeros(n, np.uint8)
    X, Y, Z = occ.shape
    fp = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))  # noqa
    lib.dvr_render_forward(
        fp(occ), X, Y, Z, fp(origins), fp(dirs), n, max_steps, fp(dist),
        coord.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        hit.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return dist, coord, hit.astype(bool)
