"""Native (C++) point-cloud post-processing, loaded via ctypes.

Builds mvsnet_tpu/native/pointcloud.cpp on first use (g++ -O3 -fopenmp,
cached next to the source); falls back to numpy implementations when no
compiler is available. See pointcloud.cpp for why this stage is native.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

from mvsnet_tpu.utils.logging import setup_logger

logger = setup_logger("mvsnet_tpu.native")

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "pointcloud.cpp")
_LIB_PATH = os.path.join(_HERE, "libpointcloud.so")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> bool:
    cmds = [
        ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
         _SRC, "-o", _LIB_PATH],
        ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB_PATH],  # no OpenMP
    ]
    for cmd in cmds:
        try:
            r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
            if r.returncode == 0:
                return True
            logger.debug("native build failed: %s", r.stderr[-500:])
        except (OSError, subprocess.TimeoutExpired) as e:
            logger.debug("native build error: %s", e)
    return False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if not os.path.exists(_LIB_PATH) or (
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            if not _build():
                logger.warning("native pointcloud lib unavailable; using numpy fallback")
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.voxel_downsample.restype = ctypes.c_int64
            lib.voxel_downsample.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_double, ctypes.c_void_p, ctypes.c_void_p]
            lib.radius_outlier_mask.restype = ctypes.c_int64
            lib.radius_outlier_mask.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_double,
                ctypes.c_int64, ctypes.c_void_p]
            _LIB = lib
        except OSError as e:
            logger.warning("failed to load native lib: %s", e)
        return _LIB


def has_native() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def voxel_downsample(points: np.ndarray, colors: Optional[np.ndarray],
                     voxel_size: float) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Average points (and colors) per occupied voxel."""
    points = np.ascontiguousarray(points, dtype=np.float32)
    n = len(points)
    if n == 0 or voxel_size <= 0:
        return points, colors
    if colors is not None:
        colors = np.ascontiguousarray(colors, dtype=np.uint8)

    lib = _load()
    if lib is not None:
        m = lib.voxel_downsample(_ptr(points),
                                 _ptr(colors) if colors is not None else None,
                                 n, voxel_size, None, None)
        out_p = np.empty((m, 3), np.float32)
        out_c = np.empty((m, 3), np.uint8) if colors is not None else None
        lib.voxel_downsample(_ptr(points),
                             _ptr(colors) if colors is not None else None,
                             n, voxel_size, _ptr(out_p),
                             _ptr(out_c) if out_c is not None else None)
        return out_p, out_c

    # numpy fallback
    keys = np.floor(points / voxel_size).astype(np.int64)
    _, inverse, counts = np.unique(keys, axis=0, return_inverse=True,
                                   return_counts=True)
    m = len(counts)
    out_p = np.zeros((m, 3), np.float64)
    np.add.at(out_p, inverse, points.astype(np.float64))
    out_p = (out_p / counts[:, None]).astype(np.float32)
    out_c = None
    if colors is not None:
        acc = np.zeros((m, 3), np.float64)
        np.add.at(acc, inverse, colors.astype(np.float64))
        out_c = np.clip(acc / counts[:, None] + 0.5, 0, 255).astype(np.uint8)
    return out_p, out_c


def radius_outlier_removal(points: np.ndarray, radius: float,
                           min_neighbors: int) -> np.ndarray:
    """Boolean keep-mask: >= min_neighbors points within the 27-cell
    neighborhood of each point's `radius`-sized voxel."""
    points = np.ascontiguousarray(points, dtype=np.float32)
    n = len(points)
    if n == 0:
        return np.zeros((0,), bool)

    lib = _load()
    if lib is not None:
        mask = np.empty((n,), np.uint8)
        lib.radius_outlier_mask(_ptr(points), n, radius, min_neighbors, _ptr(mask))
        return mask.astype(bool)

    keys = np.floor(points / radius).astype(np.int64)
    uniq, inverse, counts = np.unique(keys, axis=0, return_inverse=True,
                                      return_counts=True)
    cell_count = {tuple(k): int(c) for k, c in zip(uniq, counts)}
    neighbor_total = np.zeros(len(uniq), np.int64)
    for i, k in enumerate(uniq):
        total = 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    total += cell_count.get((k[0] + dx, k[1] + dy, k[2] + dz), 0)
        neighbor_total[i] = total
    return neighbor_total[inverse] >= min_neighbors
