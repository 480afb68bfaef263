"""ctypes bindings for the native host-side components.

``native/slam_baseline.cpp`` is the self-established CPU baseline
(BASELINE.md: the reference publishes no numbers) — a clean-room C++
EKF-SLAM running the exact reference workload.  The library auto-builds via
``make`` on first use.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import NamedTuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libslam_baseline.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.run_ekf_baseline_ex.restype = ctypes.c_int64
    lib.run_ekf_baseline_ex.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,      # landmarks
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,      # waypoints
        ctypes.c_int, ctypes.c_uint64, ctypes.c_int,       # max_steps, seed, noise
        ctypes.c_int, ctypes.c_float,                      # prebuild_map, sigma0
        ctypes.POINTER(ctypes.c_double),                   # out seconds
        ctypes.POINTER(ctypes.c_float),                    # out ate
        ctypes.POINTER(ctypes.c_float),                    # out traj (nullable)
    ]
    _lib = lib
    return lib


class BaselineResult(NamedTuple):
    steps: int
    seconds: float
    steps_per_s: float
    ate_rmse: float
    trajectory: np.ndarray | None


def run_ekf_baseline(
    landmarks: np.ndarray,
    waypoints: np.ndarray,
    max_steps: int = 25_000,
    seed: int = 0,
    with_noise: bool = True,
    want_trajectory: bool = False,
    prebuild_map: bool = False,
    sigma0: float = 1.0,
) -> BaselineResult:
    """Run the native C++ EKF-SLAM on the given world (row-major (N, 2)).

    ``prebuild_map`` starts from a fully-registered map (steady-state
    tracking benchmark) instead of an empty one.
    """
    lib = _load()
    lm = np.ascontiguousarray(landmarks, dtype=np.float32)
    wp = np.ascontiguousarray(waypoints, dtype=np.float32)
    secs = ctypes.c_double(0.0)
    ate = ctypes.c_float(0.0)
    traj = np.zeros((max_steps, 3), np.float32) if want_trajectory else None
    traj_ptr = (
        traj.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        if traj is not None
        else ctypes.POINTER(ctypes.c_float)()
    )
    steps = lib.run_ekf_baseline_ex(
        lm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), lm.shape[0],
        wp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), wp.shape[0],
        max_steps, seed, int(with_noise), int(prebuild_map), sigma0,
        ctypes.byref(secs), ctypes.byref(ate), traj_ptr,
    )
    secs_v = max(secs.value, 1e-9)
    return BaselineResult(
        steps=int(steps),
        seconds=secs_v,
        steps_per_s=steps / secs_v,
        ate_rmse=float(ate.value),
        trajectory=traj[:steps] if traj is not None else None,
    )
