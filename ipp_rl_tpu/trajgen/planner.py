"""ctypes binding for the native min-snap trajectory generator.

API parity with the reference Cython class (reference
planning/trajectory_generation/mav_trajectory_generation.pyx:5-42):

    gen = MavTrajectoryGenerator(max_v, max_a)
    samples = gen.plan_uav_trajectory(waypoints, sampling_time)  # (K, 3)

The shared library is built on demand from min_snap.cpp with g++ (no
pybind11 / catkin / nlopt) and cached next to the source.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "min_snap.cpp")
_LIB = os.path.join(_HERE, "libminsnap.so")
_BUILD_LOCK = threading.Lock()


def build_library(force: bool = False) -> str:
    """Compile min_snap.cpp → libminsnap.so (cached)."""
    with _BUILD_LOCK:
        if not force and os.path.exists(_LIB) and os.path.getmtime(
            _LIB
        ) >= os.path.getmtime(_SRC):
            return _LIB
        cmd = [
            "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
            _SRC, "-o", _LIB,
        ]
        logger.info("building trajgen: %s", " ".join(cmd))
        subprocess.run(cmd, check=True, capture_output=True)
        return _LIB


def _load():
    lib = ctypes.CDLL(build_library())
    lib.trajgen_create.restype = ctypes.c_void_p
    lib.trajgen_create.argtypes = [ctypes.c_double, ctypes.c_double]
    lib.trajgen_destroy.argtypes = [ctypes.c_void_p]
    lib.trajgen_plan.restype = ctypes.c_int
    lib.trajgen_plan.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int,
        ctypes.c_double,
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int,
    ]
    lib.trajgen_total_time.restype = ctypes.c_double
    lib.trajgen_total_time.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int,
    ]
    return lib


class MavTrajectoryGenerator:
    """Min-snap polynomial trajectory through waypoints with velocity /
    acceleration limits, sampled at ``sampling_time`` intervals."""

    def __init__(self, max_v: float, max_a: float):
        self._lib = _load()
        self._planner = self._lib.trajgen_create(float(max_v), float(max_a))
        self.max_v = max_v
        self.max_a = max_a

    def __del__(self):
        try:
            self._lib.trajgen_destroy(self._planner)
        except Exception:  # pragma: no cover
            pass

    def total_flight_time(self, waypoints: np.ndarray) -> float:
        wps = np.ascontiguousarray(waypoints, dtype=np.float64)
        assert wps.ndim == 2 and wps.shape[1] == 3, "waypoints must be (N, 3)"
        ptr = wps.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
        return float(self._lib.trajgen_total_time(self._planner, ptr, len(wps)))

    def plan_uav_trajectory(
        self, waypoints: np.ndarray, sampling_time: float = 1.0
    ) -> np.ndarray:
        """Returns the sampled (K, 3) xyz trajectory (reference
        mav_trajectory_generation.pyx:14-42)."""
        wps = np.ascontiguousarray(waypoints, dtype=np.float64)
        assert wps.ndim == 2 and wps.shape[1] == 3, "waypoints must be (N, 3)"
        if len(wps) < 2:
            return wps.copy()
        total = self.total_flight_time(wps)
        if total < 0:
            raise RuntimeError("trajectory planning failed")
        cap = (int(total / sampling_time) + 4) * 3
        out = np.zeros(cap, dtype=np.float64)
        n = self._lib.trajgen_plan(
            self._planner,
            wps.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            len(wps),
            float(sampling_time),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            cap,
        )
        if n < 0:
            raise RuntimeError("trajectory planning failed")
        return out[: n * 3].reshape(n, 3)
