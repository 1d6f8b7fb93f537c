"""Optical-flow backend dispatch.

The reference's flow estimator is OpenCV C++ (experiments/06:157-199).
Our production backend is the from-scratch C++ library
(native/farneback.cpp -> libvdxflow.so, ctypes-loaded); the numpy
implementation (vdx.metrics.farneback) is the always-available reference
backend. Both reproduce OpenCV's numerics to float32 accumulation noise
(validated against cv2 and the committed metric JSONs in
tests/test_metrics.py).
"""

from __future__ import annotations

import ctypes
from pathlib import Path
from typing import Optional

import numpy as np

from vdx.metrics import farneback as _np_backend

_LIB_PATHS = [
    Path(__file__).resolve().parents[2] / "native" / "build" / "libvdxflow.so",
    Path(__file__).resolve().parents[2] / "native" / "libvdxflow.so",
]


def _load_native() -> Optional[ctypes.CDLL]:
    for p in _LIB_PATHS:
        if p.exists():
            try:
                lib = ctypes.CDLL(str(p))
                lib.vdx_farneback_flow.argtypes = [
                    ctypes.POINTER(ctypes.c_uint8),  # prev
                    ctypes.POINTER(ctypes.c_uint8),  # curr
                    ctypes.c_int,  # H
                    ctypes.c_int,  # W
                    ctypes.c_double,  # pyr_scale
                    ctypes.c_int,  # levels
                    ctypes.c_int,  # winsize
                    ctypes.c_int,  # iterations
                    ctypes.c_int,  # poly_n
                    ctypes.c_double,  # poly_sigma
                    ctypes.POINTER(ctypes.c_float),  # out flow [H, W, 2]
                ]
                lib.vdx_farneback_flow.restype = ctypes.c_int
                return lib
            except OSError:
                continue
    return None


_native = _load_native()


class OpticalFlowEstimator:
    """Drop-in equivalent of the reference's estimator (06:157-199).

    backend: "native" (C++), "numpy", or "auto" (native if built).
    """

    def __init__(self, backend: str = "auto"):
        if backend == "auto":
            backend = "native" if _native is not None else "numpy"
        if backend == "native" and _native is None:
            raise RuntimeError("libvdxflow.so not built; run native/build.sh")
        self.backend = backend

    def compute_flow(self, frame1: np.ndarray, frame2: np.ndarray) -> np.ndarray:
        """Frames [H, W, C] float in [0,1] -> flow [H, W, 2] (dx, dy).

        Grayscale conversion matches the reference exactly: channel MEAN
        (not luma), scaled to 255, truncated to uint8 (06:173-174).
        """
        gray1 = (frame1.mean(axis=-1) * 255).astype(np.uint8)
        gray2 = (frame2.mean(axis=-1) * 255).astype(np.uint8)
        return self.compute_flow_gray(gray1, gray2)

    def compute_flow_gray(self, gray1: np.ndarray, gray2: np.ndarray) -> np.ndarray:
        if self.backend == "numpy":
            return _np_backend.calc_flow(gray1, gray2)
        H, W = gray1.shape
        out = np.empty((H, W, 2), dtype=np.float32)
        g1 = np.ascontiguousarray(gray1)
        g2 = np.ascontiguousarray(gray2)
        rc = _native.vdx_farneback_flow(
            g1.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            g2.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            H, W, 0.5, 3, 15, 3, 5, 1.2,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc != 0:
            raise RuntimeError(f"vdx_farneback_flow failed: {rc}")
        return out

    def compute_flow_stats(self, flow: np.ndarray) -> dict:
        return _np_backend.flow_stats(flow)
