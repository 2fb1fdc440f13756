"""ctypes bindings for the native C++ prefetching loader.

The C++ side (native/houv_loader.cpp) runs pose synthesis / jitter /
voxelization in a thread pool and hands fully-formed batches through a ring
buffer — the role of the reference's torch DataLoader worker processes,
without Python in the hot path. Builds on demand with g++; callers fall
back to the pure-Python batch_iterator when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import shutil
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                    "houv_loader.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                    "libhouv_loader.so")

_lib = None


def build_native(force: bool = False) -> str | None:
    """Compile the shared library if needed. Returns the path or None."""
    src = os.path.abspath(_SRC)
    lib = os.path.abspath(_LIB)
    if not os.path.exists(src):
        return None
    if os.path.exists(lib) and not force and (
        os.path.getmtime(lib) >= os.path.getmtime(src)
    ):
        return lib
    gxx = shutil.which("g++")
    if gxx is None:
        return None
    cmd = [gxx, "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
           "-std=c++17", "-o", lib, src]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except subprocess.CalledProcessError as e:  # pragma: no cover
        raise RuntimeError(
            f"native loader build failed:\n{e.stderr.decode()}"
        ) from e
    return lib


def _load():
    global _lib
    if _lib is not None:
        return _lib
    path = build_native()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.loader_create.restype = ctypes.c_void_p
    lib.loader_create.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_uint64, ctypes.c_int, ctypes.c_int,
    ]
    lib.loader_next.restype = ctypes.c_int
    lib.loader_next.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 4
    lib.loader_queue_size.restype = ctypes.c_int64
    lib.loader_queue_size.argtypes = [ctypes.c_void_p]
    lib.loader_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        return _load() is not None
    except RuntimeError:
        return False


class NativeRegistrationLoader:
    """Threaded prefetching loader for registration training batches.

    Samples with replacement (step-based training); each batch carries
    (src, tgt, transform[, coords]) with the reference's train-time pose
    synthesis applied natively."""

    def __init__(self, src: np.ndarray, tgt: np.ndarray, batch_size: int,
                 *, max_angle_deg: float = 45.0, max_trans: float = 0.5,
                 jitter_sigma: float = 0.0, seed: int = 2021,
                 n_threads: int = 4, capacity: int = 8,
                 with_voxels: bool = False, grid_size: int = 50):
        lib = _load()
        if lib is None:
            raise RuntimeError("native loader unavailable (no g++?)")
        self._lib = lib
        # keep references so the C++ side's pointers stay valid
        self._src = np.ascontiguousarray(src, np.float32)
        self._tgt = np.ascontiguousarray(tgt, np.float32)
        n, n_points, _ = self._src.shape
        self.batch_size = batch_size
        self.n_points = n_points
        self.with_voxels = with_voxels
        self._handle = lib.loader_create(
            self._src.ctypes.data, self._tgt.ctypes.data,
            ctypes.c_int64(n), n_points, batch_size, n_threads, capacity,
            ctypes.c_float(np.radians(max_angle_deg)),
            ctypes.c_float(max_trans), ctypes.c_float(jitter_sigma),
            ctypes.c_uint64(seed), int(with_voxels), grid_size,
        )
        if not self._handle:
            raise RuntimeError("loader_create failed")

    def next_batch(self) -> dict:
        b, npts = self.batch_size, self.n_points
        src = np.empty((b, npts, 3), np.float32)
        tgt = np.empty((b, npts, 3), np.float32)
        tf = np.empty((b, 4, 4), np.float32)
        coords = (np.empty((b, npts, 3), np.int32)
                  if self.with_voxels else None)
        rc = self._lib.loader_next(
            self._handle, src.ctypes.data, tgt.ctypes.data, tf.ctypes.data,
            coords.ctypes.data if coords is not None else None,
        )
        if rc != 0:
            raise StopIteration("loader stopped")
        out = {"src": src, "tgt": tgt, "transform": tf}
        if coords is not None:
            out["coords"] = coords
        return out

    def queue_size(self) -> int:
        return int(self._lib.loader_queue_size(self._handle))

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.loader_destroy(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
