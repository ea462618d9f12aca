"""ctypes bindings for the native C++ IO runtime (libmulls_io.so).

The native layer (``mulls_tpu/native/src/mulls_io.cpp``) plays the role of
the reference's C++ DataIo (`dataio.hpp`): format decoding (KITTI .bin,
PCD, PLY, txt/csv) into the framework's fixed-shape padded buffers, plus a
worker-thread prefetch ring the reference never needed (it was synchronous
and CPU-only) so scan decode overlaps device compute.

The library is built on demand with ``make -C mulls_tpu/native``; all
callers fall back to the pure-Python readers when the toolchain or the
build is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator, List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), os.pardir, "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libmulls_io.so"))

_lib = None
_lib_lock = threading.Lock()


def _build() -> bool:
    try:
        r = subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR), "-s"],
                           capture_output=True, timeout=120)
        return r.returncode == 0 and os.path.exists(_SO_PATH)
    except Exception:
        return False


def load_library():
    """Returns the loaded library or None (after one build attempt)."""
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib or None
        if not os.path.exists(_SO_PATH) and not _build():
            _lib = False
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            _lib = False
            return None
        f32p = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.mio_read_cloud.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_uint64, f32p, f32p, f32p,
            u8p]
        lib.mio_read_cloud.restype = ctypes.c_int
        lib.mio_prefetch_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int]
        lib.mio_prefetch_create.restype = ctypes.c_void_p
        lib.mio_prefetch_next.argtypes = [
            ctypes.c_void_p, f32p, f32p, f32p, u8p]
        lib.mio_prefetch_next.restype = ctypes.c_int
        lib.mio_prefetch_destroy.argtypes = [ctypes.c_void_p]
        lib.mio_prefetch_destroy.restype = None
        _lib = lib
        return lib


def native_available() -> bool:
    return load_library() is not None


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def read_cloud_native(path: str, n_raw: int, seed: int = 0) -> Optional[dict]:
    """Single-file native read into a padded frame dict, or None."""
    lib = load_library()
    if lib is None:
        return None
    xyz = np.empty((n_raw, 3), np.float32)
    intensity = np.empty((n_raw,), np.float32)
    ts = np.empty((n_raw,), np.float32)
    mask = np.empty((n_raw,), np.uint8)
    n = lib.mio_read_cloud(path.encode(), n_raw, seed, _f32p(xyz),
                           _f32p(intensity), _f32p(ts), _u8p(mask))
    if n < 0:
        return None
    return {"xyz": xyz, "intensity": intensity, "ts_ratio": ts,
            "mask": mask.astype(bool)}


class NativePrefetcher:
    """Iterates padded frames decoded by the native worker pool, in order.

    Usage::
        with NativePrefetcher(files, n_raw) as pf:
            for frame in pf: ...
    """

    def __init__(self, files: List[str], n_raw: int, workers: int = 4,
                 depth: int = 8):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native IO library unavailable")
        self._lib = lib
        self._files = list(files)
        self._n_raw = n_raw
        arr = (ctypes.c_char_p * len(files))(
            *[f.encode() for f in self._files])
        self._handle = lib.mio_prefetch_create(arr, len(files), n_raw,
                                               workers, depth)
        self._consumed = 0

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def close(self):
        if self._handle:
            self._lib.mio_prefetch_destroy(self._handle)
            self._handle = None

    def __len__(self) -> int:
        return len(self._files)

    def __iter__(self) -> Iterator[dict]:
        n_raw = self._n_raw
        for _ in range(len(self._files)):
            xyz = np.empty((n_raw, 3), np.float32)
            intensity = np.empty((n_raw,), np.float32)
            ts = np.empty((n_raw,), np.float32)
            mask = np.empty((n_raw,), np.uint8)
            n = self._lib.mio_prefetch_next(
                self._handle, _f32p(xyz), _f32p(intensity), _f32p(ts),
                _u8p(mask))
            if n < 0:
                raise IOError(
                    f"native read failed (code {n}) at frame {self._consumed}"
                    f": {self._files[self._consumed]}")
            self._consumed += 1
            yield {"xyz": xyz, "intensity": intensity, "ts_ratio": ts,
                   "mask": mask.astype(bool)}


class PackedSegmentPrefetcher:
    """Iterates whole SEGMENTS of frames already quantized to the wire
    format by the C++ workers ([segment, n_raw] batches, tail repeated).
    Yields (frames_in_batch, dict of packed numpy arrays)."""

    def __init__(self, files: List[str], n_raw: int, segment: int,
                 workers: int = 4, depth: int = 3):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native IO library unavailable")
        import ctypes as ct
        if not hasattr(lib, "_packed_ready"):
            i16p = ct.POINTER(ct.c_int16)
            u8p = ct.POINTER(ct.c_uint8)
            u16p = ct.POINTER(ct.c_uint16)
            i32p = ct.POINTER(ct.c_int32)
            lib.mio_packed_prefetch_create.argtypes = [
                ct.POINTER(ct.c_char_p), ct.c_int, ct.c_int, ct.c_int,
                ct.c_int, ct.c_int]
            lib.mio_packed_prefetch_create.restype = ct.c_void_p
            lib.mio_packed_prefetch_next.argtypes = [
                ct.c_void_p, i16p, u8p, u16p, i32p]
            lib.mio_packed_prefetch_next.restype = ct.c_int
            lib.mio_packed_prefetch_destroy.argtypes = [ct.c_void_p]
            lib.mio_packed_prefetch_destroy.restype = None
            lib._packed_ready = True
        self._lib = lib
        self._files = list(files)
        self._n_raw = n_raw
        self._segment = segment
        arr = (ctypes.c_char_p * len(files))(*[f.encode() for f in files])
        self._handle = lib.mio_packed_prefetch_create(
            arr, len(files), n_raw, segment, workers, depth)
        self._batches = -(-len(files) // segment) if files else 0

    def close(self):
        if self._handle:
            self._lib.mio_packed_prefetch_destroy(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __iter__(self):
        import ctypes as ct
        n_raw, seg = self._n_raw, self._segment
        for _ in range(self._batches):
            xyz = np.empty((seg, n_raw, 3), np.int16)
            inten = np.empty((seg, n_raw), np.uint8)
            ts = np.empty((seg, n_raw), np.uint16)
            counts = np.empty((seg,), np.int32)
            k = self._lib.mio_packed_prefetch_next(
                self._handle,
                xyz.ctypes.data_as(ct.POINTER(ct.c_int16)),
                inten.ctypes.data_as(ct.POINTER(ct.c_uint8)),
                ts.ctypes.data_as(ct.POINTER(ct.c_uint16)),
                counts.ctypes.data_as(ct.POINTER(ct.c_int32)))
            if k < 0:
                return
            yield k, {"xyz_q": xyz, "intensity_q": inten, "ts_q": ts,
                      "n": counts}
