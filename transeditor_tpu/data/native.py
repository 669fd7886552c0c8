"""ctypes binding for the native IO runtime (native/teio.cpp).

Provides:
  * NativeLMDB      — read-only LMDB access (no lmdb python package),
  * decode_jpeg     — libjpeg RGB decode,
  * NativeLMDBLoader— C++ background-thread batch loader producing
                      decoded uint8 [B, res, res, 3] frames.

The .so is built on demand with g++ (cached next to the source).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SRC = os.path.abspath(os.path.join(_NATIVE_DIR, "teio.cpp"))
_SO = os.path.abspath(os.path.join(_NATIVE_DIR, "libteio.so"))

_lib = None
_lock = threading.Lock()


def _build() -> str:
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC,
           "-o", _SO, "-ljpeg", "-lpthread"]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def load_library() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.teio_lmdb_open.restype = ctypes.c_void_p
        lib.teio_lmdb_open.argtypes = [ctypes.c_char_p]
        lib.teio_lmdb_close.argtypes = [ctypes.c_void_p]
        lib.teio_lmdb_entries.restype = ctypes.c_long
        lib.teio_lmdb_entries.argtypes = [ctypes.c_void_p]
        lib.teio_lmdb_length.restype = ctypes.c_long
        lib.teio_lmdb_length.argtypes = [ctypes.c_void_p]
        lib.teio_lmdb_get.restype = ctypes.c_long
        lib.teio_lmdb_get.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_long,
            ctypes.c_void_p, ctypes.c_long]
        lib.teio_jpeg_decode.restype = ctypes.c_int
        lib.teio_jpeg_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int]
        lib.teio_jpeg_encode.restype = ctypes.c_long
        lib.teio_jpeg_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_long]
        lib.teio_loader_create.restype = ctypes.c_void_p
        lib.teio_loader_create.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_uint64, ctypes.c_int, ctypes.c_long, ctypes.c_long,
            ctypes.c_int]
        lib.teio_loader_next.restype = ctypes.c_int
        lib.teio_loader_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.teio_loader_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


class NativeLMDB:
    """Read-only LMDB handle over the native engine."""

    def __init__(self, path: str):
        self._lib = load_library()
        self._h = self._lib.teio_lmdb_open(path.encode())
        if not self._h:
            raise IOError(f"cannot open LMDB at {path}")

    def get(self, key: bytes) -> Optional[bytes]:
        size = self._lib.teio_lmdb_get(self._h, key, len(key), None, 0)
        if size < 0:
            return None
        buf = ctypes.create_string_buffer(size)
        self._lib.teio_lmdb_get(self._h, key, len(key), buf, size)
        return buf.raw

    @property
    def entries(self) -> int:
        return self._lib.teio_lmdb_entries(self._h)

    def __len__(self) -> int:
        return self._lib.teio_lmdb_length(self._h)

    def close(self):
        if self._h:
            self._lib.teio_lmdb_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def decode_jpeg(data: bytes, width: int, height: int) -> np.ndarray:
    lib = load_library()
    out = np.empty((height, width, 3), np.uint8)
    rc = lib.teio_jpeg_decode(data, len(data),
                              out.ctypes.data_as(ctypes.c_void_p),
                              width, height)
    if rc != 0:
        raise ValueError(f"jpeg decode failed ({rc})")
    return out


def encode_jpeg(img: np.ndarray, quality: int = 90) -> bytes:
    """[H, W, 3] uint8 RGB -> JPEG bytes via libjpeg (no PIL)."""
    lib = load_library()
    img = np.ascontiguousarray(img, np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"expected [H,W,3] uint8, got {img.shape}")
    h, w, _ = img.shape
    cap = w * h * 3 + 4096
    buf = ctypes.create_string_buffer(cap)
    n = lib.teio_jpeg_encode(img.ctypes.data_as(ctypes.c_void_p),
                             w, h, quality, buf, cap)
    if n < 0:
        raise ValueError(f"jpeg encode failed ({n})")
    return buf.raw[:n]


class NativeLMDBSource:
    """Source-protocol adapter (keys f'{res}-{idx:05d}',
    utils/dataset.py:30-36)."""

    def __init__(self, path: str):
        self.db = NativeLMDB(path)
        self._len = len(self.db)

    def __len__(self):
        return self._len

    def get(self, idx: int, resolution: int) -> np.ndarray:
        data = self.db.get(f"{resolution}-{idx:05d}".encode())
        if data is None:
            raise KeyError(idx)
        return decode_jpeg(data, resolution, resolution)


class NativeLMDBLoader:
    """Infinite iterator of NHWC batches, decoded and prefetched by N
    C++ worker threads (each owns a disjoint sub-shard of the host's
    index shard).

    ``as_uint8=True`` yields raw uint8 frames for the train step's
    on-device normalization path (4x less host->device traffic);
    default yields float32 in [-1, 1].
    """

    def __init__(self, path: str, batch: int, resolution: int, *,
                 prefetch: int = 4, seed: int = 0, shuffle: bool = True,
                 host_index: int = 0, host_count: int = 1,
                 flip: bool = True, workers: int = 1,
                 as_uint8: bool = False):
        self._lib = load_library()
        self._h = self._lib.teio_loader_create(
            path.encode(), resolution, batch, prefetch, seed,
            int(shuffle), host_index, host_count, workers)
        if not self._h:
            raise IOError(f"cannot create loader for {path}")
        self.batch = batch
        self.resolution = resolution
        self.flip = flip
        self.as_uint8 = as_uint8
        self._rng = np.random.RandomState(seed + 1000 + host_index)

    def __iter__(self) -> Iterator[np.ndarray]:
        return self

    def __next__(self) -> np.ndarray:
        out = np.empty((self.batch, self.resolution, self.resolution, 3),
                       np.uint8)
        rc = self._lib.teio_loader_next(
            self._h, out.ctypes.data_as(ctypes.c_void_p))
        if rc != 0:
            raise StopIteration
        if self.flip:
            mask = self._rng.rand(self.batch) < 0.5
            out[mask] = out[mask, :, ::-1, :]
        if self.as_uint8:
            return out
        return out.astype(np.float32) / 127.5 - 1.0

    def close(self):
        if self._h:
            self._lib.teio_loader_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
