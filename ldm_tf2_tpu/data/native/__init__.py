"""ctypes binding for the native (C++) data-loader hot path.

Builds libldm_native.so from tfrecord_native.cc on first use (cached next to
the source; g++ + libjpeg, both in the base image) and exposes:

  crc32c(bytes) -> int
  NativeRecordFile(path, verify_crc)  — record iteration over mmap'd file
  example_image_bytes(record) -> bytes
  example_caption(record, max_len) -> np.int64[...]
  decode_and_process(jpeg_bytes, image_size, flip) -> float32 [S,S,3]

`available()` gates usage; every caller falls back to the pure-Python
implementations in data/tfrecord.py + data/example_proto.py when the native
library can't be built (e.g. no compiler in a deployment image).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "tfrecord_native.cc")
_LIB = os.path.join(os.path.dirname(__file__), "libldm_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB,
        "-ljpeg",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(
            _SRC
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None

        lib.ldm_crc32c.restype = ctypes.c_uint32
        lib.ldm_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
        lib.ldm_tfrecord_open.restype = ctypes.c_void_p
        lib.ldm_tfrecord_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.ldm_tfrecord_num_records.restype = ctypes.c_long
        lib.ldm_tfrecord_num_records.argtypes = [ctypes.c_void_p]
        lib.ldm_tfrecord_record.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.ldm_tfrecord_record.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.POINTER(ctypes.c_size_t),
        ]
        lib.ldm_tfrecord_close.argtypes = [ctypes.c_void_p]
        lib.ldm_example_bytes.restype = ctypes.c_long
        lib.ldm_example_bytes.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_size_t),
        ]
        lib.ldm_example_int64s.restype = ctypes.c_long
        lib.ldm_example_int64s.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_long,
        ]
        lib.ldm_decode_and_process.restype = ctypes.c_int
        lib.ldm_decode_and_process.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.ldm_tfrecord_scan.restype = ctypes.c_long
        lib.ldm_tfrecord_scan.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
        ]
        lib.ldm_free.argtypes = [ctypes.c_void_p]
        lib.ldm_pread.restype = ctypes.c_long
        lib.ldm_pread.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
        return _lib


_enabled = True


def set_enabled(flag: bool) -> None:
    """Force the pure-Python fallback when False (A/B benchmarking,
    tools/bench_loader.py)."""
    global _enabled
    _enabled = bool(flag)


def available() -> bool:
    return _enabled and _load() is not None


def crc32c(data: bytes) -> int:
    return int(_load().ldm_crc32c(data, len(data)))


class NativeRecordFile:
    """Loads a TFRecord file and exposes its records as bytes."""

    def __init__(self, path: str, verify_crc: bool = False):
        lib = _load()
        self._lib = lib
        self._h = lib.ldm_tfrecord_open(path.encode(), int(verify_crc))
        if not self._h:
            raise IOError(f"failed to open/parse tfrecord: {path}")

    def __len__(self) -> int:
        return int(self._lib.ldm_tfrecord_num_records(self._h))

    def record(self, i: int) -> bytes:
        n = ctypes.c_size_t()
        ptr = self._lib.ldm_tfrecord_record(self._h, i, ctypes.byref(n))
        if not ptr:
            raise IndexError(i)
        return ctypes.string_at(ptr, n.value)

    def __iter__(self):
        for i in range(len(self)):
            yield self.record(i)

    def close(self):
        if self._h:
            self._lib.ldm_tfrecord_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def example_image_bytes(record: bytes, name: bytes = b"image") -> bytes | None:
    lib = _load()
    ptr = ctypes.POINTER(ctypes.c_uint8)()
    n = ctypes.c_size_t()
    rc = lib.ldm_example_bytes(
        record, len(record), name, ctypes.byref(ptr), ctypes.byref(n)
    )
    if rc < 0:
        return None
    return ctypes.string_at(ptr, n.value)


def example_caption(record: bytes, max_len: int = 77) -> np.ndarray | None:
    lib = _load()
    out = np.zeros(max_len, dtype=np.int64)
    rc = lib.ldm_example_int64s(
        record, len(record), b"caption",
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), max_len,
    )
    if rc < 0:
        return None
    return out


def scan_index(path: str) -> np.ndarray | None:
    """[N, 2] int64 (payload_offset, payload_length) via the C framing
    scanner (payloads fseek'd over, not read)."""
    lib = _load()
    ptr = ctypes.POINTER(ctypes.c_int64)()
    n = lib.ldm_tfrecord_scan(path.encode(), ctypes.byref(ptr))
    if n < 0:
        return None
    try:
        if n == 0:
            return np.zeros((0, 2), dtype=np.int64)
        return np.ctypeslib.as_array(ptr, shape=(n, 2)).copy()
    finally:
        lib.ldm_free(ptr)


def pread(path: str, offset: int, length: int) -> bytes | None:
    """Positioned single-record read (indexed pipeline's fetch path)."""
    lib = _load()
    out = (ctypes.c_uint8 * length)()
    got = lib.ldm_pread(path.encode(), offset, length, out)
    if got != length:
        return None
    return bytes(out)


def decode_and_process(
    jpeg: bytes, image_size: int, flip: bool = False
) -> np.ndarray | None:
    lib = _load()
    out = np.empty((image_size, image_size, 3), dtype=np.float32)
    rc = lib.ldm_decode_and_process(
        jpeg, len(jpeg), image_size, int(flip),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        return None
    return out
