"""ctypes loader for the native C++ runtime library (``native/``).

The library is built on demand with g++ the first time it is requested
(one small translation unit; sub-second compile). Every consumer has a
pure-Python fallback, so the framework works without a toolchain — the
native path accelerates host-side I/O (GSD frame writing, bulk text
formatting of observable chunks).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libcavmd_native.so"))

_lib = None
_load_failed = False


def _build():
    src = os.path.join(_NATIVE_DIR, "cavmd_native.cc")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-std=c++17", "-shared",
             "-o", _LIB_PATH, src],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def load():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _load_failed = True
        return None

    lib.cavmd_gsd_open.restype = ctypes.c_void_p
    lib.cavmd_gsd_open.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_uint32,
    ]
    lib.cavmd_gsd_write_chunk.restype = ctypes.c_int
    lib.cavmd_gsd_write_chunk.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_void_p,
        ctypes.c_uint64, ctypes.c_uint32, ctypes.c_uint8, ctypes.c_uint64,
    ]
    lib.cavmd_gsd_end_frame.restype = ctypes.c_int
    lib.cavmd_gsd_end_frame.argtypes = [ctypes.c_void_p]
    lib.cavmd_gsd_nframes.restype = ctypes.c_uint64
    lib.cavmd_gsd_nframes.argtypes = [ctypes.c_void_p]
    lib.cavmd_gsd_close.restype = None
    lib.cavmd_gsd_close.argtypes = [ctypes.c_void_p]
    lib.cavmd_format_table.restype = ctypes.c_long
    lib.cavmd_format_table.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_long, ctypes.c_long,
        ctypes.c_int, ctypes.c_int, ctypes.c_char_p, ctypes.c_long,
    ]
    _lib = lib
    return _lib


class NativeGSDWriter:
    """Write-only GSD file backed by the C++ codec (same on-disk format as
    :class:`cavmd_tpu.io.gsd.GSDFile` in write mode)."""

    _TYPE_IDS = None

    def __init__(self, path, application="cavmd_tpu", schema="hoomd",
                 schema_version=(1, 4)):
        import numpy as np

        if NativeGSDWriter._TYPE_IDS is None:
            NativeGSDWriter._TYPE_IDS = {
                np.dtype(np.uint8): 1, np.dtype(np.uint16): 2,
                np.dtype(np.uint32): 3, np.dtype(np.uint64): 4,
                np.dtype(np.int8): 5, np.dtype(np.int16): 6,
                np.dtype(np.int32): 7, np.dtype(np.int64): 8,
                np.dtype(np.float32): 9, np.dtype(np.float64): 10,
            }
        lib = load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        ver = (schema_version[0] << 16) | schema_version[1]
        self._h = lib.cavmd_gsd_open(
            path.encode(), application.encode(), schema.encode(), ver
        )
        if not self._h:
            raise OSError(f"cannot open {path}")

    def write_chunk(self, name, data):
        import numpy as np

        data = np.ascontiguousarray(data)
        if data.ndim == 1:
            data = data[:, None]
        tid = self._TYPE_IDS[data.dtype]
        rc = self._lib.cavmd_gsd_write_chunk(
            self._h, name.encode(),
            data.ctypes.data_as(ctypes.c_void_p),
            data.shape[0], data.shape[1], tid, data.dtype.itemsize,
        )
        if rc != 0:
            raise OSError(f"native GSD write failed ({rc})")

    def begin_frame(self):
        pass

    def end_frame(self):
        self._lib.cavmd_gsd_end_frame(self._h)

    @property
    def nframes(self):
        return int(self._lib.cavmd_gsd_nframes(self._h))

    def close(self):
        if self._h:
            self._lib.cavmd_gsd_close(self._h)
            self._h = None


def format_table(data, decimals=6, int_col=1):
    """Fixed-format a 2-D float array as text via the native formatter.

    Returns the formatted string, or None when the native library is
    unavailable (callers fall back to Python formatting).
    """
    import numpy as np

    lib = load()
    if lib is None:
        return None
    arr = np.ascontiguousarray(data, dtype=np.float64)
    nrows, ncols = arr.shape
    cap = nrows * ncols * 32 + nrows + 64
    buf = ctypes.create_string_buffer(cap)
    n = lib.cavmd_format_table(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        nrows, ncols, decimals, int_col, buf, cap,
    )
    if n < 0:
        return None
    return buf.raw[:n].decode()
