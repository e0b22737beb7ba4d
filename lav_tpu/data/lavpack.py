"""ctypes bindings for the native lavstore (.lavpack) episode format.

The C++ store (native/lavstore.cpp) is the framework's replacement for the
reference's LMDB dependency: write-once episode packs, mmap'd zero-copy
reads, O(log n) key lookup.  `LavPackStore` plugs into
lav_tpu.data.store.Episode like any other byte store, and
`convert_episode` re-packs an existing episode (LMDB or synthetic) into
the native format.

The shared library is built on demand with the in-tree Makefile (g++ only;
no pybind11 needed — pure C ABI via ctypes).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "liblavstore.so"))

_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR)], check=True,
            capture_output=True,
        )
    lib = ctypes.CDLL(_LIB_PATH)
    lib.lavstore_open.restype = ctypes.c_void_p
    lib.lavstore_open.argtypes = [ctypes.c_char_p]
    lib.lavstore_get.restype = ctypes.c_int
    lib.lavstore_get.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_uint64),
    ]
    lib.lavstore_count.restype = ctypes.c_uint64
    lib.lavstore_count.argtypes = [ctypes.c_void_p]
    lib.lavstore_key_at.restype = ctypes.c_int
    lib.lavstore_key_at.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.POINTER(ctypes.c_char_p)
    ]
    lib.lavstore_close.argtypes = [ctypes.c_void_p]
    lib.lavwriter_open.restype = ctypes.c_void_p
    lib.lavwriter_open.argtypes = [ctypes.c_char_p]
    lib.lavwriter_put.restype = ctypes.c_int
    lib.lavwriter_put.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_uint64
    ]
    lib.lavwriter_finish.restype = ctypes.c_int
    lib.lavwriter_finish.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class LavPackStore:
    """Read-only mmap'd store with the byte-store get() interface."""

    def __init__(self, path: str):
        self._lib = _load_lib()
        self._h = self._lib.lavstore_open(path.encode())
        if not self._h:
            raise IOError(f"cannot open lavpack: {path}")

    def get(self, key: bytes) -> Optional[bytes]:
        data = ctypes.c_void_p()
        size = ctypes.c_uint64()
        rc = self._lib.lavstore_get(
            self._h, key, ctypes.byref(data), ctypes.byref(size)
        )
        if rc != 0:
            return None
        return ctypes.string_at(data, size.value)

    def keys(self):
        n = self._lib.lavstore_count(self._h)
        out = []
        key = ctypes.c_char_p()
        for i in range(n):
            self._lib.lavstore_key_at(self._h, i, ctypes.byref(key))
            out.append(key.value)
        return out

    def close(self):
        if self._h:
            self._lib.lavstore_close(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


class LavPackWriter:
    def __init__(self, path: str):
        self._lib = _load_lib()
        self._h = self._lib.lavwriter_open(path.encode())
        if not self._h:
            raise IOError(f"cannot create lavpack: {path}")

    def put(self, key: bytes, value: bytes):
        rc = self._lib.lavwriter_put(self._h, key, value, len(value))
        if rc != 0:
            raise IOError("lavpack write failed")

    def finish(self):
        rc = self._lib.lavwriter_finish(self._h)
        self._h = None
        if rc != 0:
            raise IOError("lavpack finalize failed")


def convert_episode(episode, out_path: str, keys=None):
    """Re-pack an Episode's store into .lavpack.  For DictStore episodes all
    keys are taken; for LMDB pass an explicit key list."""
    w = LavPackWriter(out_path)
    if keys is None:
        keys = sorted(episode.store._d.keys())  # DictStore
    for k in keys:
        v = episode.store.get(k)
        if v is not None:
            w.put(k, v)
    w.finish()
    return out_path
