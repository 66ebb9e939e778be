"""ctypes loader for the native host library (native/*.c -> libzstdtpu.so).

The native library carries host-side hot loops that are inherently byte-serial
(checksums, bitstream assembly for foreign-frame decode) — the TPU analog of
the reference keeping its runtime in C while compute lives in kernels.
Builds lazily with `make -C native` if the .so is missing and a compiler exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SO_PATH = os.path.join(_REPO_ROOT, "zstd_tpu", "_native", "libzstdtpu.so")

_lock = threading.Lock()
_native = None
_tried = False


class _Native:
    def __init__(self, lib: ctypes.CDLL):
        self._lib = lib
        lib.zt_xxh64.restype = ctypes.c_uint64
        lib.zt_xxh64.argtypes = [ctypes.c_char_p, ctypes.c_size_t, ctypes.c_uint64]

    def xxh64(self, data: bytes, seed: int = 0) -> int:
        return self._lib.zt_xxh64(data, len(data), seed)


def _try_build() -> bool:
    makefile = os.path.join(_REPO_ROOT, "native", "Makefile")
    if not os.path.exists(makefile):
        return False
    try:
        subprocess.run(
            ["make", "-C", os.path.join(_REPO_ROOT, "native")],
            check=True, capture_output=True, timeout=120,
        )
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


def get_native() -> _Native | None:
    global _native, _tried
    if _native is not None:
        return _native
    with _lock:
        if _native is not None or _tried:
            return _native
        _tried = True
        if not os.path.exists(_SO_PATH):
            if not _try_build():
                return None
        try:
            _native = _Native(ctypes.CDLL(_SO_PATH))
        except OSError:
            _native = None
        return _native
