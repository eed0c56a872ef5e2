"""Lazy cc -O3 -shared build + ctypes loader for the native helpers,
with a pure-Python fallback (table-driven crc32c) when no compiler exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

_SRC = os.path.join(os.path.dirname(__file__), "crc32c.c")
_LIB = None
_TRIED = False


def _build_lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    cache_dir = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "skyhdr",
    )
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, "libskyhdr_native.so")
    try:
        if (not os.path.exists(so_path)
                or os.path.getmtime(so_path) < os.path.getmtime(_SRC)):
            with tempfile.NamedTemporaryFile(
                suffix=".so", dir=cache_dir, delete=False
            ) as tmp:
                tmp_path = tmp.name
            subprocess.run(
                ["cc", "-O3", "-fPIC", "-shared", "-o", tmp_path, _SRC],
                check=True, capture_output=True,
            )
            os.replace(tmp_path, so_path)
        lib = ctypes.CDLL(so_path)
        lib.skyhdr_crc32c.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_uint32
        ]
        lib.skyhdr_crc32c.restype = ctypes.c_uint32
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


# Pure-Python fallback -------------------------------------------------------

_PY_TABLE = None


def _py_table():
    global _PY_TABLE
    if _PY_TABLE is None:
        poly = 0x82F63B78
        tbl = []
        for i in range(256):
            crc = i
            for _ in range(8):
                crc = (crc >> 1) ^ (poly if crc & 1 else 0)
            tbl.append(crc)
        _PY_TABLE = tbl
    return _PY_TABLE


def _crc32c_py(data: bytes, seed: int = 0) -> int:
    tbl = _py_table()
    crc = ~seed & 0xFFFFFFFF
    for byte in data:
        crc = (crc >> 8) ^ tbl[(crc ^ byte) & 0xFF]
    return ~crc & 0xFFFFFFFF


def has_native() -> bool:
    return _build_lib() is not None


def crc32c(data: bytes, seed: int = 0) -> int:
    lib = _build_lib()
    if lib is not None:
        return lib.skyhdr_crc32c(data, len(data), seed)
    return _crc32c_py(data, seed)


def masked_crc32c(data: bytes) -> int:
    """TFRecord's masked CRC: rot(crc, 15) + 0xa282ead8 (mod 2^32)."""
    crc = crc32c(data)
    return ((crc >> 15) | ((crc << 17) & 0xFFFFFFFF)) + 0xA282EAD8 & 0xFFFFFFFF
