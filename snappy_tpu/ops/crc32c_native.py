"""Host-side CRC32C: ctypes binding to the native slicing-by-8 C kernel.

The shared object is built on demand with the system compiler and cached
under the user cache dir (the repo may be read-only at run time).  A pure
Python table fallback keeps the package functional without a toolchain —
the role split mirrors the reference, whose Nim core compiles crc32c.c
in-tree (/root/reference/snappy/codec.nim:66-79).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from pathlib import Path
from typing import Optional

_SRC = Path(__file__).parent / "native" / "crc32c.c"
_MASK_DELTA = 0xA282EAD8

_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _cache_dir() -> Path:
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    d = Path(base) / "snappy_tpu"
    d.mkdir(parents=True, exist_ok=True)
    return d


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    if _build_failed:
        return None
    try:
        from . import host_codec

        san = host_codec.sanitize_flags()
        src = _SRC.read_bytes()
        tag = hashlib.sha256(src + repr(san).encode()).hexdigest()[:16]
        suffix = "_san" if san else ""
        so_path = _cache_dir() / f"crc32c_{tag}{suffix}.so"
        if not so_path.exists():
            cc = os.environ.get("CC", "cc")
            with tempfile.TemporaryDirectory() as td:
                tmp_so = Path(td) / "crc32c.so"
                subprocess.run(
                    [cc, "-O3", "-march=native", "-shared", "-fPIC", *san, str(_SRC), "-o", str(tmp_so)],
                    check=True,
                    capture_output=True,
                )
                os.replace(tmp_so, so_path)  # atomic publish
        lib = ctypes.CDLL(str(so_path))
        lib.snappy_tpu_crc32c.restype = ctypes.c_uint32
        lib.snappy_tpu_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
        lib.snappy_tpu_masked_crc32c.restype = ctypes.c_uint32
        lib.snappy_tpu_masked_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
        return lib
    except Exception:
        _build_failed = True
        return None


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None and not _build_failed:
        _lib = _build()
    return _lib


# Pure-Python fallback --------------------------------------------------------

_py_table = None


def _get_py_table():
    global _py_table
    if _py_table is None:
        tbl = []
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ (0x82F63B78 if c & 1 else 0)
            tbl.append(c)
        _py_table = tbl
    return _py_table


def _crc32c_py(data: bytes) -> int:
    tbl = _get_py_table()
    c = 0xFFFF_FFFF
    for b in data:
        c = (c >> 8) ^ tbl[(c ^ b) & 0xFF]
    return c ^ 0xFFFF_FFFF


# Public API ------------------------------------------------------------------


def crc32c(data: bytes) -> int:
    """Standard CRC-32C (init ~0, final inversion), unmasked."""
    lib = _get_lib()
    if lib is not None:
        return lib.snappy_tpu_crc32c(bytes(data), len(data))
    return _crc32c_py(bytes(data))


def mask_crc(crc: int) -> int:
    """Snappy framing mask: rotr15 + 0xa282ead8 (framing_format.txt:39-58)."""
    return (((crc >> 15) | (crc << 17)) + _MASK_DELTA) & 0xFFFF_FFFF


def unmask_crc(masked: int) -> int:
    x = (masked - _MASK_DELTA) & 0xFFFF_FFFF
    return ((x >> 17) | (x << 15)) & 0xFFFF_FFFF


def masked_crc32c(data: bytes) -> int:
    """Masked CRC32C as stored in framed chunks (codec.nim:71-75)."""
    lib = _get_lib()
    if lib is not None:
        return lib.snappy_tpu_masked_crc32c(bytes(data), len(data))
    return mask_crc(_crc32c_py(bytes(data)))


def masked_crc32c_ptr(ptr: int, length: int) -> int:
    """Masked CRC32C over a raw pointer (zero-copy; for numpy buffers)."""
    lib = _get_lib()
    if lib is not None:
        return lib.snappy_tpu_masked_crc32c(
            ctypes.cast(ptr, ctypes.c_char_p), length
        )
    raise RuntimeError("native crc32c unavailable")


def using_native() -> bool:
    return _get_lib() is not None
