"""ctypes binding to the real google/snappy — the third-party differential
oracle.

Role parity with the reference's C++ FFI shim
(/root/reference/tests/cpp_snappy.nim:6-45), which links libsnappy built from
the google/snappy submodule and imports the C API ``snappy_compress`` /
``snappy_uncompress`` / ``snappy_max_compressed_length`` /
``snappy_uncompressed_length``.  Here the same four functions come from the
system ``libsnappy.so.1`` (google/snappy 1.1.x) via ctypes.

This is a *test-only* component: nothing in the product path imports it.  It
exists so that an independently-implemented decoder/encoder validates ours in
both directions (the reference uses it in every round-trip test,
test_snappy.nim:44-69, and in fuzzing, fuzz_block_format.nim:8-33).

Raw block format only — google/snappy's C library does not implement the
framed format (neither does the reference's shim).
"""

from __future__ import annotations

import ctypes
import ctypes.util
from typing import Optional

_SNAPPY_OK = 0
_SNAPPY_INVALID_INPUT = 1
_SNAPPY_BUFFER_TOO_SMALL = 2

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    candidates = []
    found = ctypes.util.find_library("snappy")
    if found:
        candidates.append(found)
    candidates += ["libsnappy.so.1", "libsnappy.so"]
    for name in candidates:
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        try:
            lib.snappy_compress.restype = ctypes.c_int
            lib.snappy_compress.argtypes = [
                ctypes.c_char_p,
                ctypes.c_size_t,
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_size_t),
            ]
            lib.snappy_uncompress.restype = ctypes.c_int
            lib.snappy_uncompress.argtypes = [
                ctypes.c_char_p,
                ctypes.c_size_t,
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_size_t),
            ]
            lib.snappy_max_compressed_length.restype = ctypes.c_size_t
            lib.snappy_max_compressed_length.argtypes = [ctypes.c_size_t]
            lib.snappy_uncompressed_length.restype = ctypes.c_int
            lib.snappy_uncompressed_length.argtypes = [
                ctypes.c_char_p,
                ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_size_t),
            ]
        except AttributeError:
            continue
        _lib = lib
        break
    return _lib


def available() -> bool:
    """True when the real google/snappy shared library is loadable."""
    return _load() is not None


def max_compressed_length(n: int) -> int:
    lib = _load()
    assert lib is not None
    return int(lib.snappy_max_compressed_length(n))


def encode(data: bytes) -> bytes:
    """Compress with google/snappy (cpp_snappy.nim:13-27 analog)."""
    lib = _load()
    assert lib is not None
    out_len = ctypes.c_size_t(lib.snappy_max_compressed_length(len(data)))
    out = ctypes.create_string_buffer(out_len.value)
    rc = lib.snappy_compress(data, len(data), out, ctypes.byref(out_len))
    if rc != _SNAPPY_OK:
        raise RuntimeError(f"snappy_compress failed: {rc}")
    return out.raw[: out_len.value]


def uncompressed_length(data: bytes) -> Optional[int]:
    lib = _load()
    assert lib is not None
    n = ctypes.c_size_t(0)
    rc = lib.snappy_uncompressed_length(data, len(data), ctypes.byref(n))
    if rc != _SNAPPY_OK:
        return None
    return int(n.value)


def decode(data: bytes) -> Optional[bytes]:
    """Decompress with google/snappy; None when it rejects the input
    (cpp_snappy.nim:29-45 analog — the Nim shim returns an empty seq)."""
    lib = _load()
    assert lib is not None
    declared = uncompressed_length(data)
    if declared is None:
        return None
    out_len = ctypes.c_size_t(declared)
    out = ctypes.create_string_buffer(max(1, declared))
    rc = lib.snappy_uncompress(data, len(data), out, ctypes.byref(out_len))
    if rc != _SNAPPY_OK:
        return None
    return out.raw[: out_len.value]


def decode_into(data: bytes, out) -> Optional[int]:
    """Decompress with google/snappy into a caller-provided writable
    buffer (ctypes array / numpy array / writable memoryview); returns
    the written length or None.  The reused-buffer counterpart of
    ``decode`` for clock-for-clock benchmark controls — the reference's
    harness also decodes into preallocated buffers (benchmark.nim)."""
    lib = _load()
    assert lib is not None
    buf = (ctypes.c_char * len(out)).from_buffer(out)
    out_len = ctypes.c_size_t(len(out))
    rc = lib.snappy_uncompress(data, len(data), buf, ctypes.byref(out_len))
    if rc != _SNAPPY_OK:
        return None
    return out_len.value
