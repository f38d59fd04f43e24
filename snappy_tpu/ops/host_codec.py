"""Host codec: ctypes binding to the native C block codec, with thread fan-out.

This is the framework's CPU runtime path (the reference's equivalent surface
is its compiled Nim/C core).  ctypes calls release the GIL, so independent
64 KiB block spans compress/decompress on all host cores in parallel —
block data-parallelism on the host mirrors the device mesh strategy
(SURVEY §2.3 item 1).

Falls back to None (callers route to the device or oracle path) when no C
toolchain is available.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
import threading
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

from ..formats import constants as C
from ..formats import varint

_scratch = threading.local()


def _scratch_buf(size: int) -> np.ndarray:
    """Grow-only per-thread scratch buffer (avoids page-fault churn from
    fresh allocations in the hot encode path)."""
    buf = getattr(_scratch, "buf", None)
    if buf is None or buf.size < size:
        buf = np.empty((max(size, 1 << 20),), dtype=np.uint8)
        _scratch.buf = buf
    return buf

_SRC = Path(__file__).parent / "native" / "snappy_codec.c"
_SRC_CRC = Path(__file__).parent / "native" / "crc32c.c"

_lib: Optional[ctypes.CDLL] = None
_build_failed = False
_pool: Optional[ThreadPoolExecutor] = None


def _cache_dir() -> Path:
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    d = Path(base) / "snappy_tpu"
    d.mkdir(parents=True, exist_ok=True)
    return d


def sanitize_flags() -> List[str]:
    """ASan+UBSan build flags when SNAPPY_TPU_SANITIZE is set.

    Parity with the reference, which compiles every Linux test build with
    UBSan (/root/reference/snappy.nimble:21-28); we add ASan on top because
    the fast-region decoder and 16-byte burst copies are exactly the code
    paths where an out-of-bounds write would otherwise go unnoticed.  Run
    the suites via tools/sanitize_tests.sh (ctypes-loaded ASan needs
    LD_PRELOAD of libasan before the interpreter starts).
    """
    if not os.environ.get("SNAPPY_TPU_SANITIZE"):
        return []
    return ["-fsanitize=address,undefined", "-fno-sanitize-recover=all", "-g"]


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    if _build_failed:
        return None
    try:
        san = sanitize_flags()
        extra = os.environ.get("SNAPPY_TPU_CFLAGS", "").split()
        src = _SRC.read_bytes() + _SRC_CRC.read_bytes()
        tag = hashlib.sha256(src + repr(san + extra).encode()).hexdigest()[:16]
        suffix = "_san" if san else ""
        so_path = _cache_dir() / f"snappy_codec_{tag}{suffix}.so"
        if not so_path.exists():
            cc = os.environ.get("CC", "cc")
            with tempfile.TemporaryDirectory() as td:
                tmp_so = Path(td) / "lib.so"
                subprocess.run(
                    [
                        cc,
                        "-O3",
                        "-march=native",
                        "-shared",
                        "-fPIC",
                        *san,
                        *extra,
                        str(_SRC),
                        str(_SRC_CRC),
                        "-o",
                        str(tmp_so),
                    ],
                    check=True,
                    capture_output=True,
                )
                os.replace(tmp_so, so_path)
        lib = ctypes.CDLL(str(so_path))
        lib.stpu_encode_span.restype = ctypes.c_size_t
        lib.stpu_encode_span.argtypes = [
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_void_p,
        ]
        lib.stpu_encode_span_level.restype = ctypes.c_size_t
        lib.stpu_encode_span_level.argtypes = [
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_void_p,
            ctypes.c_int,
        ]
        lib.stpu_encode_framed_slab_level.restype = ctypes.c_size_t
        lib.stpu_encode_framed_slab_level.argtypes = [
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_size_t,
            ctypes.c_void_p,
            ctypes.c_int,
        ]
        lib.stpu_decode_tags.restype = ctypes.c_int
        lib.stpu_decode_tags.argtypes = [
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_size_t),
        ]
        lib.stpu_encode_framed_slab.restype = ctypes.c_size_t
        lib.stpu_encode_framed_slab.argtypes = [
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_size_t,
            ctypes.c_void_p,
        ]
        lib.stpu_decode_framed_slab.restype = ctypes.c_int
        lib.stpu_decode_framed_slab.argtypes = [
            ctypes.c_void_p,  # stream
            ctypes.c_void_p,  # kinds u8
            ctypes.c_void_p,  # src_off i64
            ctypes.c_void_p,  # src_len i64
            ctypes.c_void_p,  # declared i64
            ctypes.c_void_p,  # out_off i64
            ctypes.c_void_p,  # stored_crc u32
            ctypes.c_int,
            ctypes.c_void_p,  # out
            ctypes.c_int,
        ]
        lib.stpu_framed_count.restype = ctypes.c_long
        lib.stpu_framed_count.argtypes = [
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_size_t,
        ]
        lib.stpu_framed_walk.restype = ctypes.c_long
        lib.stpu_framed_walk.argtypes = [
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_size_t,
            ctypes.c_uint64,
            ctypes.c_int,
            ctypes.c_void_p,  # kinds u8
            ctypes.c_void_p,  # src_off i64
            ctypes.c_void_p,  # src_len i64
            ctypes.c_void_p,  # declared i64
            ctypes.c_void_p,  # out_off i64
            ctypes.c_void_p,  # stored_crc u32
            ctypes.c_long,
            ctypes.c_void_p,  # status int*
            ctypes.c_void_p,  # read_end i64*
            ctypes.c_void_p,  # total_out i64*
        ]
        lib.stpu_raw_scan_blocks.restype = ctypes.c_long
        lib.stpu_raw_scan_blocks.argtypes = [
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_size_t,
            ctypes.c_void_p,  # in_offs i64
            ctypes.c_long,
        ]
        lib.stpu_scan_span_index.restype = None
        lib.stpu_scan_span_index.argtypes = [
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_void_p,  # pos u32
            ctypes.c_void_p,  # cum u32
            ctypes.c_long,
            ctypes.c_void_p,  # n_rec long
            ctypes.c_void_p,  # exit_pos i64
            ctypes.c_void_p,  # exit_cum i64
            ctypes.c_void_p,  # err int
        ]
        lib.stpu_raw_scan_stitch.restype = ctypes.c_long
        lib.stpu_raw_scan_stitch.argtypes = [
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_size_t,
            ctypes.c_long,
            ctypes.c_void_p,  # span_lo i64
            ctypes.c_void_p,  # pos u32
            ctypes.c_void_p,  # cum u32
            ctypes.c_void_p,  # rec_off i64
            ctypes.c_void_p,  # n_rec i64
            ctypes.c_void_p,  # exit_pos i64
            ctypes.c_void_p,  # exit_cum i64
            ctypes.c_void_p,  # errs i32
            ctypes.c_void_p,  # in_offs i64
            ctypes.c_long,
        ]
        lib.stpu_decode_raw_segments.restype = ctypes.c_int
        lib.stpu_decode_raw_segments.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,  # in_offs i64
            ctypes.c_long,
            ctypes.c_long,
            ctypes.c_void_p,  # out
            ctypes.c_size_t,
        ]
        lib.stpu_scan_frames.restype = ctypes.c_long
        lib.stpu_scan_frames.argtypes = [
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_size_t,
            ctypes.c_void_p,  # records i64 [cap, 4]
            ctypes.c_size_t,
        ]
        return lib
    except Exception:
        _build_failed = True
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None and not _build_failed:
        _lib = _build()
    return _lib


def available() -> bool:
    return get_lib() is not None


def _get_pool() -> ThreadPoolExecutor:
    global _pool
    if _pool is None:
        _pool = ThreadPoolExecutor(max_workers=min(32, os.cpu_count() or 4))
    return _pool


# Span size per task: 32 blocks = 2 MiB (measured best on 4 cores;
# smaller spans lose to per-task overhead, larger ones to tail imbalance).
_SPAN_BLOCKS = 32
_SPAN = _SPAN_BLOCKS * C.MAX_BLOCK_LEN


def raw_compress(data: bytes, level: int = 1) -> Optional[bytes]:
    """Raw-format compress on host cores (varint + block tag streams).

    ``level`` 1 = reference-parity greedy (fastest); 2 = two-way candidate
    buckets, ~0.5-2% denser at ~10-15% lower throughput."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(data)
    if n > C.MAX_UNCOMPRESSED_LEN:
        return None
    header = varint.encode_uint32(n)
    if n == 0:
        return header
    buf = np.frombuffer(data, dtype=np.uint8)
    spans = [(s, min(n, s + _SPAN)) for s in range(0, n, _SPAN)]

    def work(span: Tuple[int, int]) -> bytes:
        lo, hi = span
        m = hi - lo
        cap = C.max_compressed_len(C.MAX_BLOCK_LEN) * (
            (m + C.MAX_BLOCK_LEN - 1) // C.MAX_BLOCK_LEN
        )
        out = _scratch_buf(cap)
        written = lib.stpu_encode_span_level(
            buf[lo:hi].ctypes.data, m, out.ctypes.data, level
        )
        return out[:written].tobytes()

    if len(spans) == 1:
        parts = [work(spans[0])]
    else:
        parts = list(_get_pool().map(work, spans))
    return header + b"".join(parts)


def decode_tags(body, out_len: int) -> Tuple[Optional[bytes], int]:
    """Decode one raw tag stream; returns (bytes or None, written)."""
    lib = get_lib()
    assert lib is not None
    src = np.frombuffer(bytes(body), dtype=np.uint8)
    out = np.empty((out_len,), dtype=np.uint8)
    written = ctypes.c_size_t(0)
    rc = lib.stpu_decode_tags(
        src.ctypes.data if len(src) else None,
        len(src),
        out.ctypes.data if out_len else None,
        out_len,
        ctypes.byref(written),
    )
    if rc != 0:
        return None, 0
    return out[: written.value].tobytes(), written.value


def decode_tags_into(body: bytes, out_len: int, out_arr: np.ndarray) -> bool:
    """Decode one raw tag stream directly into a caller numpy buffer.

    Returns True iff the stream is valid and produced exactly ``out_len``
    bytes (the raw-format written==declared rule, snappy.nim:107-108).
    """
    lib = get_lib()
    assert lib is not None and out_arr.dtype == np.uint8
    assert out_arr.size >= out_len
    src = np.frombuffer(body, dtype=np.uint8)
    written = ctypes.c_size_t(0)
    rc = lib.stpu_decode_tags(
        src.ctypes.data if len(src) else None,
        len(src),
        out_arr.ctypes.data if out_len else None,
        out_len,
        ctypes.byref(written),
    )
    return rc == 0 and written.value == out_len


# Parallel raw decode pays only when the boundary scan itself runs
# parallel (the sequential scan is ~70% of a decode, capping split-phase
# speedup below 1x once pool overhead is added — measured crossover sweep
# in ROUND_NOTES r3).  Both thresholds are on the compressed body size.
_PAR_SCAN_MIN = 4 << 20  # parallel (speculative) scan pays above ~4 MB body
_PAR_DECODE_MIN = _PAR_SCAN_MIN
_SCAN_SPAN_MAX = 32 << 20  # keep speculative per-span output sums in uint32


def _scan_blocks(src: np.ndarray, declared: int, in_offs: np.ndarray,
                 cap: int, n_workers: int) -> int:
    """Locate 64 KiB output-block boundaries of a raw tag stream (parallel
    speculative scan for large bodies, one sequential pass otherwise).
    Returns the segment count, or <0 (see stpu_raw_scan_blocks)."""
    lib = get_lib()
    n = int(src.size)
    if n < _PAR_SCAN_MIN or n_workers < 2:
        return lib.stpu_raw_scan_blocks(
            src.ctypes.data, n, declared, in_offs.ctypes.data, cap
        )
    nspans = max(n_workers, -(-n // _SCAN_SPAN_MAX))
    span_lo = np.array([n * k // nspans for k in range(nspans + 1)], np.int64)
    # Strided index capacity is a hard bound: ops are >= 2 input bytes and
    # every SCAN_STRIDE-th op is recorded (stride 8 in the C).
    caps = [(int(span_lo[k + 1] - span_lo[k]) // 16) + 2 for k in range(nspans)]
    rec_off = np.zeros((nspans + 1,), np.int64)
    np.cumsum(caps, out=rec_off[1:])
    pos = np.empty((int(rec_off[-1]),), np.uint32)
    cum = np.empty((int(rec_off[-1]),), np.uint32)
    n_rec = np.zeros((nspans,), np.int64)
    exit_pos = np.zeros((nspans,), np.int64)
    exit_cum = np.zeros((nspans,), np.int64)
    errs = np.zeros((nspans,), np.int32)

    def index_span(k: int) -> None:
        lib.stpu_scan_span_index(
            src.ctypes.data,
            n,
            int(span_lo[k]),
            int(span_lo[k + 1]),
            pos.ctypes.data + 4 * int(rec_off[k]),
            cum.ctypes.data + 4 * int(rec_off[k]),
            caps[k],
            n_rec.ctypes.data + 8 * k,
            exit_pos.ctypes.data + 8 * k,
            exit_cum.ctypes.data + 8 * k,
            errs.ctypes.data + 4 * k,
        )

    list(_get_pool().map(index_span, range(nspans)))
    return lib.stpu_raw_scan_stitch(
        src.ctypes.data,
        n,
        declared,
        nspans,
        span_lo.ctypes.data,
        pos.ctypes.data,
        cum.ctypes.data,
        rec_off.ctypes.data,
        n_rec.ctypes.data,
        exit_pos.ctypes.data,
        exit_cum.ctypes.data,
        errs.ctypes.data,
        in_offs.ctypes.data,
        cap,
    )


def scan_raw_blocks(body: bytes, declared: int) -> Optional[np.ndarray]:
    """Locate the 64 KiB output-block boundaries of a raw tag stream.

    Returns int64 ``in_offs`` with nseg+1 entries (in_offs[k] = body
    offset of output byte k*65536, in_offs[nseg] = len(body)), or None
    when the stream is malformed, not block-parallel-splittable (an op
    straddles a boundary — stpu_raw_scan_blocks returns -2), or the
    native library is unavailable.  Block-based encoders (ours, the
    reference, google/snappy) always split this way; the device batch
    path uses it to decode large raw streams as independent 64 KiB
    chunks (the copy-reach half is proven by the per-chunk decoder's
    offset>written check)."""
    lib = get_lib()
    if lib is None or declared <= 0:
        return None
    src = np.frombuffer(body, dtype=np.uint8)
    cap = declared // C.MAX_BLOCK_LEN + 2
    in_offs = np.empty((cap,), dtype=np.int64)
    nseg = _scan_blocks(
        src, declared, in_offs, cap, min(32, os.cpu_count() or 1)
    )
    if nseg < 1:
        return None
    return in_offs[: nseg + 1]


def decode_raw_body_into(body: bytes, declared: int, out_arr: np.ndarray) -> bool:
    """Decode one raw tag stream into ``out_arr`` (block-parallel when the
    stream proves block-parallel-safe, else sequential).

    Returns True iff the stream is valid and produced exactly ``declared``
    bytes.  The parallel path is an optimization only: any scan or segment
    failure falls back to the sequential decoder, which is authoritative
    for both bytes and error verdicts.
    """
    lib = get_lib()
    assert lib is not None and out_arr.dtype == np.uint8
    src = np.frombuffer(body, dtype=np.uint8)
    n_workers = min(32, os.cpu_count() or 1)
    if src.size >= _PAR_DECODE_MIN and n_workers > 1:
        cap = declared // C.MAX_BLOCK_LEN + 2
        in_offs = np.empty((cap,), dtype=np.int64)
        nseg = _scan_blocks(src, declared, in_offs, cap, n_workers)
        if nseg >= 2:
            out_ptr = out_arr.ctypes.data
            offs_ptr = in_offs.ctypes.data
            slab = max(1, (nseg + n_workers * 4 - 1) // (n_workers * 4))

            def work(lo: int) -> int:
                return lib.stpu_decode_raw_segments(
                    src.ctypes.data,
                    offs_ptr,
                    lo,
                    min(nseg, lo + slab),
                    out_ptr,
                    declared,
                )

            rcs = list(_get_pool().map(work, range(0, nseg, slab)))
            if all(rc == 0 for rc in rcs):
                return True
            # A segment failed (e.g. a copy legally reaching across a
            # 64 KiB boundary, which no block encoder emits but the format
            # allows): the sequential pass below is authoritative.
    return decode_tags_into(body, declared, out_arr)


def raw_uncompress(data: bytes, max_size: int) -> Tuple[Optional[bytes], str]:
    """Raw-format uncompress on the host (validation parity with the device
    path).

    Large streams decode block-parallel: a branchless boundary scan proves
    the stream's 64 KiB output blocks are independently decodable (true for
    every block-based encoder: ours, the reference, google/snappy), then
    the blocks fan out over host cores.  Anything the scan can't prove
    falls back to the sequential decoder.
    """
    lib = get_lib()
    if lib is None:
        return None, "invalid"
    # Sizing accepts uint64 varints; decoding enforces the 5-byte uint32
    # rule (snappy.nim:92) so host/device accept identically.
    declared64, _ = varint.decode_uint64(data)
    if declared64 is None or declared64 > C.MAX_UNCOMPRESSED_LEN:
        return None, "invalid"
    if declared64 > max_size:
        return None, "too_large"
    declared, read = varint.decode_uint32(data)
    if declared is None:
        return None, "invalid"
    body_b = data[read:]
    if declared == 0:
        return (b"", "ok") if len(body_b) == 0 else (None, "invalid")
    out = np.empty((int(declared),), dtype=np.uint8)
    if not decode_raw_body_into(body_b, int(declared), out):
        return None, "invalid"
    return out.tobytes(), "ok"


def framed_compress(
    data: bytes, with_header: bool = True, level: int = 1
) -> Optional[bytes]:
    """Framed-format compress on host cores: per-64 KiB frame, masked CRC +
    compressed payload if it saves >= 1/8, else verbatim (the same contract
    as the device pipeline; encoder.nim:385-426).

    The whole per-frame loop (CRC + block compression + chunk assembly) runs
    in C per slab of frames; Python only fans slabs out over threads and
    concatenates the results."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(data)
    head = C.FRAMING_HEADER if with_header else b""
    if n == 0:
        return head
    buf = np.frombuffer(data, dtype=np.uint8)
    spans = [(s, min(n, s + _SPAN)) for s in range(0, n, _SPAN)]
    # Worst case per frame: 8 framing bytes + verbatim payload, except a
    # partially-compressible frame can briefly need max_compressed_len.
    per_frame_cap = 8 + C.MAX_UNCOMPRESSED_FRAME_DATA_LEN

    def work(span: Tuple[int, int]) -> bytes:
        lo, hi = span
        frames = (hi - lo + C.MAX_BLOCK_LEN - 1) // C.MAX_BLOCK_LEN
        out = _scratch_buf(frames * per_frame_cap)
        written = lib.stpu_encode_framed_slab_level(
            buf.ctypes.data, lo, hi, out.ctypes.data, level
        )
        return out[:written].tobytes()

    if len(spans) == 1:
        return head + work(spans[0])
    return head + b"".join(_get_pool().map(work, spans))


_arena = threading.local()


def _arena_buf(size: int) -> np.ndarray:
    """Payload-scale staging arena: grows to fit, shrinks again when a
    request is under a quarter of the retained size (so one 1 GiB call
    doesn't pin 1 GiB for the process lifetime)."""
    buf = getattr(_arena, "buf", None)
    if buf is None or buf.size < size or buf.size > 4 * size:
        buf = np.empty((size,), dtype=np.uint8)
        _arena.buf = buf
    return buf


def framed_compress_into(
    data: bytes, out_arr: np.ndarray, with_header: bool = True, level: int = 1
):
    """Framed compress directly into a caller buffer; returns the total
    written length, or None when the native library is unavailable.

    Slabs compress in parallel into a staging arena at fixed worst-case
    offsets, then move to their exact final offsets with parallel memcpy
    (ctypes.memmove releases the GIL) — no per-call allocations beyond the
    grow-only arena, no join."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(data)
    header = C.FRAMING_HEADER if with_header else b""
    if out_arr.size < C.max_compressed_len_framed(n):
        return None
    pos = 0
    if header:
        out_arr[: len(header)] = np.frombuffer(header, np.uint8)
        pos = len(header)
    if n == 0:
        return pos
    buf = np.frombuffer(data, dtype=np.uint8)
    spans = [(s, min(n, s + _SPAN)) for s in range(0, n, _SPAN)]
    per_frame_cap = 8 + C.MAX_UNCOMPRESSED_FRAME_DATA_LEN
    span_cap = _SPAN_BLOCKS * per_frame_cap
    arena = _arena_buf(span_cap * len(spans))

    def work(k: int) -> int:
        lo, hi = spans[k]
        return lib.stpu_encode_framed_slab_level(
            buf.ctypes.data, lo, hi, arena.ctypes.data + k * span_cap, level
        )

    if len(spans) == 1:
        lens = [work(0)]
    else:
        lens = list(_get_pool().map(work, range(len(spans))))

    offsets = [pos]
    for ln in lens:
        offsets.append(offsets[-1] + ln)
    total = offsets[-1]
    if total > out_arr.size:
        return None
    out_ptr = out_arr.ctypes.data
    arena_ptr = arena.ctypes.data

    def move(k: int) -> None:
        ctypes.memmove(out_ptr + offsets[k], arena_ptr + k * span_cap, lens[k])

    if len(spans) == 1:
        move(0)
    else:
        list(_get_pool().map(move, range(len(spans))))
    return total


def framed_uncompress_scanned(
    data: bytes,
    chunks,
    check_integrity: bool = True,
    out: Optional[np.ndarray] = None,
) -> Tuple[Optional[bytes], str]:
    """Decode a scanned framed stream with zero-copy assembly.

    One output buffer (caller-provided via ``out``, else freshly allocated)
    receives every chunk at its final offset; worker threads run whole slabs
    of chunks through the native decode+CRC loop — no per-chunk Python, no
    join, CRC fully parallel.  Semantics parity with the engine's device
    path (snappy.nim:199-265).

    Returns (payload_bytes, "ok") — or (b"", "ok") with the data left in
    ``out`` when the caller provided the buffer.
    """
    lib = get_lib()
    if lib is None:
        return None, "invalid"
    from . import crc32c_native
    from ..formats import constants as C_

    if not crc32c_native.using_native():
        return None, "invalid"

    buf = np.frombuffer(data, dtype=np.uint8)
    total = sum(ch.uncompressed_len for ch in chunks)
    caller_buffer = out is not None
    if caller_buffer:
        assert out.dtype == np.uint8 and out.size >= total
    else:
        out = np.empty((total,), dtype=np.uint8)
    out_ptr = out.ctypes.data

    # Build per-chunk jobs with absolute output offsets.
    jobs = []  # (kind, src_off, src_len, declared, out_off, stored_crc)
    pos = 0
    for ch in chunks:
        if ch.id == C_.CHUNK_COMPRESSED:
            if ch.data_len < 4:
                return None, "invalid"
            stored = int.from_bytes(data[ch.data_pos : ch.data_pos + 4], "little")
            payload_off = ch.data_pos + 4
            payload_len = ch.data_len - 4
            declared, read = varint.decode_uint32(
                buf[payload_off : payload_off + min(5, payload_len)]
            )
            if declared is None or declared > C_.MAX_UNCOMPRESSED_FRAME_DATA_LEN:
                return None, "invalid"
            jobs.append(
                (0, payload_off + read, payload_len - read, int(declared), pos, stored)
            )
            pos += int(declared)
        elif ch.id == C_.CHUNK_UNCOMPRESSED:
            if ch.data_len < 4:
                return None, "invalid"
            stored = int.from_bytes(data[ch.data_pos : ch.data_pos + 4], "little")
            jobs.append((1, ch.data_pos + 4, ch.data_len - 4, ch.data_len - 4, pos, stored))
            pos += ch.data_len - 4
        elif ch.id == C_.CHUNK_STREAM_HEADER or ch.id >= C_.CHUNK_RESERVED_SKIPPABLE_LO:
            continue
        else:
            return None, "unknown_chunk"
    assert pos == total

    nj = len(jobs)
    if nj == 0:
        return b"", "ok"
    kinds = np.empty((nj,), np.uint8)
    src_off = np.empty((nj,), np.int64)
    src_len = np.empty((nj,), np.int64)
    declared_a = np.empty((nj,), np.int64)
    out_off = np.empty((nj,), np.int64)
    stored = np.empty((nj,), np.uint32)
    for k, (kind, s_off, s_len, decl, o_off, st) in enumerate(jobs):
        kinds[k] = kind
        src_off[k] = s_off
        src_len[k] = s_len
        declared_a[k] = decl
        out_off[k] = o_off
        stored[k] = st

    reason = _run_decode_jobs(
        buf, kinds, src_off, src_len, declared_a, out_off, stored, nj,
        out, check_integrity,
    )
    if reason != "ok":
        return None, reason
    if caller_buffer:
        return b"", "ok"
    return out[:total].tobytes(), "ok"


def _run_decode_jobs(buf, kinds, src_off, src_len, declared_a, out_off,
                     stored, nj: int, out: np.ndarray,
                     check_integrity: bool) -> str:
    """Fan chunk-decode jobs out over threads through the native slab
    loop (decode + CRC, writes at final offsets).  Returns "ok" /
    "invalid" / "crc"."""
    lib = get_lib()
    src_ptr = buf.ctypes.data
    out_ptr = out.ctypes.data
    n_workers = min(32, os.cpu_count() or 4)
    slab = max(1, (nj + n_workers * 4 - 1) // (n_workers * 4))

    def work(lo: int) -> int:
        hi = min(nj, lo + slab)
        return lib.stpu_decode_framed_slab(
            src_ptr,
            kinds.ctypes.data + lo,
            src_off.ctypes.data + 8 * lo,
            src_len.ctypes.data + 8 * lo,
            declared_a.ctypes.data + 8 * lo,
            out_off.ctypes.data + 8 * lo,
            stored.ctypes.data + 4 * lo,
            hi - lo,
            out_ptr,
            1 if check_integrity else 0,
        )

    starts = list(range(0, nj, slab))
    if len(starts) <= 1:
        rcs = [work(s) for s in starts]
    else:
        rcs = list(_get_pool().map(work, starts))
    for rc in rcs:
        if rc == 1:
            return "invalid"
        if rc == 2:
            return "crc"
    return "ok"


_WALK_STATUS = {0: "ok", 1: "ok", 2: "invalid", 3: "crc", 4: "unknown_chunk"}


def framed_resume_decode(
    data: bytes,
    start: int,
    out: np.ndarray,
    budget: int,
    check_integrity: bool = True,
) -> Tuple[Optional[int], int, str]:
    """The reference's sequential resumable walk + decode, all native
    (snappy.nim:199-265): one C pass validates chunk headers and stops at
    the first chunk that does not fit ``budget``, then the taken prefix
    decodes into ``out`` at final offsets on all cores.

    Returns (read, written, reason).  ``read`` is None when the stream
    failed (reason in {"invalid", "crc", "unknown_chunk"}); error ORDER
    parity holds — a decode/CRC failure in the taken prefix wins over a
    later walk-time failure.
    """
    lib = get_lib()
    from . import crc32c_native

    if lib is None or not crc32c_native.using_native():
        return None, 0, "invalid"
    buf = np.frombuffer(data, dtype=np.uint8)
    cap = lib.stpu_framed_count(buf.ctypes.data, len(buf), start) + 1
    kinds = np.empty((cap,), np.uint8)
    src_off = np.empty((cap,), np.int64)
    src_len = np.empty((cap,), np.int64)
    declared_a = np.empty((cap,), np.int64)
    out_off = np.empty((cap,), np.int64)
    stored = np.empty((cap,), np.uint32)
    status = ctypes.c_int(0)
    read_end = ctypes.c_int64(0)
    total = ctypes.c_int64(0)
    nj = lib.stpu_framed_walk(
        buf.ctypes.data,
        len(buf),
        start,
        budget,
        1 if check_integrity else 0,
        kinds.ctypes.data,
        src_off.ctypes.data,
        src_len.ctypes.data,
        declared_a.ctypes.data,
        out_off.ctypes.data,
        stored.ctypes.data,
        cap,
        ctypes.byref(status),
        ctypes.byref(read_end),
        ctypes.byref(total),
    )
    if nj > 0:
        assert out.dtype == np.uint8 and out.size >= int(total.value)
        reason = _run_decode_jobs(
            buf, kinds, src_off, src_len, declared_a, out_off, stored, nj,
            out, check_integrity,
        )
        if reason != "ok":
            return None, 0, reason
    walk_reason = _WALK_STATUS[status.value]
    if walk_reason != "ok":
        return None, 0, walk_reason
    return int(read_end.value), int(total.value), "ok"


def scan_frames_records(data, start: int = 0) -> Optional[np.ndarray]:
    """Native framed-header scan (stpu_scan_frames): one C pass instead of
    a per-chunk Python walk.  Returns int64 [n, 4] records
    (id, header_pos, data_len, uncompressed_len), or None when the stream
    is malformed.  Raises RuntimeError when the native library is
    unavailable — callers gate on :func:`available`."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native codec library unavailable")
    buf = data if isinstance(data, np.ndarray) else np.frombuffer(
        data, dtype=np.uint8
    )
    n = len(buf)
    cap = max(64, (n - start) // 65540 * 2 + 64)
    while True:
        rec = np.empty((cap, 4), dtype=np.int64)
        r = lib.stpu_scan_frames(
            buf.ctypes.data, n, start, rec.ctypes.data, cap
        )
        if r == -2:
            cap = (n - start) // 4 + 2  # hard bound: every chunk takes >= 4 B
            continue
        if r < 0:
            return None
        return rec[:r]
