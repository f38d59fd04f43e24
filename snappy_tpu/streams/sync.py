"""Synchronous stream adapters over file-like objects.

Role parity with the reference's stream layer
(/root/reference/snappy/faststreams.nim, /root/reference/snappy/streams.nim):
chunked compression of an input stream into an output stream, streaming
framed decompression with bounded memory, and the exception-based error
model (exceptions.nim) — the codec core stays Result-based; only this layer
raises.

The raw format deliberately has no streaming *decompressor* here, matching
the reference's rationale: raw-format copies may reference the entire
decoded history, so decoding needs the full output window
(faststreams.nim:60-62, README.md:58).

Unlike the reference, which processes one 64 KiB block per iteration, these
adapters read many blocks per device round-trip so the batched kernels stay
utilized (`batch_frames` controls memory vs. throughput).
"""

from __future__ import annotations

import io
from typing import BinaryIO

from .. import engine
from ..formats import constants as C
from ..formats import framing, varint
from ..formats.errors import (
    MalformedSnappyData,
    UnexpectedEofError,
    raise_input_too_large,
)

_DEFAULT_BATCH = 64  # frames per device round-trip (4 MiB of payload)


def compress(
    src: BinaryIO,
    src_len: int,
    dst: BinaryIO,
    batch_frames: int = _DEFAULT_BATCH,
    level: int = 1,
) -> int:
    """Raw-format compress from ``src`` (exactly ``src_len`` bytes) to
    ``dst``; returns bytes written.

    The raw format needs the total length up front for its varint header —
    the reference asserts the same precondition (faststreams.nim:27).
    """
    if src_len > C.MAX_UNCOMPRESSED_LEN:
        raise_input_too_large()
    header = varint.encode_uint32(src_len)
    dst.write(header)
    written = len(header)
    remaining = src_len
    while remaining > 0:
        want = min(remaining, C.MAX_BLOCK_LEN * batch_frames)
        buf = src.read(want)
        if len(buf) != want:
            raise UnexpectedEofError(
                f"input stream ended {remaining - len(buf)} bytes early"
            )
        # Encode this span's blocks in one device batch; strip the varint
        # the engine prepends for its own span.
        enc = engine.raw_compress(buf, level=level)
        span_header, read = varint.decode_uint64(enc)
        assert span_header == len(buf)
        dst.write(enc[read:])
        written += len(enc) - read
        remaining -= len(buf)
    return written


def compress_framed(
    src: BinaryIO,
    dst: BinaryIO,
    batch_frames: int = _DEFAULT_BATCH,
    level: int = 1,
) -> int:
    """Framed-format compress of an arbitrary-length stream
    (faststreams.nim:64-83); returns bytes written."""
    dst.write(C.FRAMING_HEADER)
    written = len(C.FRAMING_HEADER)
    while True:
        buf = src.read(C.MAX_UNCOMPRESSED_FRAME_DATA_LEN * batch_frames)
        if not buf:
            break
        enc = engine.framed_compress(buf, with_header=False, level=level)
        dst.write(enc)
        written += len(enc)
    return written


def uncompress_framed(
    src: BinaryIO, dst: BinaryIO, check_integrity: bool = True
) -> int:
    """Streaming framed decompress (faststreams.nim:89-147); returns bytes
    written.  Raises :class:`MalformedSnappyData` / :class:`UnexpectedEofError`
    on malformed input; memory stays bounded by the chunk batch."""
    magic = src.read(len(C.FRAMING_HEADER))
    if len(magic) < len(C.FRAMING_HEADER):
        raise UnexpectedEofError("stream shorter than the framing header")
    if not framing.is_snappy_framed_stream(magic):
        raise MalformedSnappyData("missing snappy framing header")

    written = 0
    pending = bytearray()
    while True:
        data = src.read(1 << 22)
        at_eof = not data
        pending.extend(data)
        # Find the longest prefix of whole chunks in `pending`.
        pos = 0
        while len(pending) - pos >= 4:
            _, data_len = framing.decode_frame_header(pending[pos : pos + 4])
            if len(pending) - pos < 4 + data_len:
                break
            pos += 4 + data_len
        if pos:
            chunk_blob = bytes(pending[:pos])
            del pending[:pos]
            chunks = framing.scan_frames(chunk_blob)
            if chunks is None:
                reason = engine._scan_failure_reason(chunk_blob, 0)
                raise MalformedSnappyData(f"invalid framed chunk ({reason})")
            outs, reason = engine.framed_uncompress_chunks(
                chunk_blob, chunks, check_integrity
            )
            if outs is None:
                raise MalformedSnappyData(f"framed decode failed ({reason})")
            for o in outs:
                dst.write(o)
                written += len(o)
        if at_eof:
            if pending:
                raise UnexpectedEofError(
                    f"{len(pending)} trailing bytes are not a whole chunk"
                )
            return written


# Convenience openArray-style overloads (faststreams.nim:56-58, 85-87)


def compress_bytes(data: bytes) -> bytes:
    out = io.BytesIO()
    compress(io.BytesIO(data), len(data), out)
    return out.getvalue()


def compress_framed_bytes(data: bytes) -> bytes:
    out = io.BytesIO()
    compress_framed(io.BytesIO(data), out)
    return out.getvalue()


def uncompress_framed_bytes(data: bytes, check_integrity: bool = True) -> bytes:
    out = io.BytesIO()
    uncompress_framed(io.BytesIO(data), out, check_integrity)
    return out.getvalue()
