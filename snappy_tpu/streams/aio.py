"""Asynchronous stream adapters (asyncio).

The reference generates sync and async variants of its streaming framed
decompressor from one body via the ``{.fsMultiSync.}`` macro
(/root/reference/snappy/faststreams.nim:89-147).  Python has no such macro;
these wrappers provide the async surface over asyncio StreamReader/Writer
pairs (device work still executes synchronously inside — JAX dispatch is
async by itself and releases the GIL during execution).
"""

from __future__ import annotations

import asyncio

from .. import engine
from ..formats import constants as C
from ..formats import framing, varint
from ..formats.errors import (
    MalformedSnappyData,
    UnexpectedEofError,
    raise_input_too_large,
)

_DEFAULT_BATCH = 128  # 8 MiB encode window (measured in streams/sync.py)


async def compress(
    reader: asyncio.StreamReader,
    src_len: int,
    writer: asyncio.StreamWriter,
    batch_frames: int = _DEFAULT_BATCH,
) -> int:
    """Async raw-format compress of exactly ``src_len`` bytes."""
    if src_len > C.MAX_UNCOMPRESSED_LEN:
        raise_input_too_large()
    header = varint.encode_uint32(src_len)
    writer.write(header)
    written = len(header)
    remaining = src_len
    while remaining > 0:
        want = min(remaining, C.MAX_BLOCK_LEN * batch_frames)
        try:
            buf = await reader.readexactly(want)
        except asyncio.IncompleteReadError as e:
            raise UnexpectedEofError("input stream ended early") from e
        enc = engine.raw_compress(buf)
        span_header, read = varint.decode_uint64(enc)
        assert span_header == len(buf)
        writer.write(enc[read:])
        await writer.drain()
        written += len(enc) - read
        remaining -= len(buf)
    return written


async def compress_framed(
    reader: asyncio.StreamReader,
    writer: asyncio.StreamWriter,
    batch_frames: int = _DEFAULT_BATCH,
) -> int:
    """Async framed-format compress of an arbitrary-length stream."""
    writer.write(C.FRAMING_HEADER)
    written = len(C.FRAMING_HEADER)
    while True:
        buf = await reader.read(C.MAX_UNCOMPRESSED_FRAME_DATA_LEN * batch_frames)
        if not buf:
            break
        enc = engine.framed_compress(buf, with_header=False)
        writer.write(enc)
        await writer.drain()
        written += len(enc)
    return written


async def uncompress_framed(
    reader: asyncio.StreamReader,
    writer: asyncio.StreamWriter,
    check_integrity: bool = True,
) -> int:
    """Async streaming framed decompress (the async twin the reference gets
    from fsMultiSync)."""
    try:
        magic = await reader.readexactly(len(C.FRAMING_HEADER))
    except asyncio.IncompleteReadError as e:
        raise UnexpectedEofError("stream shorter than the framing header") from e
    if not framing.is_snappy_framed_stream(magic):
        raise MalformedSnappyData("missing snappy framing header")

    written = 0
    pending = bytearray()
    while True:
        data = await reader.read(1 << 22)
        at_eof = not data
        pending.extend(data)
        pos = 0
        while len(pending) - pos >= 4:
            _, data_len = framing.decode_frame_header(pending[pos : pos + 4])
            if len(pending) - pos < 4 + data_len:
                break
            pos += 4 + data_len
        if pos:
            blob = bytes(pending[:pos])
            del pending[:pos]
            # all-native window decode on the host backend (the same fast
            # path as streams/sync.py — the C resumable walk validates,
            # decodes on all cores, and hands back a resume offset)
            from .. import config as _config
            from ..ops import host_codec as _hc

            if _config.resolve_backend() == "host" and _hc.available():
                import numpy as np

                # grow-only scratch shared with the sync adapter's pool:
                # back-to-back calls reuse warm pages instead of paying
                # ~8 MB of page faults per window
                from . import sync as _sync

                scratch = getattr(_sync._tls, "aio_out", None)
                if scratch is None:
                    scratch = np.empty((8 << 20,), dtype=np.uint8)
                    _sync._tls.aio_out = scratch
                out_buf = scratch
                roff = 0
                while roff < pos:
                    r, w, reason = _hc.framed_resume_decode(
                        blob, roff, out_buf, out_buf.size, check_integrity
                    )
                    if r is None or (r == roff and w == 0):
                        raise MalformedSnappyData(
                            f"framed decode failed ({reason})"
                        )
                    writer.write(bytes(memoryview(out_buf.data)[:w]))
                    await writer.drain()
                    written += w
                    roff = r
                if at_eof and not pending:
                    return written
                continue
            chunks = framing.scan_frames(blob)
            if chunks is None:
                reason = engine._scan_failure_reason(blob, 0)
                raise MalformedSnappyData(f"invalid framed chunk ({reason})")
            outs, reason = engine.framed_uncompress_chunks(
                blob, chunks, check_integrity
            )
            if outs is None:
                raise MalformedSnappyData(f"framed decode failed ({reason})")
            for o in outs:
                writer.write(o)
            await writer.drain()
            written += sum(len(o) for o in outs)
        if at_eof:
            if pending:
                raise UnexpectedEofError(
                    f"{len(pending)} trailing bytes are not a whole chunk"
                )
            return written
