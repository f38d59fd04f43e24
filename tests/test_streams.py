"""Stream-adapter tests (mirrors reference faststreams/streams suites)."""

import asyncio
import io

import pytest

import snappy_tpu as s
from snappy_tpu.formats import constants as C
from snappy_tpu.formats.errors import (
    MalformedSnappyData,
    UnexpectedEofError,
)
from snappy_tpu.streams import aio, sync
from snappy_tpu.testing import corpus, oracle


def _payload(n=200_000):
    return b"".join(bytes([i & 0xFF]) * 997 for i in range(n // 997 + 1))[:n]


class TestSyncStreams:
    def test_raw_compress_stream(self):
        payload = _payload()
        dst = io.BytesIO()
        written = sync.compress(io.BytesIO(payload), len(payload), dst)
        enc = dst.getvalue()
        assert written == len(enc)
        assert s.decode(enc) == payload
        # identical bytes to the in-memory path (the reference asserts the
        # same equivalence across its three encode paths,
        # test_snappy.nim:44-69)
        assert enc == s.encode(payload)

    def test_raw_compress_truncated_source(self):
        payload = b"too short"
        with pytest.raises(UnexpectedEofError):
            sync.compress(io.BytesIO(payload), len(payload) + 5, io.BytesIO())

    def test_framed_roundtrip_stream(self):
        payload = _payload(300_000)
        dst = io.BytesIO()
        sync.compress_framed(io.BytesIO(payload), dst)
        enc = dst.getvalue()
        assert enc == s.encode_framed(payload)
        out = io.BytesIO()
        n = sync.uncompress_framed(io.BytesIO(enc), out)
        assert n == len(payload)
        assert out.getvalue() == payload

    def test_framed_uncompress_small_reads(self):
        """Feed the decompressor through a reader that returns tiny pieces."""

        class Dribble(io.RawIOBase):
            def __init__(self, data):
                self.data = data
                self.pos = 0

            def read(self, n=-1):
                if self.pos >= len(self.data):
                    return b""
                take = min(700, len(self.data) - self.pos)
                if n is not None and n >= 0:
                    take = min(take, n)
                out = self.data[self.pos : self.pos + take]
                self.pos += take
                return out

        payload = _payload(150_000)
        enc = s.encode_framed(payload)
        out = io.BytesIO()
        n = sync.uncompress_framed(Dribble(enc), out)
        assert n == len(payload) and out.getvalue() == payload

    def test_framed_uncompress_bad_magic(self):
        with pytest.raises(MalformedSnappyData):
            sync.uncompress_framed(io.BytesIO(b"not snappy framing!!"), io.BytesIO())

    def test_framed_uncompress_truncated(self):
        enc = s.encode_framed(_payload(50_000))
        with pytest.raises((UnexpectedEofError, MalformedSnappyData)):
            sync.uncompress_framed(io.BytesIO(enc[:-3]), io.BytesIO())

    def test_framed_uncompress_short_stream(self):
        with pytest.raises(UnexpectedEofError):
            sync.uncompress_framed(io.BytesIO(b"\xff\x06"), io.BytesIO())

    def test_bytes_conveniences(self):
        payload = _payload(80_000)
        assert s.decode(sync.compress_bytes(payload)) == payload
        enc = sync.compress_framed_bytes(payload)
        assert sync.uncompress_framed_bytes(enc) == payload

    def test_external_stream_decode(self, corpus_root):
        enc = corpus.read_stream("alice29.txt.sz-32k")
        plain = corpus.read_data("alice29.txt")
        if enc is None:
            pytest.skip("stream file missing")
        out = io.BytesIO()
        sync.uncompress_framed(io.BytesIO(enc), out)
        assert out.getvalue() == plain


def _run_async_pipe(feed: bytes, coro_factory):
    """Drive an aio stream coroutine with an in-memory reader/writer pair."""

    async def run():
        reader = asyncio.StreamReader()
        reader.feed_data(feed)
        reader.feed_eof()

        collected = bytearray()

        class SinkWriter:
            def write(self, data):
                collected.extend(data)

            async def drain(self):
                await asyncio.sleep(0)

        n = await coro_factory(reader, SinkWriter())
        return n, bytes(collected)

    return asyncio.run(run())


class TestAsyncStreams:
    def test_async_framed_roundtrip(self):
        payload = _payload(120_000)
        _, enc = _run_async_pipe(payload, aio.compress_framed)
        assert enc == s.encode_framed(payload)
        n, out = _run_async_pipe(enc, aio.uncompress_framed)
        assert n == len(payload) and out == payload

    def test_async_raw_compress(self):
        payload = _payload(90_000)
        _, enc = _run_async_pipe(
            payload, lambda r, w: aio.compress(r, len(payload), w)
        )
        assert s.decode(enc) == payload
        dec, err = oracle.uncompress(enc)
        assert err is None and dec == payload

    def test_async_bad_magic(self):
        with pytest.raises(MalformedSnappyData):
            _run_async_pipe(b"0123456789abcdef", aio.uncompress_framed)
