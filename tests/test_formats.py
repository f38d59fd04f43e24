"""Spec-layer tests: varint, length math, frame headers, stream scanners.

Mirrors the boundary-value strategy of the reference test suite (SURVEY §4.3):
block/frame limit straddling, empty input, header-only streams.
"""

import pytest

from snappy_tpu.formats import constants as C
from snappy_tpu.formats import framing, varint


class TestVarint:
    @pytest.mark.parametrize(
        "value,encoded",
        [
            (0, b"\x00"),
            (1, b"\x01"),
            (127, b"\x7f"),
            (128, b"\x80\x01"),
            (300, b"\xac\x02"),
            (65536, b"\x80\x80\x04"),
            (0xFFFFFFFF, b"\xff\xff\xff\xff\x0f"),
        ],
    )
    def test_roundtrip(self, value, encoded):
        assert varint.encode_uint32(value) == encoded
        got, read = varint.decode_uint64(encoded)
        assert (got, read) == (value, len(encoded))

    def test_trailing_bytes_ignored(self):
        got, read = varint.decode_uint64(b"\xac\x02\xff\xff")
        assert (got, read) == (300, 2)

    def test_empty(self):
        assert varint.decode_uint64(b"") == (None, 0)

    def test_truncated(self):
        assert varint.decode_uint64(b"\x80") == (None, 0)
        assert varint.decode_uint64(b"\xff\xff") == (None, 0)

    def test_u64_overflow(self):
        # 10 bytes all-continuation + high bits set: overflows uint64
        assert varint.decode_uint64(b"\xff" * 9 + b"\x7f") == (None, 0)
        # 11-byte varint: too long
        assert varint.decode_uint64(b"\x80" * 10 + b"\x01") == (None, 0)

    def test_u64_max_ok(self):
        data = b"\xff" * 9 + b"\x01"
        got, read = varint.decode_uint64(data)
        assert got == 2**64 - 1 and read == 10

    def test_out_of_range_encode(self):
        with pytest.raises(ValueError):
            varint.encode_uint32(2**32)
        with pytest.raises(ValueError):
            varint.encode_uint32(-1)


class TestLengthMath:
    def test_max_compressed_len(self):
        # Contract: 32 + n + n/6 (codec.nim:92-127)
        assert C.max_compressed_len(0) == 32
        assert C.max_compressed_len(6) == 32 + 6 + 1
        assert C.max_compressed_len(65536) == 32 + 65536 + 10922
        assert C.max_compressed_len(C.MAX_UNCOMPRESSED_LEN + 1) == 0

    def test_block_consts(self):
        assert C.MAX_COMPRESSED_BLOCK_LEN == C.max_compressed_len(C.MAX_BLOCK_LEN)
        assert C.MAX_COMPRESSED_FRAME_DATA_LEN == C.max_compressed_len(
            C.MAX_UNCOMPRESSED_FRAME_DATA_LEN
        )

    def test_max_compressed_len_framed(self):
        assert C.max_compressed_len_framed(0) == len(C.FRAMING_HEADER)
        one = C.max_compressed_len_framed(1)
        assert one == len(C.FRAMING_HEADER) + C.max_compressed_len(65536) + 8
        # Two frames: first capped at verbatim+8, last gets scratch budget.
        two = C.max_compressed_len_framed(65537)
        assert two == len(C.FRAMING_HEADER) + (65536 + 8) + C.max_compressed_len(65536) + 8


class TestFrameHeaders:
    def test_roundtrip(self):
        hdr = framing.encode_frame_header(C.CHUNK_COMPRESSED, 1234)
        assert framing.decode_frame_header(hdr) == (C.CHUNK_COMPRESSED, 1234)
        hdr = framing.encode_frame_header(0xFE, (1 << 24) - 1)
        assert framing.decode_frame_header(hdr) == (0xFE, (1 << 24) - 1)

    def test_stream_magic(self):
        cid, length = framing.decode_frame_header(C.FRAMING_HEADER)
        assert cid == C.CHUNK_STREAM_HEADER and length == 6
        assert C.FRAMING_HEADER[4:] == b"sNaPpY"
        assert framing.is_snappy_framed_stream(C.FRAMING_HEADER + b"xyz")
        assert not framing.is_snappy_framed_stream(b"\xff\x06\x00\x00sNaPpX")
        assert not framing.is_snappy_framed_stream(b"")


class TestFramedScan:
    def test_header_only(self):
        assert framing.uncompressed_len_framed(C.FRAMING_HEADER) == 0

    def test_empty(self):
        assert framing.uncompressed_len_framed(b"") == 0

    def test_uncompressed_chunk(self):
        stream = (
            C.FRAMING_HEADER
            + framing.encode_frame_header(C.CHUNK_UNCOMPRESSED, 4 + 5)
            + b"\x00\x00\x00\x00"  # (bad) CRC — scan does not verify
            + b"hello"
        )
        assert framing.uncompressed_len_framed(stream) == 5

    def test_truncated_header(self):
        assert framing.uncompressed_len_framed(C.FRAMING_HEADER + b"\x00\x01") is None

    def test_truncated_payload(self):
        stream = C.FRAMING_HEADER + framing.encode_frame_header(
            C.CHUNK_UNCOMPRESSED, 100
        )
        assert framing.uncompressed_len_framed(stream) is None

    def test_unskippable_reserved(self):
        stream = C.FRAMING_HEADER + framing.encode_frame_header(0x02, 0)
        assert framing.uncompressed_len_framed(stream) is None

    def test_skippable_reserved(self):
        stream = (
            C.FRAMING_HEADER
            + framing.encode_frame_header(0x80, 3)
            + b"abc"
        )
        assert framing.uncompressed_len_framed(stream) == 0

    def test_oversized_uncompressed_chunk(self):
        # 64 KiB + 1 of plaintext in one chunk is invalid
        stream = (
            C.FRAMING_HEADER
            + framing.encode_frame_header(C.CHUNK_UNCOMPRESSED, 4 + 65537)
            + b"\x00" * (4 + 65537)
        )
        assert framing.uncompressed_len_framed(stream) is None

    def test_compressed_chunk_too_short(self):
        stream = C.FRAMING_HEADER + framing.encode_frame_header(
            C.CHUNK_COMPRESSED, 3
        ) + b"\x00\x00\x00"
        assert framing.uncompressed_len_framed(stream) is None


class TestNativeScanParity:
    """framing.scan_frames routes >= 1 MiB streams through the native C
    header pass (round-5 VERDICT item 4); it must agree with the Python
    walk exactly — valid streams, malformed streams, and edge chunks."""

    def _big_stream(self):
        import snappy_tpu as s

        payload = (b"scan parity " * 9000 + bytes(range(256)) * 40) * 14
        assert len(payload) > (1 << 20)
        return s.encode_framed(payload)

    def _python_scan(self, data, start):
        import snappy_tpu.formats.framing as fr

        old = fr._NATIVE_SCAN_MIN
        fr._NATIVE_SCAN_MIN = 1 << 62
        try:
            return fr.scan_frames(data, start)
        finally:
            fr._NATIVE_SCAN_MIN = old

    def test_valid_stream_parity(self):
        from snappy_tpu.ops import host_codec

        if not host_codec.available():
            import pytest

            pytest.skip("native lib unavailable")
        enc = self._big_stream()
        nat = framing.scan_frames(enc, len(C.FRAMING_HEADER))
        py = self._python_scan(enc, len(C.FRAMING_HEADER))
        assert nat == py and len(nat) > 10

    def test_malformed_parity(self):
        from snappy_tpu.ops import host_codec

        if not host_codec.available():
            import pytest

            pytest.skip("native lib unavailable")
        enc = self._big_stream()
        start = len(C.FRAMING_HEADER)
        cases = []
        cases.append(enc[:-3])                       # torn final chunk
        bad = bytearray(enc)
        bad[start] = 0x40                            # unskippable id
        cases.append(bytes(bad))
        # compressed chunk whose inner varint is all-continuation bytes
        body = b"\xff" * 10
        cases.append(
            enc
            + framing.encode_frame_header(C.CHUNK_COMPRESSED, 4 + len(body))
            + b"\x00" * 4
            + body
        )
        # oversized declared inner length (> 64 KiB)
        import snappy_tpu.formats.varint as v

        body2 = v.encode_uint32(65537)
        cases.append(
            enc
            + framing.encode_frame_header(C.CHUNK_COMPRESSED, 4 + len(body2))
            + b"\x00" * 4
            + body2
        )
        # data chunk with data_len < 4
        cases.append(
            enc + framing.encode_frame_header(C.CHUNK_UNCOMPRESSED, 2) + b"\x00\x00"
        )
        # skippable + padding chunks appended stay valid
        ok_tail = (
            enc
            + framing.encode_frame_header(0x9A, 3)
            + b"abc"
            + framing.encode_frame_header(C.CHUNK_PADDING, 1)
            + b"\x00"
        )
        for case in cases:
            assert framing.scan_frames(case, start) is None
            assert self._python_scan(case, start) is None
        nat = framing.scan_frames(ok_tail, start)
        py = self._python_scan(ok_tail, start)
        assert nat == py and nat is not None
