"""Framed-format tests (mirrors reference tests/test_framed.nim)."""

import random

import pytest

import snappy_tpu as s
from snappy_tpu.formats import constants as C
from snappy_tpu.formats import framing
from snappy_tpu.ops import crc32c_native
from snappy_tpu.testing import corpus


def frame_header(cid, length):
    return framing.encode_frame_header(cid, length)


class TestFramedRoundtrip:
    @pytest.mark.parametrize(
        "payload",
        [
            b"",
            b"a",
            b"hello framed world " * 50,
            b"\xff" * 70000,  # two frames, RLE
        ],
    )
    def test_roundtrip(self, payload):
        enc = s.encode_framed(payload)
        assert enc.startswith(C.FRAMING_HEADER)
        assert s.decode_framed(enc) == payload
        assert s.uncompressed_len_framed(enc) == len(payload)

    def test_empty_is_header_only(self):
        assert s.encode_framed(b"") == C.FRAMING_HEADER
        assert s.decode_framed(C.FRAMING_HEADER) == b""

    @pytest.mark.parametrize(
        "n",
        [
            C.MIN_NON_LITERAL_BLOCK_SIZE - 1,
            C.MIN_NON_LITERAL_BLOCK_SIZE,
            C.MIN_NON_LITERAL_BLOCK_SIZE + 1,
            C.MAX_UNCOMPRESSED_FRAME_DATA_LEN - 1,
            C.MAX_UNCOMPRESSED_FRAME_DATA_LEN,
            C.MAX_UNCOMPRESSED_FRAME_DATA_LEN + 1,
        ],
    )
    def test_frame_boundaries(self, n):
        # test_framed.nim:140-158
        payload = (b"0123456789abcdef" * (n // 16 + 1))[:n]
        enc = s.encode_framed(payload)
        assert s.decode_framed(enc) == payload

    def test_incompressible_frames_stored_verbatim(self):
        rng = random.Random(5)
        payload = bytes(rng.getrandbits(8) for _ in range(5000))
        enc = s.encode_framed(payload)
        # id of first data chunk after the stream header
        assert enc[len(C.FRAMING_HEADER)] == C.CHUNK_UNCOMPRESSED
        assert s.decode_framed(enc) == payload

    def test_compressible_frames_compressed(self):
        payload = b"compress me please " * 1000
        enc = s.encode_framed(payload)
        assert enc[len(C.FRAMING_HEADER)] == C.CHUNK_COMPRESSED
        assert len(enc) < len(payload)
        assert s.decode_framed(enc) == payload


class TestFramedGoldenStreams:
    @pytest.mark.parametrize("stream_name,plain_name", corpus.STREAM_FILES)
    def test_decode_external_streams(self, corpus_root, stream_name, plain_name):
        """Pre-compressed framed streams from an external snappy tool decode
        bit-exactly (test_framed.nim:9-59)."""
        enc = corpus.read_stream(stream_name)
        plain = corpus.read_data(plain_name)
        if enc is None:
            pytest.skip("stream file missing")
        assert s.decode_framed(enc) == plain
        assert s.uncompressed_len_framed(enc) == len(plain)

    def test_roundtrip_corpus(self, corpus_root):
        data = corpus.read_data("alice29.txt")
        enc = s.encode_framed(data)
        assert s.decode_framed(enc) == data


class TestFramedMalformed:
    def check_invalid(self, data, reasons=(s.FrameError.invalid_input,)):
        # All three framed decode APIs must fail (test_framed.nim:83-95).
        assert s.decode_framed(data) == b""
        res = s.uncompress_framed_into(data, bytearray(1 << 17))
        assert res.is_err() and res.error in reasons

    def test_truncated_magic(self):
        self.check_invalid(C.FRAMING_HEADER[:5])

    def test_wrong_magic(self):
        bad = bytes([0xFF, 0x06, 0x00, 0x00]) + b"sNaPpX"
        self.check_invalid(bad)

    def test_truncated_chunk_header(self):
        self.check_invalid(C.FRAMING_HEADER + b"\x00\x01")

    def test_truncated_chunk_payload(self):
        self.check_invalid(C.FRAMING_HEADER + frame_header(C.CHUNK_UNCOMPRESSED, 64))

    def test_unskippable_reserved_chunk(self):
        data = C.FRAMING_HEADER + frame_header(0x02, 4) + b"\x00" * 4
        assert s.decode_framed(data) == b""
        res = s.uncompress_framed_into(data, bytearray(64))
        assert res.is_err() and res.error == s.FrameError.unknown_chunk

    def test_skippable_reserved_chunk_skipped(self):
        payload = b"after the skippable chunk"
        inner = s.encode_framed(payload)[len(C.FRAMING_HEADER) :]
        data = C.FRAMING_HEADER + frame_header(0x80, 3) + b"abc" + inner
        assert s.decode_framed(data) == payload

    def test_padding_chunk_skipped(self):
        payload = b"after padding"
        inner = s.encode_framed(payload)[len(C.FRAMING_HEADER) :]
        data = C.FRAMING_HEADER + frame_header(C.CHUNK_PADDING, 8) + b"\x00" * 8 + inner
        assert s.decode_framed(data) == payload

    def test_oversized_uncompressed_chunk(self):
        n = C.MAX_UNCOMPRESSED_FRAME_DATA_LEN + 1
        data = (
            C.FRAMING_HEADER
            + frame_header(C.CHUNK_UNCOMPRESSED, 4 + n)
            + b"\x00" * (4 + n)
        )
        self.check_invalid(data)

    def test_compressed_chunk_too_short(self):
        data = C.FRAMING_HEADER + frame_header(C.CHUNK_COMPRESSED, 3) + b"\x00" * 3
        self.check_invalid(data)

    def test_bad_crc_rejected(self):
        payload = b"integrity matters " * 10
        enc = bytearray(s.encode_framed(payload))
        # CRC is the 4 bytes after the first chunk header
        pos = len(C.FRAMING_HEADER) + 4
        enc[pos] ^= 0xFF
        assert s.decode_framed(bytes(enc)) == b""
        res = s.uncompress_framed_into(bytes(enc), bytearray(1 << 17))
        assert res.is_err() and res.error == s.FrameError.crc_mismatch

    def test_bad_crc_accepted_without_integrity(self):
        # Wrong CRC accepted when check_integrity is off
        # (test_framed.nim:160-196).
        payload = b"integrity optional " * 10
        enc = bytearray(s.encode_framed(payload))
        pos = len(C.FRAMING_HEADER) + 4
        enc[pos] ^= 0xFF
        assert s.decode_framed(bytes(enc), check_integrity=False) == payload

    def test_hand_built_uncompressed_chunk(self):
        payload = b"hand built"
        crc = crc32c_native.masked_crc32c(payload).to_bytes(4, "little")
        data = (
            C.FRAMING_HEADER
            + frame_header(C.CHUNK_UNCOMPRESSED, 4 + len(payload))
            + crc
            + payload
        )
        assert s.decode_framed(data) == payload


class TestResumableProtocol:
    def test_resume_across_output_buffers(self):
        """Partial-output + resume (test_framed.nim:38-59)."""
        payload = b"".join(
            bytes([i & 0xFF]) * 1000 for i in range(200)
        )  # 200 KB -> 4 frames
        enc = s.encode_framed(payload)

        out = bytearray(70000)
        got = b""
        view = memoryview(enc)
        first = True
        while True:
            res = s.uncompress_framed_into(bytes(view), out, check_header=first)
            assert res.is_ok()
            read, written = res.unwrap()
            got += bytes(out[:written])
            if read >= len(view):
                break
            assert written > 0  # forward progress
            view = view[read:]
            first = False
        assert got == payload

    def test_buffer_too_small_for_any_chunk(self):
        payload = b"z" * 50000
        enc = s.encode_framed(payload)
        res = s.uncompress_framed_into(enc, bytearray(10))
        assert res.is_ok()
        read, written = res.unwrap()
        assert written == 0 and read == len(C.FRAMING_HEADER)

    def test_exact_fit(self):
        payload = b"q" * 30000
        enc = s.encode_framed(payload)
        out = bytearray(len(payload))
        res = s.uncompress_framed_into(enc, out)
        assert res.is_ok()
        read, written = res.unwrap()
        assert read == len(enc) and written == len(payload)
        assert bytes(out) == payload
