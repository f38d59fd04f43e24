"""Cross-backend equivalence: host (native C) vs device (JAX) paths.

Both backends must accept/reject identical inputs and round-trip through
each other — the in-framework analog of the reference's Nim-vs-C++
differential testing (test_snappy.nim:44-69)."""

import numpy as np
import pytest

import snappy_tpu as s
from snappy_tpu import engine
from snappy_tpu.ops import host_codec
from snappy_tpu.testing import corpus, oracle

from test_oracle import MALFORMED_RAW

pytestmark = pytest.mark.skipif(
    not host_codec.available(), reason="native host codec unavailable"
)


def _payloads():
    rng = np.random.default_rng(0)
    word = rng.integers(0, 256, 23, dtype=np.uint8).tobytes()
    return [
        b"",
        b"x",
        b"hello world " * 40,
        (word * 9000)[:150_000],
        rng.integers(0, 256, 50_000, dtype=np.uint8).tobytes(),
    ]


class TestRawEquivalence:
    @pytest.mark.parametrize("i", range(5))
    def test_cross_decode(self, i):
        payload = _payloads()[i]
        enc_host = engine.raw_compress(payload, backend="host")
        enc_dev = engine.raw_compress(payload, backend="device")
        for enc in (enc_host, enc_dev):
            for backend in ("host", "device"):
                out, reason = engine.raw_uncompress(enc, backend=backend)
                assert reason == "ok" and out == payload
            dec, err = oracle.uncompress(enc)
            assert err is None and dec == payload

    @pytest.mark.parametrize("idx", range(len(MALFORMED_RAW)))
    def test_malformed_rejected_by_host(self, idx):
        out, reason = engine.raw_uncompress(MALFORMED_RAW[idx], backend="host")
        assert out is None

    @pytest.mark.parametrize("name", corpus.BAD_FILES)
    def test_baddata_rejected_by_host(self, corpus_root, name):
        out, reason = engine.raw_uncompress(corpus.read_data(name), backend="host")
        assert out is None

    def test_golden_decode_host(self, corpus_root):
        gold = corpus.read_data(corpus.GOLDEN_RAWSNAPPY)
        ref, err = oracle.uncompress(gold)
        out, reason = engine.raw_uncompress(gold, backend="host")
        assert reason == "ok" and out == ref

    def test_random_streams_differential(self):
        """Arbitrary byte strings: host decoder and oracle agree exactly."""
        import random

        rng = random.Random(9)
        for _ in range(300):
            n = rng.randrange(1, 120)
            data = bytes(rng.getrandbits(8) for _ in range(n))
            ref, ref_err = oracle.uncompress(data)
            out, reason = engine.raw_uncompress(data, backend="host")
            if ref_err is None:
                assert reason == "ok" and out == ref
            else:
                assert out is None


class TestFramedEquivalence:
    @pytest.mark.parametrize("i", range(5))
    def test_cross_decode(self, i):
        payload = _payloads()[i]
        enc_host = engine.framed_compress(payload, backend="host")
        enc_dev = engine.framed_compress(payload, backend="device")
        for enc in (enc_host, enc_dev):
            for backend in ("host", "device"):
                out, reason = engine.framed_uncompress(enc, backend=backend)
                assert reason == "ok" and out == payload

    def test_external_stream_host(self, corpus_root):
        enc = corpus.read_stream("alice29.txt.sz-64k")
        plain = corpus.read_data("alice29.txt")
        if enc is None:
            pytest.skip("stream file missing")
        out, reason = engine.framed_uncompress(enc, backend="host")
        assert reason == "ok" and out == plain

    def test_crc_mismatch_host(self):
        payload = b"integrity " * 200
        enc = bytearray(engine.framed_compress(payload, backend="host"))
        enc[14] ^= 0xFF
        out, reason = engine.framed_uncompress(bytes(enc), backend="host")
        assert out is None and reason == "crc"
        out, reason = engine.framed_uncompress(
            bytes(enc), check_integrity=False, backend="host"
        )
        assert reason == "ok" and out == payload


class TestVarintStrictness:
    """Backend-independent accept/reject for non-canonical varints: all
    decode paths enforce the reference's 5-byte uint32 limit
    (snappy.nim:92), regardless of backend (ADVICE round-1, item 2)."""

    def _overlong_raw(self):
        # 6-byte varint encoding 100 (non-canonical zero continuation).
        import snappy_tpu as s

        body = s.encode(b"x" * 100)  # canonical: 1-byte varint '100'
        assert body[0] == 100
        return b"\xe4\x80\x80\x80\x80\x00" + body[1:]

    def test_overlong_raw_varint_rejected_everywhere(self):
        import snappy_tpu as s
        from snappy_tpu import engine
        from snappy_tpu.testing import oracle

        bad = self._overlong_raw()
        for backend in ("host", "device"):
            got, reason = engine.raw_uncompress(bad, backend=backend)
            assert got is None, backend
        assert s.decode(bad) == b""
        ref, err = oracle.uncompress(bad)
        assert ref is None
        res = s.uncompress_into(bad, bytearray(200))
        assert res.is_err()

    def test_overlong_framed_inner_varint_rejected_everywhere(self):
        import snappy_tpu as s
        from snappy_tpu.formats import constants as C2
        from snappy_tpu.formats import framing as fr
        from snappy_tpu.ops import crc32c_native
        from snappy_tpu import engine

        blob = self._overlong_raw()
        crc = crc32c_native.masked_crc32c(b"x" * 100).to_bytes(4, "little")
        stream = (
            C2.FRAMING_HEADER
            + fr.encode_frame_header(C2.CHUNK_COMPRESSED, 4 + len(blob))
            + crc
            + blob
        )
        for backend in ("host", "device"):
            got, reason = engine.framed_uncompress(stream, backend=backend)
            assert got is None, f"{backend} accepted overlong varint"
        assert s.decode_framed(stream) == b""
