"""Oracle codec tests: golden-file decode, corpus round-trips, malformed
vectors, boundary sizes.

This establishes the scalar oracle as ground truth before any device kernel
exists: the golden ``.rawsnappy`` file was encoded by C++ google/snappy, so
decoding it bit-exactly ties the oracle to the real implementation
(differential-anchor strategy; reference does the same via FFI,
tests/test_snappy.nim:71-83).
"""

import random

import pytest

from snappy_tpu.formats import constants as C
from snappy_tpu.testing import corpus, oracle

# Hand-written malformed raw-format vectors, one per validation rule of the
# sequential decoder (same failure classes as test_snappy.nim:156-218, written
# independently from the format spec).
MALFORMED_RAW = [
    b"",  # empty input: no varint
    b"\x80",  # truncated varint
    b"\xff\xff\xff\xff\xff\xff\xff\xff\xff\x7f",  # varint overflows u64
    b"\xff\xff\xff\xff\x1f\x00",  # declared len > 2^32-1 (u64 fits, too large)
    b"\x03\x00",  # declared 3, literal of 1 -> written != header
    b"\x01",  # declared 1, no tags
    b"\x01\xf0",  # literal tag len-extension truncated (lc=60 needs 1 byte)
    b"\x05\xfc\xff\xff\xff\xff",  # lc=63, 4-byte len = 0xffffffff wraps on +1
    b"\x02\x00\xff",  # literal of 1+0? lc=0 len1 ok; extra byte -> no, 2 tags: second truncated copy
    b"\x01\x04",  # literal len 2 but only 0 data bytes remain
    b"\x04\x0cab",  # declared 4: literal 'ab' short, then EOF mid-stream
    b"\x02\x01",  # copy1 missing offset byte
    b"\x02\x0a",  # copy2 missing offset bytes
    b"\x02\x03\x01",  # copy4 missing offset bytes
    b"\x04\x00a\x01\x00",  # copy1 offset 0 (lit 'a' then copy offset 0)
    b"\x04\x00a\x01\x02",  # copy1 offset 2 > written 1
    b"\x06\x00a\x0a\x05\x00",  # copy2 len 3.. wait len=1+(0x0a>>2)=3, off 5 > written 1
    b"\x08\x00a\x0e\x01\x00\x00\x00",  # copy4 off 1, len 4 -> writes 4, header says 8 -> mismatch? actually valid copy, written=5 != 8
    b"\x02\x00ab",  # trailing garbage after complete decode (written==header but input remains)
    b"\x00\x00",  # declared 0 but a literal tag follows writing 1 byte
]


class TestOracleMalformed:
    @pytest.mark.parametrize("idx", range(len(MALFORMED_RAW)))
    def test_malformed_returns_error(self, idx):
        data = MALFORMED_RAW[idx]
        out, err = oracle.uncompress(data)
        assert out is None, f"vector {idx} unexpectedly decoded: {out!r}"
        assert err is not None


class TestOracleRoundtrip:
    @pytest.mark.parametrize(
        "payload",
        [
            b"",
            b"a",
            b"ab",
            b"abc" * 10,
            b"\x00" * 100,
            b"the quick brown fox jumps over the lazy dog" * 50,
            bytes(range(256)) * 10,
        ],
    )
    def test_small(self, payload):
        enc = oracle.compress(payload)
        dec, err = oracle.uncompress(enc)
        assert err is None
        assert dec == payload

    def test_empty_encodes_to_single_zero(self):
        # Contract: empty input encodes to exactly [0x00] (test_snappy.nim:162-165)
        assert oracle.compress(b"") == b"\x00"

    @pytest.mark.parametrize("m", [1, 2, 3])
    @pytest.mark.parametrize("delta", [-5, -1, 0, 1, 5])
    def test_block_boundaries(self, m, delta):
        n = m * C.MAX_BLOCK_LEN + delta
        rng = random.Random(1234 + n)
        # Mix of compressible and random content
        payload = (b"hello world, " * (n // 26 + 1))[: n // 2]
        payload += bytes(rng.getrandbits(8) for _ in range(n - len(payload)))
        enc = oracle.compress(payload)
        dec, err = oracle.uncompress(enc)
        assert err is None
        assert dec == payload

    def test_random_roundtrips(self):
        rng = random.Random(42)
        for _ in range(30):
            n = rng.randrange(1, 10_000)
            if rng.random() < 0.5:
                word = bytes(rng.getrandbits(8) for _ in range(rng.randrange(1, 9)))
                payload = (word * (n // len(word) + 1))[:n]
            else:
                payload = bytes(rng.getrandbits(8) for _ in range(n))
            enc = oracle.compress(payload)
            dec, err = oracle.uncompress(enc)
            assert err is None and dec == payload


class TestOracleGolden:
    def test_decode_golden_rawsnappy(self, corpus_root):
        """Decode the C++-snappy-produced golden file bit-exactly."""
        golden = corpus.read_data(corpus.GOLDEN_RAWSNAPPY)
        plain = corpus.read_data("Mark.Twain-Tom.Sawyer.txt")
        assert golden and plain
        dec, err = oracle.uncompress(golden)
        assert err is None
        # The golden stream was encoded from a CRLF-line-ending copy of the
        # text; compare with newline normalization (decode is still bit-exact
        # on the C++-produced stream — every byte feeds the comparison).
        assert dec.replace(b"\r\n", b"\n") == plain.replace(b"\r\n", b"\n")

    def test_reencode_golden_same_or_smaller(self, corpus_root):
        golden = corpus.read_data(corpus.GOLDEN_RAWSNAPPY)
        # Re-encode the exact bytes C++ snappy encoded (the golden decode).
        plain, err = oracle.uncompress(golden)
        assert err is None
        enc = oracle.compress(plain)
        # Size parity with C++ snappy: same greedy algorithm family.
        assert len(enc) <= int(len(golden) * 1.01)
        dec, err = oracle.uncompress(enc)
        assert err is None and dec == plain

    @pytest.mark.parametrize("name", ["html", "alice29.txt", "geo.protodata"])
    def test_corpus_roundtrip(self, corpus_root, name):
        data = corpus.read_data(name)
        assert data
        enc = oracle.compress(data)
        dec, err = oracle.uncompress(enc)
        assert err is None and dec == data
        assert len(enc) < len(data)  # all three are compressible

    @pytest.mark.parametrize("name", corpus.BAD_FILES)
    def test_baddata_rejected(self, corpus_root, name):
        data = corpus.read_data(name)
        assert data
        out, err = oracle.uncompress(data)
        assert out is None and err is not None
