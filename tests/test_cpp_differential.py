"""Differential testing against the REAL google/snappy (libsnappy.so).

This reproduces the reference's central test trick: every round-trip is
validated against the C++ implementation in both directions
(/root/reference/tests/test_snappy.nim:44-69 via tests/cpp_snappy.nim), and
fuzzing asserts our decoder agrees with the C++ decoder on arbitrary input
(/root/reference/tests/fuzzing/fuzz_block_format.nim:8-33).

Byte-identity with C++ is deliberately NOT asserted (the reference makes the
same choice, test_snappy.nim:50-53) — only cross-decodability and decode
agreement.
"""

import os
import random

import pytest

import snappy_tpu as s
from snappy_tpu import engine
from snappy_tpu.ops import host_codec
from snappy_tpu.testing import corpus, cpp_snappy, oracle

pytestmark = pytest.mark.skipif(
    not cpp_snappy.available(), reason="google/snappy shared library not found"
)

FUZZ_SCALE = max(1, int(os.environ.get("SNAPPY_TPU_FUZZ_EXAMPLES", "30")) // 30)


def _backends():
    res = ["device"]
    if host_codec.available():
        res.append("host")
    return res


class TestCorpusCross:
    @pytest.mark.parametrize("name", corpus.CORPUS_FILES)
    def test_cpp_decodes_ours_and_we_decode_cpps(self, name):
        data = corpus.read_data(name)
        if data is None:
            pytest.skip("corpus unavailable")
        theirs = cpp_snappy.encode(data)
        # We decode C++'s encoding (all our decoders).
        assert s.decode(theirs) == data
        ref, err = oracle.uncompress(theirs)
        assert err is None and ref == data
        for backend in _backends():
            got, reason = engine.raw_uncompress(theirs, backend=backend)
            assert got == data, f"{backend}: {reason}"
            # C++ decodes our encoding.
            ours = engine.raw_compress(data, backend=backend)
            assert cpp_snappy.decode(ours) == data, backend

    def test_cpp_decode_into_reused_buffer(self):
        """The reused-buffer C++ control entry point (bench methodology):
        exact bytes into a caller buffer, None on malformed input, and a
        too-small buffer rejected rather than overrun."""
        data = corpus.read_data("html") or b"snappy_tpu" * 4000
        enc = cpp_snappy.encode(data)
        out = bytearray(len(data))
        n = cpp_snappy.decode_into(enc, out)
        assert n == len(data) and bytes(out) == data
        assert cpp_snappy.decode_into(b"\xff\xff\xff\xff\xff", out) is None
        small = bytearray(len(data) // 2)
        assert cpp_snappy.decode_into(enc, small) is None

    def test_golden_rawsnappy_matches_cpp_decode(self):
        # The golden file's line endings differ from the plaintext file, so
        # like the reference (test_snappy.nim:71-79) we assert our decode
        # equals the C++ decode, not the plaintext.
        blob = corpus.read_data(corpus.GOLDEN_RAWSNAPPY)
        if blob is None:
            pytest.skip("corpus unavailable")
        cpp = cpp_snappy.decode(blob)
        assert cpp is not None and len(cpp) > 0
        assert s.decode(blob) == cpp

    def test_compressed_size_parity(self):
        """Our host greedy encoder must not be (meaningfully) worse than
        C++ snappy on the corpus (BASELINE.json size target)."""
        for name in corpus.available_corpus():
            data = corpus.read_data(name)
            ours = len(s.encode(data))
            cpps = len(cpp_snappy.encode(data))
            assert ours <= cpps * 1.02, f"{name}: ours={ours} cpp={cpps}"


class TestRandomCross:
    def _payload(self, rng, n):
        word = bytes(rng.getrandbits(8) for _ in range(rng.randrange(2, 17)))
        rep = (word * (n // len(word) + 1))[: n // 2]
        tail = bytes(rng.getrandbits(8) for _ in range(n - len(rep)))
        return rep + tail

    def test_random_roundtrips_cross_decode(self):
        rng = random.Random(424242)
        for trial in range(100 * FUZZ_SCALE):
            payload = self._payload(rng, rng.randrange(0, 4000))
            theirs = cpp_snappy.encode(payload)
            assert s.decode(theirs) == payload, f"trial {trial}"
            ours = s.encode(payload)
            assert cpp_snappy.decode(ours) == payload, f"trial {trial}"

    def test_mutation_fuzz_cpp_agreement(self):
        """Arbitrary mutants: our decoders and C++ must agree on
        accept/reject and on the bytes (fuzz_block_format.nim:8-33).

        google/snappy 1.1.x is known to accept exactly the same raw-format
        language as the reference decoder; any disagreement is a bug on one
        side and must be investigated, not papered over.
        """
        rng = random.Random(31337)
        from test_mutation_fuzz import _mutate

        seeds = [
            s.encode(self._payload(rng, rng.randrange(30, 600)))
            for _ in range(20)
        ]
        # Corpus-seeded fuzzing (collect_corpus.nim:17-35 analog): every
        # test-data file under 50 KB contributes its compressed form.
        for name in corpus.available_corpus():
            data = corpus.read_data(name)
            if data is not None and len(data) < 50_000:
                seeds.append(s.encode(data))
        for trial in range(150 * FUZZ_SCALE):
            mutant = _mutate(rng, seeds[trial % len(seeds)])
            cpp = cpp_snappy.decode(mutant)
            ref, ref_err = oracle.uncompress(mutant)
            ours = ref if ref_err is None else None
            assert (cpp is None) == (ours is None), (
                f"trial {trial}: cpp={'rej' if cpp is None else 'acc'} "
                f"oracle={'rej' if ours is None else 'acc'}"
            )
            if cpp is not None:
                assert cpp == ours, f"trial {trial}: bytes differ"


class TestFramedSeeded:
    def test_corpus_seeded_framed_fuzz(self):
        """Framed idempotence fuzz seeded from corpus files in framed form
        (fuzz_framing_format.nim:4-14 + collect_corpus.nim:17-35)."""
        rng = random.Random(99)
        from test_mutation_fuzz import _mutate

        seeds = []
        for name in corpus.available_corpus():
            data = corpus.read_data(name)
            if data is not None and len(data) < 50_000:
                seeds.append(s.encode_framed(data))
        if not seeds:
            pytest.skip("corpus unavailable")
        for trial in range(40 * FUZZ_SCALE):
            mutant = _mutate(rng, seeds[trial % len(seeds)])
            out = s.decode_framed(mutant)
            # Idempotence: re-encoding whatever decoded must round-trip.
            assert s.decode_framed(s.encode_framed(out)) == out
