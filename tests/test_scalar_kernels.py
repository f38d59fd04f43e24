"""Scalar-core Pallas codec kernels, executed via the Pallas interpreter.

These pin the production TPU decode/encode kernel semantics in CI without
TPU hardware (the same kernels run compiled on-device; see
experiments/e4_scalar_decode_tpu.py for the hardware runs).  Payloads stay
small: the interpreter executes the scalar loops op by op.
"""

import random

import numpy as np
import pytest

import snappy_tpu as s
from snappy_tpu.formats import varint
from snappy_tpu.ops import decode_scalar, encode_scalar
from snappy_tpu.testing import oracle

from test_oracle import MALFORMED_RAW


def _tag_stream(payload):
    enc = s.encode(payload)
    _, v = varint.decode_uint32(enc)
    return enc[v:]


PAYLOADS = [
    b"",
    b"x",
    b"hello world hello world hello world ",
    bytes(random.Random(1).randbytes(500)),
    b"ab" * 300,       # offset-2 pattern
    b"a" * 700,        # offset-1 RLE
    b"abc" * 200,      # offset-3
    b"abcd" * 200,
    b"abcdefg" * 100,
    b"the quick brown fox jumps over the lazy dog. " * 20,
]


class TestScalarDecoder:
    def test_valid_streams_roundtrip(self):
        bodies = [_tag_stream(p) for p in PAYLOADS]
        decls = [len(p) for p in PAYLOADS]
        meta, comp = decode_scalar.pack_chunks(bodies, decls)
        out_w, status = decode_scalar.decode_chunks_words(
            meta, comp, len(bodies), interpret=True
        )
        status = np.asarray(status)
        outs = decode_scalar.unpack_output(np.asarray(out_w), status[:, 0, 1])
        for k, p in enumerate(PAYLOADS):
            assert bool(status[k, 0, 0]), k
            assert outs[k] == p, k



    def test_emit_edge_matrix(self):
        """Hand-crafted tag streams covering every emit path class of the
        v3 copy engine: offsets 1-3 (pattern), 4-7 (non-carry funnel),
        >= 8 (carried word / aligned loops), x copy lengths around the
        8-byte head and loop strides, x all destination alignments.

        Copies are emitted as tagCopy2 (decoder.nim:97-102 accepts any
        length 1..64 even though encoders only emit >= 4)."""
        rng = random.Random(9)
        cases = []
        for off in (1, 2, 3, 4, 5, 6, 7, 8, 9, 16):
            for clen in (1, 4, 5, 8, 9, 12, 16, 17, 64):
                for align in (1, 2, 3, 4, 5):
                    lit0 = max(off, align)
                    cases.append((lit0, off, clen))
        bodies, expected = [], []
        for lit0, off, clen in cases:
            head = bytes(rng.randrange(1, 256) for _ in range(lit0))
            body = bytearray()
            body.append((lit0 - 1) << 2)          # literal tag (len < 60)
            body += head
            body.append(2 | ((clen - 1) << 2))    # tagCopy2
            body += off.to_bytes(2, "little")
            tail = bytes(rng.randrange(1, 256) for _ in range(3))
            body.append((3 - 1) << 2)
            body += tail
            out = bytearray(head)
            for _ in range(clen):
                out.append(out[-off])
            out += tail
            bodies.append(bytes(body))
            expected.append(bytes(out))
        meta, comp = decode_scalar.pack_chunks(
            bodies, [len(e) for e in expected]
        )
        out_w, status = decode_scalar.decode_chunks_words(
            meta, comp, len(bodies), interpret=True
        )
        status = np.asarray(status)
        outs = decode_scalar.unpack_output(np.asarray(out_w), status[:, 0, 1])
        for k, (case, exp) in enumerate(zip(cases, expected)):
            assert bool(status[k, 0, 0]), case
            assert outs[k] == exp, case




    def test_emit_edge_matrix_streaming(self):
        """The same offset x length x alignment emit matrix as
        test_emit_edge_matrix, chained into ONE raw stream through the
        windowed streaming decoder (its copy engine is a separate
        implementation sharing the v3 design)."""
        from snappy_tpu.ops import decode_stream

        rng = random.Random(10)
        body = bytearray()
        out = bytearray()
        for off in (1, 2, 3, 4, 5, 6, 7, 8, 9, 16):
            for clen in (1, 4, 5, 8, 9, 12, 16, 17, 64):
                for align in (1, 2, 3, 4, 5):
                    lit0 = max(off, align)
                    head = bytes(rng.randrange(1, 256) for _ in range(lit0))
                    body.append((lit0 - 1) << 2)
                    body += head
                    out += head
                    body.append(2 | ((clen - 1) << 2))
                    body += off.to_bytes(2, "little")
                    for _ in range(clen):
                        out.append(out[-off])
        got, reason = decode_stream.decode_raw_stream_bytes(
            bytes(body), len(out), interpret=True
        )
        assert reason == "ok"
        assert got == bytes(out)




    def test_split_copy_beyond_history_resumes_from_hbm(self):
        """A legal tagCopy4 with offset in (64 KiB, written] that SPLITS at
        an output-window boundary resumes at w=0 in the next window, where
        the offset exceeds the SMEM history.  Round 4 flagged the stream
        unsupported (XLA fallback); since round 5 the grid kernel serves
        the pending remainder from the flushed output in HBM and must
        decode it bit-exactly.  SCAN mode (the differential oracle) keeps
        the unsupported flag."""
        from snappy_tpu.ops import decode_stream

        rng = random.Random(13)
        body = bytearray()
        out = bytearray()
        for chunk_len in (65000, 60000, 6040):
            payload = bytes(rng.randrange(256) for _ in range(chunk_len))
            body.append(61 << 2)                    # literal, 2-byte ext
            body += (chunk_len - 1).to_bytes(2, "little")
            body += payload
            out += payload
        # cursor at 131040 (window 1, w=65504): ONE tagCopy4, off=70000,
        # len=64, splits at the 131072 boundary (32 bytes pend) and is the
        # only tag whose reach exceeds the history — the parse-time check
        # alone cannot catch it (70000 <= 65536 + 65504), only the
        # split-time re-check against the w=0 resume cursor can
        off, clen = 70000, 64
        body.append(3 | ((clen - 1) << 2))
        body += off.to_bytes(4, "little")
        for _ in range(clen):
            out.append(out[-off])
        tail = bytes(rng.randrange(256) for _ in range(3))
        body.append((3 - 1) << 2)
        body += tail
        out += tail
        got, reason = decode_stream.decode_raw_stream_bytes(
            bytes(body), len(out), interpret=True, mode="grid"
        )
        assert reason == "ok" and got == bytes(out)
        got, reason = decode_stream.decode_raw_stream_bytes(
            bytes(body), len(out), interpret=True, mode="scan"
        )
        assert reason == "unsupported"


    def test_malformed_decisions_match_oracle(self):
        bodies, decls = [], []
        for mv in MALFORMED_RAW:
            val, read = varint.decode_uint32(bytes(mv))
            if val is None or val > 65536:
                continue
            bodies.append(bytes(mv)[read:])
            decls.append(val)
        meta, comp = decode_scalar.pack_chunks(bodies, decls)
        out_w, status = decode_scalar.decode_chunks_words(
            meta, comp, len(bodies), interpret=True
        )
        status = np.asarray(status)
        for k in range(len(bodies)):
            ref_out, ref_err = oracle.decode_all_tags(bodies[k], decls[k])
            ref_ok = ref_err is None and len(ref_out) == decls[k]
            assert bool(status[k, 0, 0]) == ref_ok, k

    def test_mutant_decisions_match_oracle(self):
        rng = random.Random(7)
        base = _tag_stream(PAYLOADS[9])
        bodies, decls = [], []
        for _ in range(8):
            b = bytearray(base)
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
            bodies.append(bytes(b))
            decls.append(len(PAYLOADS[9]))
        meta, comp = decode_scalar.pack_chunks(bodies, decls)
        out_w, status = decode_scalar.decode_chunks_words(
            meta, comp, len(bodies), interpret=True
        )
        status = np.asarray(status)
        outs = decode_scalar.unpack_output(np.asarray(out_w), status[:, 0, 1])
        for k in range(len(bodies)):
            ref_out, ref_err = oracle.decode_all_tags(bodies[k], decls[k])
            ref_ok = ref_err is None and len(ref_out) == decls[k]
            assert bool(status[k, 0, 0]) == ref_ok, k
            if ref_ok:
                assert outs[k] == bytes(ref_out), k


    def test_run_mutant_decisions_match_oracle(self):
        """Mutations inside long 0xFE copy runs drive the runs-walk
        coalescer (16-tag probe, word-period scan, same-offset tail
        merge): decisions and bytes must match the oracle exactly —
        a flipped byte ends the identical scan mid-run, may forge a
        different-offset tag, or may invalidate the stream."""
        rng = random.Random(17)
        for payload in (b"\x00" * 60000, (bytes(range(96)) * 700)[:60000]):
            base = _tag_stream(payload)
            bodies, decls = [], []
            # targeted mutations in the run region (past the first ~8
            # bytes of literal head) + a truncation mid-run
            for _ in range(14):
                b = bytearray(base)
                i = rng.randrange(8, len(b))
                b[i] ^= 1 << rng.randrange(8)
                bodies.append(bytes(b))
                decls.append(len(payload))
            bodies.append(base[: len(base) - 2])   # truncated final tag
            decls.append(len(payload))
            meta, comp = decode_scalar.pack_chunks(bodies, decls)
            out_w, status = decode_scalar.decode_chunks_words(
                meta, comp, len(bodies), interpret=True
            )
            status = np.asarray(status)
            outs = decode_scalar.unpack_output(
                np.asarray(out_w), status[:, 0, 1])
            for k in range(len(bodies)):
                ref_out, ref_err = oracle.decode_all_tags(bodies[k], decls[k])
                ref_ok = ref_err is None and len(ref_out) == decls[k]
                assert bool(status[k, 0, 0]) == ref_ok, (payload[:4], k)
                if ref_ok:
                    assert outs[k] == bytes(ref_out), (payload[:4], k)


class TestScalarEncoder:
    def test_blocks_encode_decodable_and_dense(self):
        meta, inw = encode_scalar.pack_blocks(PAYLOADS)
        enc_w, elen = encode_scalar.encode_blocks_words(
            meta, inw, len(PAYLOADS), interpret=True
        )
        elens = np.asarray(elen)[:, 0, 0]
        encs = encode_scalar.unpack_enc(np.asarray(enc_w), elens)
        for k, p in enumerate(PAYLOADS):
            dec, err = oracle.decode_all_tags(encs[k], len(p))
            assert err is None and bytes(dec) == p, k
            # BYTE-identical to the reference-mirror greedy oracle (the
            # kernel replicates the zeroed-table position-0 candidate
            # semantics, the probe-before-limit rule, and the top-bits
            # hash shift exactly; round-3 fix)
            ref = oracle.encode_block(p) if p else b""
            assert encs[k] == ref, (k, len(encs[k]), len(ref))

    def test_long_match_modes_byte_identical(self):
        """The three long-match continuation modes of match_len (round 4:
        phase-aligned raw-word scan, periodic constant-word scan, generic
        resume) must keep encoder output byte-identical to the oracle —
        incl. period breaks mid-run and match ends near the block end."""
        r = random.Random(41)
        blocks = [
            b"j" * 65536,                                   # mode B, off 1
            b"ab" * 32768,                                  # mode B, off 2
            b"abc" * 21845 + b"x",                          # mode C, off 3
            b"abcde" * 13107 + b"z",                        # mode C, off 5
            bytes(range(8)) * 8192,                         # mode A, off 8
            r.randbytes(4096) * 16,                         # mode A, off 4096
            r.randbytes(4097) * 15 + b"\x00" * 4081,        # mode C, odd off
            # period breaks mid-run, then resumes
            b"q" * 30000 + b"BREAK" + b"q" * 30000,
            b"rs" * 15000 + b"!" + b"rs" * 15000,
            # breaks inside the granule-tile path (off | 4096):
            bytes(range(8)) * 4000 + b"X" + bytes(range(8)) * 4000,
            r.randbytes(4096) * 8 + b"Y" + r.randbytes(4096) * 7,
            # break just past a granule boundary and near the bound
            bytes(range(16)) * 780 + b"Z" + bytes(range(16)) * 3000,
            # long match ending exactly at / near the block end
            (b"m" * 200 + r.randbytes(64)) + b"m" * 65272,
            r.randbytes(100) * 655 + r.randbytes(36),
        ]
        blocks = [b[:65536] for b in blocks]
        meta, inw = encode_scalar.pack_blocks(blocks)
        enc_w, elen = encode_scalar.encode_blocks_words(
            meta, inw, len(blocks), interpret=True)
        encs = encode_scalar.unpack_enc(
            np.asarray(enc_w), np.asarray(elen)[:, 0, 0])
        for k, blk in enumerate(blocks):
            assert encs[k] == oracle.encode_block(blk), f"block {k}"

    def test_long_match_modes_randomized(self):
        """Seeded randomized sweep over the long-match mode space:
        random periods (pattern/aligned/generic/page classes), random
        break positions (incl. near granule boundaries and the block
        end), random block sizes.  Byte identity vs the oracle is the
        invariant."""
        r = random.Random(57)
        blocks = []
        for period in (1, 2, 3, 5, 8, 12, 64, 512, 4096, 8192):
            pat = bytes(r.randrange(256) for _ in range(period))
            n = r.choice((65536, 65536, 40000, 65521))
            blk = bytearray((pat * (n // period + 2))[:n])
            for _ in range(r.randrange(4)):
                # flip a byte somewhere, biased toward granule edges
                i = r.choice((
                    r.randrange(n),
                    min(n - 1, 4096 * r.randrange(1, 16) + r.randrange(-32, 32)),
                    n - 1 - r.randrange(70),
                ))
                blk[i] ^= 0x5A
            blocks.append(bytes(blk))
        meta, inw = encode_scalar.pack_blocks(blocks)
        enc_w, elen = encode_scalar.encode_blocks_words(
            meta, inw, len(blocks), interpret=True)
        encs = encode_scalar.unpack_enc(
            np.asarray(enc_w), np.asarray(elen)[:, 0, 0])
        for k, blk in enumerate(blocks):
            assert encs[k] == oracle.encode_block(blk), f"case {k}"

    def test_corpus_blocks_byte_identical_to_oracle(self, corpus_root):
        """Every 64 KiB block of the benchmark corpus encodes to exactly
        the oracle's bytes (stronger than the reference's own cross-
        implementation contract, test_snappy.nim:50-53)."""
        from snappy_tpu.testing import corpus as corpus_mod

        names = ["html", "alice29.txt", "geo.protodata"]
        blocks = []
        for name in names:
            d = corpus_mod.read_data(name)
            if d is None:
                continue
            blocks += [d[i : i + 65536] for i in range(0, len(d), 65536)]
        if not blocks:
            pytest.skip("corpus missing")
        meta, inw = encode_scalar.pack_blocks(blocks)
        enc_w, elen = encode_scalar.encode_blocks_words(
            meta, inw, len(blocks), interpret=True
        )
        elens = np.asarray(elen)[:, 0, 0]
        encs = encode_scalar.unpack_enc(np.asarray(enc_w), elens)
        for k, blk in enumerate(blocks):
            assert encs[k] == oracle.encode_block(blk), (k, len(blk))

    def test_cpp_snappy_cross_decode(self):
        from snappy_tpu.testing import cpp_snappy

        if not cpp_snappy.available():
            pytest.skip("no libsnappy")
        meta, inw = encode_scalar.pack_blocks(PAYLOADS)
        enc_w, elen = encode_scalar.encode_blocks_words(
            meta, inw, len(PAYLOADS), interpret=True
        )
        elens = np.asarray(elen)[:, 0, 0]
        encs = encode_scalar.unpack_enc(np.asarray(enc_w), elens)
        for k, p in enumerate(PAYLOADS):
            full = varint.encode_uint32(len(p)) + encs[k]
            assert cpp_snappy.decode(full) == p, k


class TestEngineScalarPath:
    """Engine round-trip through the interpret-mode scalar kernels."""

    def test_engine_device_path_with_scalar_kernels(self, monkeypatch):
        monkeypatch.setenv("SNAPPY_TPU_SCALAR_INTERPRET", "1")
        from snappy_tpu import engine

        payload = b"engine scalar path " * 40
        enc = engine.framed_compress(payload, backend="device")
        assert s.decode_framed(enc) == payload  # host/default decodes it
        out, reason = engine.framed_uncompress(enc, backend="device")
        assert reason == "ok" and out == payload

        raw = engine.raw_compress(payload, backend="device")
        assert s.decode(raw) == payload
        got, reason = engine.raw_uncompress(raw, backend="device")
        assert reason == "ok" and got == payload


class TestStreamingRawDecoder:
    """Windowed streaming raw decoder (ops/decode_stream.py), interpreter
    mode: multi-window RLE (pending copies across windows), comp-window
    refills, boundary sizes, malformed rejection."""

    def _roundtrip(self, payload):
        from snappy_tpu.ops import decode_stream

        enc = s.encode(payload)
        _, v = varint.decode_uint32(enc)
        out, reason = decode_stream.decode_raw_stream_bytes(
            enc[v:], len(payload), interpret=True
        )
        assert reason == "ok", (reason, len(payload))
        assert out == payload

    def test_multiwindow_rle(self):
        self._roundtrip(b"a" * 140_000)  # pending offset-1 copy across windows

    def test_multiwindow_text(self):
        self._roundtrip(
            (b"the quick brown fox jumps over the lazy dog. " * 4000)[:140_000]
        )

    def test_comp_refill_incompressible(self):
        # 100 KB random: compressed > the 76.8 KB comp window -> refill.
        self._roundtrip(bytes(random.Random(9).randbytes(100_000)))

    def test_single_giant_literal_tag(self):
        # ONE literal tag spanning multiple comp slices AND output
        # windows (adversarial-legal: no encoder emits it, every decoder
        # must take it): repeated pending-literal splits + resumes.
        # The 20 MB variant runs on hardware (round-5 session 2).
        from snappy_tpu.ops import decode_stream

        payload = bytes(random.Random(31).randbytes(400_000))
        body = bytearray()
        body.append((59 + 4) << 2)
        body += (len(payload) - 1).to_bytes(4, "little")
        body += payload
        out, reason = decode_stream.decode_raw_stream_bytes(
            bytes(body), len(payload), interpret=True, mode="grid"
        )
        assert reason == "ok" and out == payload

    def test_window_boundaries(self):
        for n in (65535, 65536, 65537, 131072):
            self._roundtrip(b"q" * n)

    def test_malformed_rejected(self):
        from snappy_tpu.ops import decode_stream

        good = s.encode(b"hello world hello world hello world hello")
        _, v = varint.decode_uint32(good)
        out, reason = decode_stream.decode_raw_stream_bytes(
            good[v:-3], 41, interpret=True
        )
        assert out is None and reason == "invalid"
        out, reason = decode_stream.decode_raw_stream_bytes(
            good[v:], 40, interpret=True
        )
        assert out is None and reason == "invalid"


    def test_stream_mutant_decisions_match_oracle(self):
        # Corrupted multi-window streams: accept/reject must match the
        # scalar oracle (and bytes when accepted).
        from snappy_tpu.ops import decode_stream

        payload = (b"windowed mutation fuzz payload " * 5000)[:140_000]
        enc = s.encode(payload)
        _, v = varint.decode_uint32(enc)
        base = enc[v:]
        rng = random.Random(41)
        for trial in range(6):
            b = bytearray(base)
            for _ in range(rng.randrange(1, 3)):
                b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
            mutant = bytes(b)
            ref_out, ref_err = oracle.decode_all_tags(mutant, len(payload))
            ref_ok = ref_err is None and len(ref_out) == len(payload)
            out, reason = decode_stream.decode_raw_stream_bytes(
                mutant, len(payload), interpret=True
            )
            assert (reason == "ok") == ref_ok, (trial, reason, ref_ok)
            if ref_ok:
                assert out == bytes(ref_out), trial


class TestGridStreamingDecoder:
    """Grid-mode streaming decoder (one pallas_call per stream,
    decode_stream.decode_raw_stream_grid): differential vs the scan-mode
    decoder, multi-slice windows on adversarial expansion streams, and the
    invalid-termination paths (stall guard / done-never-fires)."""

    def _both(self, body, declared):
        from snappy_tpu.ops import decode_stream

        g = decode_stream.decode_raw_stream_bytes(
            body, declared, interpret=True, mode="grid"
        )
        sc = decode_stream.decode_raw_stream_bytes(
            body, declared, interpret=True, mode="scan"
        )
        assert g == sc, (g[1], sc[1], declared)
        return g

    def test_grid_vs_scan_differential(self):
        rng = random.Random(21)
        text = (b"grid versus scan differential payload text " * 4000)
        for payload in (
            text[:65536],              # exactly one window
            text[:65537],
            text[:140_000],            # pending segments across windows
            bytes(rng.randbytes(90_000)),  # incompressible
            b"z" * 200_000,            # RLE pending copies
        ):
            enc = s.encode(payload)
            _, v = varint.decode_uint32(enc)
            out, reason = self._both(enc[v:], len(payload))
            assert reason == "ok" and out == payload

    def test_grid_adversarial_expansion(self):
        # 2 comp bytes per output byte: every window takes multiple comp
        # slices (the step budget term ceil(comp_len / G_MIN_SLICE)).
        from snappy_tpu.ops import decode_stream

        n = 150_000
        body = b"".join(bytes([0x00, i & 0xFF]) for i in range(n))
        want = bytes(bytearray((i & 0xFF) for i in range(n)))
        out, reason = decode_stream.decode_raw_stream_bytes(
            body, n, interpret=True, mode="grid"
        )
        assert reason == "ok" and out == want

    def test_grid_invalid_terminations(self):
        payload = (b"invalid termination payload " * 4000)[:100_000]
        enc = s.encode(payload)
        _, v = varint.decode_uint32(enc)
        body = enc[v:]
        # trailing garbage after a complete stream -> done never fires
        out, reason = self._both(body + b"\x00", len(payload))
        assert out is None and reason == "invalid"
        # truncated stream -> stall guard
        out, reason = self._both(body[:-5], len(payload))
        assert out is None and reason == "invalid"
        # declared larger than produced
        out, reason = self._both(body, len(payload) + 1)
        assert out is None and reason == "invalid"
        # declared smaller than produced (total output overrun check)
        out, reason = self._both(body, len(payload) - 1)
        assert out is None and reason == "invalid"

    def test_grid_mutant_decisions_match_scan(self):
        payload = (b"grid mutation differential " * 6000)[:150_000]
        enc = s.encode(payload)
        _, v = varint.decode_uint32(enc)
        base = enc[v:]
        rng = random.Random(77)
        for _ in range(6):
            b = bytearray(base)
            for _ in range(rng.randrange(1, 3)):
                b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
            self._both(bytes(b), len(payload))

    def test_grid_overflow_literal_rejected_mid_stream(self):
        """Length-extension int32 overflow (ext 0x7fffffff -> length
        wraps to INT_MIN) while more comp input remains: the `more` gate
        bypasses the pay_end checks, so only the explicit length < 0
        validation rejects it.  Regression: the grid kernels initially
        dropped that check, silently consumed the poisoned 5-byte header
        as a no-op, decoded the untouched remainder, and returned OK for
        a stream every other decoder rejects (verified: this test fails
        with that check removed)."""
        payload = bytes(random.Random(55).randbytes(120_000))
        enc = s.encode(payload)
        _, v = varint.decode_uint32(enc)
        # poison tag 0xFC = literal with 4-byte length extension, value
        # 0x7fffffff; prepended so the remainder is a valid stream — a
        # decoder that no-op-skips the poison reaches ok with the right
        # byte count, so only real validation catches it
        body = bytes([0xFC, 0xFF, 0xFF, 0xFF, 0x7F]) + enc[v:]
        out, reason = self._both(body, len(payload))
        assert out is None and reason == "invalid"


class TestLongLiteralDMAEmit:
    """The long-literal DMA emitter (ops/emit_long.py) activates only in
    high-ratio chunks (10n >= 7m): these streams are built by hand to hit
    each of its paths — rotate+head-merge, direct (phase-aligned),
    v<0 word-loop fallback — plus the gate-off word-loop case."""

    @staticmethod
    def _lit(data):
        n = len(data) - 1
        if n < 60:
            return bytes([n << 2]) + data
        if n < 256:
            return bytes([60 << 2, n]) + data
        return bytes([61 << 2]) + n.to_bytes(2, "little") + data

    @staticmethod
    def _copy2(off, ln):
        return bytes([((ln - 1) << 2) | 2]) + off.to_bytes(2, "little")

    def _check(self, body):
        want, err = oracle.decode_all_tags(body, 1 << 20)
        assert err is None
        meta, comp = decode_scalar.pack_chunks([body], [len(want)])
        out_w, status = decode_scalar.decode_chunks_words(
            meta, comp, 1, interpret=True)
        status = np.asarray(status)
        assert bool(status[0, 0, 0])
        got = decode_scalar.unpack_output(np.asarray(out_w),
                                          status[:, 0, 1])[0]
        assert got == bytes(want)

    def test_rotate_path_with_big_head(self):
        r = random.Random(11)
        body = self._lit(r.randbytes(4090)) + self._lit(r.randbytes(40000))
        self._check(body)

    def test_direct_path_phase_aligned(self):
        # after lit(4087)+copy2: pos=4093, w=4096 -> src 4096, dst
        # 4096-aligned: phase==0 and head==0 (the direct SMEM->SMEM arm)
        r = random.Random(12)
        body = (self._lit(r.randbytes(4087)) + self._copy2(100, 9)
                + self._lit(r.randbytes(40000)))
        self._check(body)

    def test_v_negative_wordloop_fallback(self):
        # 1-byte literal + 63 near copies inflate w to 4033 from pos 191:
        # the long literal's head (4033) exceeds its src -> v < 0 -> the
        # in-branch word-loop fallback
        r = random.Random(13)
        body = self._lit(b"a")
        for _ in range(63):
            body += self._copy2(1, 64)
        body += self._lit(r.randbytes(40000))
        self._check(body)

    def test_gate_off_low_ratio_chunk(self):
        # long literal inside a low-ratio chunk: 10n < 7m, so the plain
        # walk (word loop) handles it
        r = random.Random(14)
        body = self._lit(r.randbytes(5000))
        for _ in range(220):
            body += self._copy2(4000, 64)
        self._check(body)

    def test_many_long_literals_with_copies(self):
        r = random.Random(15)
        body = self._lit(r.randbytes(8000)) + self._copy2(500, 30)
        body += self._lit(r.randbytes(6000)) + self._copy2(4000, 64)
        body += self._lit(r.randbytes(12000)) + self._copy2(2, 17)
        body += self._lit(r.randbytes(9000))
        self._check(body)


class TestCopyRunCoalescing:
    """Runs of byte-identical max-length copy tags (the wire shape of
    long matches) coalesce into one emit in the low-ratio walk; these
    pin the coalescer against the oracle for near (pattern) and far
    (memcpy) offsets, window caps, and the gate-off case."""

    def _check_chunk(self, payload):
        body = _tag_stream(payload)
        meta, comp = decode_scalar.pack_chunks([body], [len(payload)])
        out_w, status = decode_scalar.decode_chunks_words(
            meta, comp, 1, interpret=True)
        status = np.asarray(status)
        assert bool(status[0, 0, 0])
        got = decode_scalar.unpack_output(np.asarray(out_w),
                                          status[:, 0, 1])[0]
        assert got == payload

    def test_rle_near_offset_run(self):
        self._check_chunk(b"\xab" * 50000)          # off-1 pattern run

    def test_rle_off2_and_off3_runs(self):
        self._check_chunk(b"ab" * 25000)
        self._check_chunk(b"abc" * 16000)

    def test_far_offset_run(self):
        # period-128 content: long matches at off=128 -> far-copy runs
        self._check_chunk((bytes(range(128)) * 400)[:48000])

    def test_run_interrupted_by_literals(self):
        r = random.Random(21)
        payload = (b"\x55" * 20000 + r.randbytes(200) + b"\x77" * 20000
                   + r.randbytes(64) + bytes(range(64)) * 300)
        self._check_chunk(payload)

    def test_grid_rle_and_far_runs(self):
        from snappy_tpu.ops import decode_stream
        for payload in (b"\xcd" * 300000,
                        (bytes(range(128)) * 2500)[:280000]):
            body = _tag_stream(payload)
            out, reason = decode_stream.decode_raw_stream_bytes(
                body, len(payload), mode="grid", interpret=True)
            assert reason == "ok" and out == payload

    def _check_body(self, body):
        want, err = oracle.decode_all_tags(body, 1 << 20)
        assert err is None
        meta, comp = decode_scalar.pack_chunks([body], [len(want)])
        out_w, status = decode_scalar.decode_chunks_words(
            meta, comp, 1, interpret=True)
        status = np.asarray(status)
        assert bool(status[0, 0, 0])
        got = decode_scalar.unpack_output(np.asarray(out_w),
                                          status[:, 0, 1])[0]
        assert got == bytes(want)

    def test_period_5_and_7_overlap_runs(self):
        # off in [4, 8): the carry_ok=False re-load funnel serves the
        # coalesced (arbitrarily long) eff for self-overlapping copies
        self._check_chunk(b"abcde" * 12000)
        self._check_chunk(b"abcdefg" * 8000)

    def test_varying_length_same_offset_run(self):
        # The general coalescer form: one same-offset run whose lengths
        # VARY (the geo.protodata/html wire shape, experiments/e28) —
        # not byte-identical tags.  Low-ratio by construction so the
        # runs walk is selected.
        r = random.Random(31)
        lit = TestLongLiteralDMAEmit._lit
        c2 = TestLongLiteralDMAEmit._copy2
        body = lit(r.randbytes(300))
        for i in range(600):
            body += c2(200, (7 * i) % 63 + 2)
        body += lit(r.randbytes(40))
        for i in range(200):
            body += c2(5000, (11 * i) % 60 + 4)
        self._check_body(body)

    def test_varying_length_run_grid_multiwindow(self):
        from snappy_tpu.ops import decode_stream
        r = random.Random(32)
        lit = TestLongLiteralDMAEmit._lit
        c2 = TestLongLiteralDMAEmit._copy2
        body = lit(r.randbytes(300))
        total = 300
        i = 0
        while total < 3 * 65536 + 7777:  # ~3 windows, runs cross caps
            ln = (13 * i) % 62 + 3
            body += c2(259, ln)
            total += ln
            i += 1
        want, err = oracle.decode_all_tags(body, 1 << 20)
        assert err is None
        out, reason = decode_stream.decode_raw_stream_bytes(
            body, len(want), mode="grid", interpret=True)
        assert reason == "ok" and out == bytes(want)

    def test_near_copy_at_stream_head(self):
        # valid near copies while w < 3: the fast loop's conservative
        # wrap-compare clamp flags them; the slow round must accept and
        # emit them exactly (hand-built: 1-byte literal + tiny copies)
        lit = TestLongLiteralDMAEmit._lit
        c2 = TestLongLiteralDMAEmit._copy2
        c1 = bytes([((4 - 4) << 2) | 1 | (0 << 5), 1])  # copy1 len4 off1
        for body in (
            lit(b"a") + c1,                              # w=1, off=1
            lit(b"ab") + c2(2, 6),                       # w=2, off=2
            lit(b"a") + c2(1, 2) + c2(3, 5),             # chained tiny
        ):
            self._check_body(body)

    def test_off2_fill_odd_parity(self):
        # a 1-byte prefix shifts the pattern-origin parity: the fill
        # word must follow the (dst - off) & 1 phase
        self._check_chunk(b"x" + b"ab" * 25000)
        self._check_chunk(b"xy" + b"ba" * 25000 + b"tail")

    def test_near_copies_at_window_boundaries(self):
        # near copies placed so their emission straddles 64 KiB window
        # boundaries: exercises the fast loop's conservative near exit
        # together with the split/pending machinery of the grid kernel
        from snappy_tpu.ops import decode_stream
        r = random.Random(61)
        parts = []
        total = 0
        while total < 2 * 65536 + 500:
            chunk = r.randbytes(r.randrange(40, 200))
            rep = b"zx"[: 1 + r.randrange(2)] * r.randrange(30, 300)
            parts += [chunk, rep]
            total += len(chunk) + len(rep)
        payload = b"".join(parts)
        body = _tag_stream(payload)
        out, reason = decode_stream.decode_raw_stream_bytes(
            body, len(payload), mode="grid", interpret=True)
        assert reason == "ok" and out == payload
        # and through the chunk kernel (per-64KiB chunks)
        self._check_chunk(payload[:65536])

    def test_grid_class_transitions(self):
        # text -> incompressible -> RLE -> text sections, multi-window
        # each: exercises the 3-state walk flag switching (with its
        # 1-window lag) and the deferred window flushes across modes
        from snappy_tpu.ops import decode_stream
        r = random.Random(33)
        text = (b"the quick brown fox jumps over the lazy dog. " * 40
                + b"she sells sea shells by the sea shore. " * 30)
        payload = (text * 60                       # ~2 windows of text
                   + r.randbytes(200000)           # ~3 windows incomp
                   + b"\x00" * 220000              # ~3 windows RLE
                   + text * 60)[: 8 * 65536 + 12345]
        body = _tag_stream(payload)
        out, reason = decode_stream.decode_raw_stream_bytes(
            body, len(payload), mode="grid", interpret=True)
        assert reason == "ok" and out == payload


class TestFarRunDMASelfCopy:
    """The emit_copy_dma arm: coalesced far-offset periodic runs with a
    granule-expressible period (power-of-two off <= 8192, or page
    multiples) bootstrap D - off bytes by the word loop and granule-DMA
    the rest at source distance D (scalar_emit.make_tag_dispatch)."""

    def _check_chunk(self, payload):
        body = _tag_stream(payload)
        meta, comp = decode_scalar.pack_chunks([body], [len(payload)])
        out_w, status = decode_scalar.decode_chunks_words(
            meta, comp, 1, interpret=True)
        status = np.asarray(status)
        assert bool(status[0, 0, 0])
        got = decode_scalar.unpack_output(np.asarray(out_w),
                                          status[:, 0, 1])[0]
        assert got == payload

    def _check_grid(self, payload):
        from snappy_tpu.ops import decode_stream
        body = _tag_stream(payload)
        out, reason = decode_stream.decode_raw_stream_bytes(
            body, len(payload), mode="grid", interpret=True)
        assert reason == "ok" and out == payload

    def _tile(self, period, seed, n):
        r = random.Random(seed)
        t = r.randbytes(period)
        return (t * (n // period + 1))[:n]

    def test_pow2_periods_chunk(self):
        # every power-of-two period in the DMA-eligible range, one 64 KiB
        # chunk each (eff crosses the 16 KiB gate mid-chunk)
        for period in (4, 8, 16, 128, 1024, 4096, 8192):
            self._check_chunk(self._tile(period, period, 60000))

    def test_non_pow2_period_stays_on_word_loop(self):
        # d_ok false: must decode via the carried-word funnel, unchanged
        for period in (100, 3000, 5000):
            self._check_chunk(self._tile(period, period, 60000))

    def test_page_multiple_offsets_chunk(self):
        # off = 12288 (3 pages): page-multiple arm, D = off, pre < 4096
        self._check_chunk(self._tile(12288, 7, 64000))

    def test_unaligned_run_starts(self):
        # random literal prefixes shift the run start across all 4096
        # phases the bootstrap must absorb
        r = random.Random(77)
        for pre_len in (1, 17, 4095, 4097, 12283):
            payload = r.randbytes(pre_len) + self._tile(128, 5, 50000)
            self._check_chunk(payload)

    def test_eff_around_dma_gate(self):
        # coalesced eff right around long_copy_t = 16384: both sides of
        # the gate, and a run short enough that pre eats most of it
        base = self._tile(256, 9, 300)
        for run_len in (16380, 16384, 16400, 12290, 20000):
            payload = base + self._tile(64, 11, run_len) + b"tailtail"
            self._check_chunk(payload)

    def test_grid_multiwindow_periodic(self):
        # periodic runs spanning several 64 KiB grid windows: window
        # resumes re-enter the DMA arm with history sources
        self._check_grid(self._tile(128, 13, 3 * 65536 + 12345))
        self._check_grid(self._tile(4096, 15, 4 * 65536 + 999))

    def test_grid_mixed_classes_with_periodic(self):
        r = random.Random(19)
        payload = (r.randbytes(30000)
                   + self._tile(512, 21, 90000)
                   + b"z" * 40000
                   + self._tile(8192, 23, 120000)
                   + r.randbytes(5000))
        self._check_grid(payload)
        self._check_chunk(payload[:65536])

    def test_oracle_parity_random_periods(self):
        # randomized periods/lengths vs the scalar oracle decisions
        r = random.Random(101)
        parts = []
        for _ in range(6):
            period = r.choice([4, 8, 100, 128, 2048, 4096, 6000, 8192])
            parts.append(self._tile(period, r.randrange(1 << 30),
                                    r.randrange(20000, 80000)))
            parts.append(r.randbytes(r.randrange(0, 300)))
        payload = b"".join(parts)
        body = _tag_stream(payload)
        want, err = oracle.decode_all_tags(body, 1 << 22)
        assert err is None and bytes(want) == payload
        self._check_grid(payload)


class TestRawBatchKernel:
    """Batched big-window raw decode (decode_raw_batch_words): the
    multi-stream entry behind api.decode_batch (round-5 VERDICT item 5)."""

    def test_batch_matches_oracle(self):
        payloads = [
            b"batch stream " * 40,
            b"q" * 3000,                      # RLE
            bytes(random.Random(3).randbytes(1200)),  # incompressible
            b"",                              # declared 0 slot (padding)
            (b"ab" * 900),
        ]
        bodies, decls = [], []
        for p in payloads:
            bodies.append(_tag_stream(p) if p else b"")
            decls.append(len(p))
        meta, comp = decode_scalar.pack_raw_batch(bodies, decls)
        out_w, status = decode_scalar.decode_raw_batch_words(
            meta, comp, len(bodies), interpret=True
        )
        status = np.asarray(status)
        out_b = np.ascontiguousarray(np.asarray(out_w)).view(np.uint8)
        for k, p in enumerate(payloads):
            if p:
                assert status[k, 0, 0] == 1 and status[k, 0, 1] == len(p)
                assert out_b[k, 0, : len(p)].tobytes() == p

    def test_batch_isolates_malformed_stream(self):
        good = b"isolated good stream " * 30
        bad_body = b"\xff"  # truncated tagCopy4
        bodies = [_tag_stream(good), bad_body, _tag_stream(good)]
        decls = [len(good), 100, len(good)]
        meta, comp = decode_scalar.pack_raw_batch(bodies, decls)
        out_w, status = decode_scalar.decode_raw_batch_words(
            meta, comp, 3, interpret=True
        )
        status = np.asarray(status)
        out_b = np.ascontiguousarray(np.asarray(out_w)).view(np.uint8)
        assert status[0, 0, 0] == 1 and status[2, 0, 0] == 1
        assert status[1, 0, 0] == 0
        assert out_b[0, 0, : len(good)].tobytes() == good
        assert out_b[2, 0, : len(good)].tobytes() == good


class TestLevel2Kernel:
    """Device level-2 encoder (two-entry FIFO buckets): byte parity with
    the host C level-2 matcher, density no worse than level 1 on
    compressible corpus data (round-5 VERDICT item 7)."""

    def _host_l2(self, block):
        from snappy_tpu.ops import host_codec

        if not host_codec.available():
            pytest.skip("native lib unavailable")
        enc = host_codec.raw_compress(block, level=2)
        _, v = varint.decode_uint32(enc)
        return enc[v:]

    def test_byte_parity_with_host_l2(self):
        from snappy_tpu.testing import corpus

        if corpus.corpus_root() is None:
            pytest.skip("corpus unavailable")
        blocks = []
        for name in ("html", "geo.protodata", "asyoulik.txt"):
            data = corpus.read_data(name)
            blocks.append(data[:65536])
            blocks.append(data[65536:131072] or data[:30000])
        blocks.append(b"q" * 50000)               # RLE long-match path
        blocks.append(bytes(random.Random(7).randbytes(20000)))
        meta, inw = encode_scalar.pack_blocks(blocks)
        enc_w, elen = encode_scalar.encode_blocks_words(
            meta, inw, len(blocks), interpret=True, level=2
        )
        encs = encode_scalar.unpack_enc(
            np.asarray(enc_w), np.asarray(elen)[:, 0, 0]
        )
        for k, blk in enumerate(blocks):
            assert encs[k] == self._host_l2(blk), f"block {k} != host l2"

    def test_l2_not_larger_on_corpus(self):
        from snappy_tpu.testing import corpus

        if corpus.corpus_root() is None:
            pytest.skip("corpus unavailable")
        data = corpus.read_data("html")
        blocks = [data[:65536]]
        meta, inw = encode_scalar.pack_blocks(blocks)
        sizes = {}
        for lvl in (1, 2):
            _, elen = encode_scalar.encode_blocks_words(
                meta, inw, 1, interpret=True, level=lvl
            )
            sizes[lvl] = int(np.asarray(elen)[0, 0, 0])
        assert sizes[2] <= sizes[1]

    def test_l2_roundtrip(self):
        payload = (b"level two round trip " * 700)[:14000]
        import snappy_tpu as s
        from snappy_tpu.testing import oracle

        blocks = [payload]
        meta, inw = encode_scalar.pack_blocks(blocks)
        enc_w, elen = encode_scalar.encode_blocks_words(
            meta, inw, 1, interpret=True, level=2
        )
        body = encode_scalar.unpack_enc(
            np.asarray(enc_w), np.asarray(elen)[:, 0, 0]
        )[0]
        enc = varint.encode_uint32(len(payload)) + body
        assert s.decode(enc) == payload
        dec, err = oracle.uncompress(enc)
        assert err is None and dec == payload
