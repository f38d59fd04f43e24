"""Mutation fuzzing: corrupt valid streams, all decoders must agree.

Extends the reference's fuzz strategy (SURVEY §4.5) with structured
mutations of *valid* streams: every mutant must produce the same
accept/reject decision — and identical bytes when accepted — across the
host C decoder, the device kernel decoder, and the scalar oracle."""

import os
import random

import pytest

import snappy_tpu as s
from snappy_tpu import engine
from snappy_tpu.ops import host_codec
from snappy_tpu.testing import oracle

_SCALE = max(1, int(os.environ.get("SNAPPY_TPU_FUZZ_EXAMPLES", "30")) // 30)


def _payload(rng, n):
    word = bytes(rng.getrandbits(8) for _ in range(rng.randrange(2, 17)))
    rep = (word * (n // len(word) + 1))[: n // 2]
    tail = bytes(rng.getrandbits(8) for _ in range(n - len(rep)))
    return rep + tail


def _mutate(rng, data: bytes) -> bytes:
    b = bytearray(data)
    op = rng.randrange(4)
    if op == 0 and len(b) > 1:  # flip a byte
        b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
    elif op == 1 and len(b) > 2:  # truncate
        del b[rng.randrange(1, len(b)) :]
    elif op == 2:  # insert garbage
        pos = rng.randrange(len(b) + 1)
        b[pos:pos] = bytes(rng.getrandbits(8) for _ in range(rng.randrange(1, 4)))
    else:  # duplicate a slice
        if len(b) > 4:
            lo = rng.randrange(len(b) - 2)
            hi = min(len(b), lo + rng.randrange(1, 8))
            b[hi:hi] = b[lo:hi]
    return bytes(b)


@pytest.mark.skipif(not host_codec.available(), reason="no native codec")
class TestRawMutationDifferential:
    def test_mutants_agree(self):
        rng = random.Random(2024)
        for trial in range(150 * _SCALE):
            payload = _payload(rng, rng.randrange(30, 600))
            enc = s.encode(payload)
            mutant = _mutate(rng, enc)
            ref, ref_err = oracle.uncompress(mutant)
            host, h_reason = engine.raw_uncompress(mutant, backend="host")
            dev, d_reason = engine.raw_uncompress(mutant, backend="device")
            if ref_err is None:
                assert host == ref, f"trial {trial}: host differs"
                assert dev == ref, f"trial {trial}: device differs"
            else:
                assert host is None, f"trial {trial}: host accepted invalid"
                assert dev is None, f"trial {trial}: device accepted invalid"


@pytest.mark.skipif(not host_codec.available(), reason="no native codec")
class TestFramedMutationDifferential:
    def test_mutants_agree(self):
        rng = random.Random(77)
        for trial in range(60 * _SCALE):
            payload = _payload(rng, rng.randrange(100, 3000))
            enc = s.encode_framed(payload)
            mutant = _mutate(rng, enc)
            host, h_reason = engine.framed_uncompress(mutant, backend="host")
            dev, d_reason = engine.framed_uncompress(mutant, backend="device")
            assert (host is None) == (dev is None), (
                f"trial {trial}: host={h_reason} device={d_reason}"
            )
            if host is not None:
                assert host == dev, f"trial {trial}: payload mismatch"


@pytest.mark.skipif(not host_codec.available(), reason="no native codec")
class TestBatchMutationDifferential:
    """decode_batch is a distinct engine path (chunk-slab / big-window
    split + per-slab packing, engine.raw_uncompress_batch): its verdicts
    and bytes must match per-stream decode on BOTH backends for mutants
    of valid streams mixed with valid ones."""

    def test_batch_matches_singles(self):
        rng = random.Random(4099)
        for trial in range(12 * _SCALE):
            encs = []
            for _ in range(rng.randrange(2, 7)):
                payload = _payload(rng, rng.randrange(10, 3000))
                enc = s.encode(payload)
                if rng.random() < 0.5:
                    enc = _mutate(rng, enc)
                encs.append(enc)
            for bk in ("host", "device"):
                singles = [engine.raw_uncompress(e, backend=bk) for e in encs]
                batch = engine.raw_uncompress_batch(encs, backend=bk)
                for k, (sg, bt) in enumerate(zip(singles, batch)):
                    assert (sg[0] is None) == (bt[0] is None), (
                        f"trial {trial} stream {k} {bk}: "
                        f"single={sg[1]} batch={bt[1]}"
                    )
                    assert sg[0] == bt[0], f"trial {trial} stream {k} {bk}"
