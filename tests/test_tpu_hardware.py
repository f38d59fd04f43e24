"""Opt-in on-hardware smoke tests for the compiled scalar-core kernels.

The regular suite runs everything through the Pallas interpreter on CPU
(tests/conftest.py pins the CPU backend — the TPU tunnel supports one
client).  Set ``SNAPPY_TPU_TPU_TESTS=1`` and run this file in its own
process on the TPU VM to exercise the Mosaic-compiled kernels on the real
chip:

    SNAPPY_TPU_TPU_TESTS=1 python -m pytest tests/test_tpu_hardware.py -q

(The broader hardware validation lives in experiments/e4, e11, e13 — this
file is the quick regression.)
"""

import os

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("SNAPPY_TPU_TPU_TESTS") != "1",
    reason="set SNAPPY_TPU_TPU_TESTS=1 (and run outside the CPU-pinned suite)",
)


@pytest.fixture(scope="module")
def tpu():
    import jax

    dev = jax.devices()[0]
    if not (dev.platform in ("tpu", "axon") or "TPU" in str(dev)):
        pytest.skip("no TPU device")
    return dev


def test_chunk_roundtrip_on_chip(tpu):
    import numpy as np

    import snappy_tpu as s
    from snappy_tpu.formats import varint
    from snappy_tpu.ops import decode_scalar, encode_scalar
    from snappy_tpu.testing import corpus

    data = corpus.read_data("html") or (b"hardware smoke " * 4000)
    blocks = [data[:65536], data[65536:131072]]

    meta, inw = encode_scalar.pack_blocks(blocks)
    enc_w, elen = encode_scalar.encode_blocks_words(meta, inw, 2, False)
    elens = np.asarray(elen)[:, 0, 0]
    encs = encode_scalar.unpack_enc(np.asarray(enc_w), elens)

    dmeta, dcomp = decode_scalar.pack_chunks(encs, [len(b) for b in blocks])
    out_w, st = decode_scalar.decode_chunks_words(dmeta, dcomp, 2, False)
    st = np.asarray(st)
    outs = decode_scalar.unpack_output(np.asarray(out_w), st[:, 0, 1])
    for k, b in enumerate(blocks):
        assert bool(st[k, 0, 0]) and outs[k] == b, k

    # cross-check against the host/default path
    full = varint.encode_uint32(len(blocks[0])) + encs[0]
    assert s.decode(full) == blocks[0]


def test_malformed_rejected_on_chip(tpu):
    """The compiled kernel must *reject* malformed input, not trap.

    Regression: a malformed tagCopy4 offset is an arbitrary 32-bit value;
    before the src clamp in decode_scalar.tag_step, baddata3.snappy drove
    an SMEM read far out of bounds and the chip raised INTERNAL (the
    interpreter clamps indices, so only hardware catches this class).
    """
    import snappy_tpu as s
    from snappy_tpu import config
    from snappy_tpu.testing import corpus

    prev = config.get_backend()
    config.set_backend("device")
    try:
        for name in corpus.BAD_FILES:
            data = corpus.read_data(name)
            if data is None:
                pytest.skip("corpus not mounted")
            assert s.decode(data) == b"", name
    finally:
        config.set_backend(prev)


def test_stream_decode_on_chip(tpu):
    import snappy_tpu as s
    from snappy_tpu.formats import varint
    from snappy_tpu.ops import decode_stream

    payload = (b"on-chip streaming smoke " * 12000)[:250_000]
    enc = s.encode(payload)
    _, v = varint.decode_uint32(enc)
    out, reason = decode_stream.decode_raw_stream_bytes(
        enc[v:], len(payload), interpret=False
    )
    assert reason == "ok" and out == payload


def test_level2_parity_on_chip(tpu):
    import numpy as np

    from snappy_tpu.formats import varint
    from snappy_tpu.ops import encode_scalar, host_codec
    from snappy_tpu.testing import corpus

    if not host_codec.available():
        pytest.skip("native lib unavailable")
    data = corpus.read_data("geo.protodata") or (b"lvl2 hw " * 9000)
    blocks = [data[:65536], b"q" * 40000]
    meta, inw = encode_scalar.pack_blocks(blocks)
    enc_w, elen = encode_scalar.encode_blocks_words(
        meta, inw, 2, False, level=2
    )
    encs = encode_scalar.unpack_enc(
        np.asarray(enc_w), np.asarray(elen)[:, 0, 0]
    )
    for k, blk in enumerate(blocks):
        ref = host_codec.raw_compress(blk, level=2)
        _, v = varint.decode_uint32(ref)
        assert encs[k] == ref[v:], f"block {k}: device l2 != host l2"


def test_far_copy_stream_on_chip(tpu):
    import random

    from snappy_tpu.ops import decode_stream

    rng = random.Random(99)
    base = bytes(rng.randrange(256) for _ in range(180_000))
    body = bytearray()
    for i in range(0, len(base), 60_000):
        seg = base[i : i + 60_000]
        body += bytes([61 << 2]) + (len(seg) - 1).to_bytes(2, "little") + seg
    exp = bytearray(base)
    for off, ln in ((170_001, 64), (131_073, 17), (100_000 + 65_537, 40)):
        body += bytes(
            [3 | ((ln - 1) << 2), off & 255, (off >> 8) & 255,
             (off >> 16) & 255, (off >> 24) & 255]
        )
        st = len(exp) - off
        for i in range(ln):
            exp.append(exp[st + i])
    out, reason = decode_stream.decode_raw_stream_bytes(
        bytes(body), len(exp), interpret=False, mode="grid"
    )
    assert reason == "ok" and out == bytes(exp)


def test_decode_batch_routes_on_chip(tpu):
    """Both decode_batch slab routes (chunk-shaped for <= 64 KiB streams,
    big-window above) on the compiled kernels, plus the boundary pair."""
    from snappy_tpu import engine

    payloads = [
        (b"hw batch route " * 5000)[:65536],   # chunk route, at the edge
        (b"hw batch route " * 5000)[:65537],   # first big-window stream
        b"z" * 40_000,                          # chunk route, RLE
        (b"mixed hw " * 12000)[:100_000],       # big window
    ]
    encs = [engine.raw_compress(p, backend="host") for p in payloads]
    res = engine.raw_uncompress_batch(encs, backend="device")
    assert [r[0] for r in res] == payloads
    assert all(r[1] == "ok" for r in res)


def test_periodic_run_decode_on_chip(tpu):
    """Far-offset periodic runs (emit_copy_dma self-copy arm): page
    duplicates and power-of-two periods must decode bit-exactly through
    the compiled grid kernel (rates measured in e38)."""
    import numpy as np

    from snappy_tpu import engine

    rng = np.random.default_rng(17)
    for period in (8, 128, 4096):
        pat = rng.integers(0, 256, period, np.uint8).tobytes()
        payload = (pat * (1_500_000 // period + 1))[:1_500_000]
        enc = engine.raw_compress(payload, backend="host")
        out, reason = engine.raw_uncompress(enc, backend="device")
        assert reason == "ok" and out == payload, f"period {period}"


def test_farcopy_placement_battery_on_chip(tpu):
    """Six random window-straddling far-copy streams (fixed seed, the
    e43 generator shape): grid far service + pending resume on the
    compiled kernel.  The full 50-stream battery lives in
    experiments/e43_hw_farcopy_placement.py."""
    import random

    from snappy_tpu import engine
    from snappy_tpu.formats import varint
    from snappy_tpu.testing import oracle

    rng = random.Random(424242)
    for _ in range(6):
        out = bytearray()
        body = bytearray()

        def lit(data):
            n = len(data)
            if n - 1 < 60:
                body.append((n - 1) << 2)
            else:
                ext = ((n - 1).bit_length() + 7) // 8
                body.append((59 + ext) << 2)
                body.extend((n - 1).to_bytes(ext, "little"))
            body.extend(data)
            out.extend(data)

        def copy(off, ln):
            while ln >= 4:
                c = min(ln, 64)
                body.append(((c - 1) << 2) | 3)
                body.extend(off.to_bytes(4, "little"))
                start = len(out) - off
                for i in range(c):
                    out.append(out[start + i])
                ln -= c

        lit(bytes(rng.getrandbits(8) for _ in range(rng.randrange(90_000, 140_000))))
        for _ in range(rng.randrange(30, 80)):
            if rng.random() < 0.5:
                copy(rng.randrange(65_537, len(out)), rng.randrange(4, 300))
            else:
                lit(bytes(rng.getrandbits(8)
                          for _ in range(rng.randrange(1, 3000))))
            if rng.random() < 0.3:
                to_b = (-len(out)) % 65536
                if 0 < to_b < 2000:
                    lit(b"\x55" * to_b)
        enc = varint.encode_uint32(len(out)) + bytes(body)
        ref, err = oracle.uncompress(enc)
        assert err is None and ref == bytes(out)
        dev, reason = engine.raw_uncompress(enc, backend="device")
        assert reason == "ok" and dev == bytes(out)
