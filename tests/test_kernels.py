"""Device-kernel tests: parallel decoder and encoder vs the scalar oracle.

Differential strategy mirrors the reference suite (SURVEY §4): golden-file
decode anchors the decoder to C++ snappy's actual output; random and corpus
round-trips cross-validate the parallel kernels against the sequential
oracle; every malformed vector must be rejected by the kernel too.
"""

import random

import numpy as np
import pytest

import jax.numpy as jnp

from snappy_tpu.formats import varint
from snappy_tpu.ops import decode_jax, encode_jax
from snappy_tpu.testing import corpus, oracle

from test_oracle import MALFORMED_RAW


def _pad_to(n, quantum=128):
    return max(quantum, -(-n // quantum) * quantum)


def jax_decode_tagstream(body: bytes, declared: int):
    arr = np.frombuffer(body, dtype=np.uint8).astype(np.int32)
    c_pad = _pad_to(len(body))
    comp = np.zeros(c_pad, np.int32)
    comp[: len(body)] = arr
    u_pad = _pad_to(declared)
    out, ok, written = decode_jax.decode_raw(
        jnp.asarray(comp), jnp.int32(len(body)), jnp.int32(declared), u_pad
    )
    return bytes(np.asarray(out)[:declared].astype(np.uint8)), bool(ok), int(written)


def jax_decode_raw_stream(enc: bytes):
    """Full raw stream: varint header + tag stream."""
    declared, read = varint.decode_uint64(enc)
    if declared is None or declared > 0xFFFFFFFF:
        return None, False
    out, ok, _ = jax_decode_tagstream(enc[read:], declared)
    return out, ok


def jax_encode_block(data: bytes) -> bytes:
    assert len(data) <= 65536
    b = 1 << max(7, (len(data) - 1).bit_length() if data else 7)
    blk = np.zeros(b, np.int32)
    blk[: len(data)] = np.frombuffer(data, np.uint8)
    max_comp = b + b // 6 + 64
    out, tot = encode_jax.encode_blocks(
        jnp.asarray(blk)[None], jnp.asarray([len(data)], jnp.int32), max_comp
    )
    return bytes(np.asarray(out)[0][: int(tot[0])].astype(np.uint8))


PAYLOADS = [
    b"a",
    b"ab",
    b"abc",
    b"aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",  # RLE / overlapping copies
    b"hello world hello world hello world",
    bytes(range(256)) * 3,
    b"the quick brown fox jumps over the lazy dog " * 30,
    b"\x00" * 5000,
]


class TestDecodeKernel:
    @pytest.mark.parametrize("i", range(len(PAYLOADS)))
    def test_oracle_encode_jax_decode(self, i):
        payload = PAYLOADS[i]
        enc = oracle.compress(payload)
        out, ok = jax_decode_raw_stream(enc)
        assert ok and out == payload

    def test_golden_rawsnappy(self, corpus_root):
        gold = corpus.read_data(corpus.GOLDEN_RAWSNAPPY)
        ref, err = oracle.uncompress(gold)
        assert err is None
        out, ok = jax_decode_raw_stream(gold)
        assert ok and out == ref

    @pytest.mark.parametrize("idx", range(len(MALFORMED_RAW)))
    def test_malformed_rejected(self, idx):
        data = MALFORMED_RAW[idx]
        declared, read = varint.decode_uint64(data)
        if declared is None or declared > 0xFFFFFFFF:
            return  # rejected before the kernel by the varint layer
        _, ok, _ = jax_decode_tagstream(data[read:], declared)
        assert not ok, f"vector {idx} wrongly accepted by kernel"

    @pytest.mark.parametrize("name", corpus.BAD_FILES)
    def test_baddata_rejected(self, corpus_root, name):
        data = corpus.read_data(name)
        out, ok = jax_decode_raw_stream(data)
        assert out is None or not ok

    def test_random_streams_agree_with_oracle(self):
        """Arbitrary bytes fed as a tag stream: accept/reject and bytes must
        match the sequential decoder (fuzz-differential, cf. the reference's
        fuzz_block_format.nim)."""
        rng = random.Random(7)
        for _ in range(40):
            n = rng.randrange(1, 200)
            body = bytes(rng.getrandbits(8) for _ in range(n))
            declared = rng.choice([0, 1, n // 2, n, n * 2])
            ref_out, ref_err = oracle.decode_all_tags(body, declared)
            ref_ok = ref_err is None and len(ref_out) == declared
            out, ok, written = jax_decode_tagstream(body, declared)
            assert ok == ref_ok, (body.hex(), declared, ok, ref_ok)
            if ok:
                assert out == bytes(ref_out)


class TestEncodeKernel:
    @pytest.mark.parametrize("i", range(len(PAYLOADS)))
    def test_roundtrip_via_oracle_decoder(self, i):
        payload = PAYLOADS[i]
        enc = jax_encode_block(payload)
        dec, err = oracle.decode_all_tags(enc, len(payload))
        assert err is None and bytes(dec) == payload

    @pytest.mark.parametrize("i", range(len(PAYLOADS)))
    def test_roundtrip_via_jax_decoder(self, i):
        payload = PAYLOADS[i]
        enc = jax_encode_block(payload)
        out, ok, written = jax_decode_tagstream(enc, len(payload))
        assert ok and out == payload

    def test_size_no_worse_than_oracle(self):
        rng = random.Random(11)
        for _ in range(10):
            n = rng.randrange(100, 8000)
            word = bytes(rng.getrandbits(8) for _ in range(rng.randrange(2, 20)))
            payload = (word * (n // len(word) + 1))[:n]
            ours = jax_encode_block(payload)
            ref = oracle.encode_block(payload)
            dec, err = oracle.decode_all_tags(ours, len(payload))
            assert err is None and bytes(dec) == payload
            assert len(ours) <= len(ref) + 2, (n, len(ours), len(ref))

    def test_corpus_block_size_contract(self, corpus_root):
        """On a real corpus block: decode-exact and no larger than the
        reference greedy algorithm's output."""
        data = corpus.read_data("html")[:65536]
        ours = jax_encode_block(data)
        ref = oracle.encode_block(data)
        dec, err = oracle.decode_all_tags(ours, len(data))
        assert err is None and bytes(dec) == data
        assert len(ours) <= len(ref)

    def test_incompressible_no_blowup(self):
        rng = np.random.default_rng(3)
        payload = rng.integers(0, 256, 4096, dtype=np.uint8).tobytes()
        enc = jax_encode_block(payload)
        # worst case bound minus varint slack
        assert len(enc) <= 32 + len(payload) + len(payload) // 6
        dec, err = oracle.decode_all_tags(enc, len(payload))
        assert err is None and bytes(dec) == payload
