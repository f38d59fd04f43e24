"""Completeness tests: stream concatenation, bucket boundaries, CLI,
config/backend surface, length-math guards."""

import random
import subprocess
import sys

import pytest

import snappy_tpu as s
from snappy_tpu import config, engine
from snappy_tpu.formats import constants as C


class TestStreamConcatenation:
    def test_framed_streams_concatenate(self):
        """Framed streams may be concatenated; the embedded extra stream
        headers are skippable chunks (framing_format.txt:74-78)."""
        a = b"first stream " * 100
        b = b"second stream " * 200
        enc = s.encode_framed(a) + s.encode_framed(b)
        assert s.decode_framed(enc) == a + b
        assert s.uncompressed_len_framed(enc) == len(a) + len(b)

    def test_three_way_concatenation_host_and_device(self):
        parts = [b"x" * 70000, b"", b"tail" * 10]
        enc = b"".join(s.encode_framed(p) for p in parts)
        for backend in ("host", "device"):
            out, reason = engine.framed_uncompress(enc, backend=backend)
            assert reason == "ok" and out == b"".join(parts)


class TestBucketBoundaries:
    """Engine pads to power-of-two buckets; exercise the seams."""

    @pytest.mark.parametrize("n", [4095, 4096, 4097, 8192, 12289])
    def test_device_bucket_seams(self, n):
        rng = random.Random(n)
        payload = bytes(rng.getrandbits(8) for _ in range(n // 2))
        payload += (b"seam " * n)[: n - len(payload)]
        enc = engine.raw_compress(payload, backend="device")
        out, reason = engine.raw_uncompress(enc, backend="device")
        assert reason == "ok" and out == payload

    def test_block_count_bucket_seams(self):
        # 2 -> 3 blocks crosses the nb pow2 pad boundary
        for nb in [1, 2, 3, 5]:
            payload = b"Q" * (nb * C.MAX_BLOCK_LEN - 7)
            enc = engine.raw_compress(payload, backend="device")
            out, reason = engine.raw_uncompress(enc, backend="device")
            assert reason == "ok" and out == payload


class TestConfig:
    def test_backend_roundtrip(self):
        orig = config.get_backend()
        try:
            for b in ("device", "host", "auto"):
                config.set_backend(b)
                assert config.get_backend() == b
                assert config.resolve_backend() in ("device", "host")
        finally:
            config.set_backend(orig)

    def test_invalid_backend(self):
        with pytest.raises(ValueError):
            config.set_backend("gpu")


class TestCli:
    def test_roundtrip_via_cli(self, tmp_path):
        src = tmp_path / "payload.bin"
        data = b"cli roundtrip data " * 500
        src.write_bytes(data)
        env = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin", "HOME": str(tmp_path)}
        r = subprocess.run(
            [sys.executable, "-m", "snappy_tpu.cli", "-v", str(src)],
            capture_output=True,
            cwd="/root/repo",
            env=env,
        )
        assert r.returncode == 0, r.stderr.decode()
        sz = tmp_path / "payload.bin.sz"
        assert sz.exists()
        r = subprocess.run(
            [
                sys.executable,
                "-m",
                "snappy_tpu.cli",
                "-d",
                str(sz),
                "-o",
                str(tmp_path / "out.bin"),
            ],
            capture_output=True,
            cwd="/root/repo",
            env=env,
        )
        assert r.returncode == 0, r.stderr.decode()
        assert (tmp_path / "out.bin").read_bytes() == data

    def test_cli_decodes_external_sz(self, tmp_path):
        """The snzip-compat claim (cli.py docstring): a framed .sz stream
        produced by external snappy tooling (the reference corpus's
        pre-compressed streams) must decode via the CLI."""
        from snappy_tpu.testing import corpus

        if corpus.corpus_root() is None:
            pytest.skip("reference corpus not available")
        sz = tmp_path / "alice.sz"
        sz.write_bytes(corpus.read_stream("alice29.txt.sz-64k"))
        env = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
               "HOME": str(tmp_path)}
        r = subprocess.run(
            [sys.executable, "-m", "snappy_tpu.cli", "-d", str(sz),
             "-o", str(tmp_path / "alice.txt")],
            capture_output=True,
            cwd="/root/repo",
            env=env,
        )
        assert r.returncode == 0, r.stderr.decode()
        assert (tmp_path / "alice.txt").read_bytes() == corpus.read_data(
            "alice29.txt")

    def test_cli_rejects_malformed(self, tmp_path):
        bad = tmp_path / "bad.sz"
        bad.write_bytes(C.FRAMING_HEADER + b"\x00\x10\x00\x00garbage!")
        r = subprocess.run(
            [sys.executable, "-m", "snappy_tpu.cli", "-d", str(bad)],
            capture_output=True,
            cwd="/root/repo",
            env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin", "HOME": str(tmp_path)},
        )
        assert r.returncode == 1


class TestGuards:
    def test_decode_max_size_zero(self):
        enc = s.encode(b"hello")
        assert s.decode(enc, max_size=0) == b""

    def test_framed_max_size(self):
        payload = b"p" * 100_000
        enc = s.encode_framed(payload)
        out, reason = engine.framed_uncompress(enc, max_size=50_000)
        assert out is None and reason == "too_large"

    def test_compress_framed_into(self):
        payload = b"framed into " * 100
        buf = bytearray(C.max_compressed_len_framed(len(payload)))
        res = s.compress_framed_into(payload, buf)
        assert res.is_ok()
        assert s.decode_framed(bytes(buf[: res.unwrap()])) == payload

    def test_compress_framed_into_too_small(self):
        res = s.compress_framed_into(b"x" * 1000, bytearray(10))
        assert res.is_err() and res.error == s.FrameError.buffer_too_small

    def test_compression_levels(self):
        """level 2 is never larger on compressible data and round-trips
        everywhere (host backend feature beyond the reference)."""
        from snappy_tpu.ops import host_codec
        from snappy_tpu.testing import corpus as corp, oracle

        if not host_codec.available():
            pytest.skip("native host codec unavailable")
        data = corp.read_data("alice29.txt") or (b"level test data " * 5000)
        e1 = s.encode(data)
        e2 = s.encode(data, level=2)
        assert len(e2) <= len(e1)
        assert s.decode(e1) == data and s.decode(e2) == data
        dec, err = oracle.uncompress(e2)
        assert err is None and dec == data
        f2 = s.encode_framed(data, level=2)
        assert s.decode_framed(f2) == data

    @pytest.mark.parametrize(
        "n_frames", [1, 15, 16, 17, 33]
    )  # straddles the 16-frame slab span
    def test_compress_framed_into_matches_bytes_api(self, n_frames):
        from snappy_tpu.ops import host_codec

        if not host_codec.available():
            pytest.skip("native host codec unavailable")
        n = n_frames * C.MAX_BLOCK_LEN - 11
        payload = (b"span boundary " * (n // 14 + 1))[:n]
        ref = engine.framed_compress(payload, backend="host")
        buf = bytearray(C.max_compressed_len_framed(n))
        res = s.compress_framed_into(payload, buf)
        assert res.is_ok()
        assert bytes(buf[: res.unwrap()]) == ref
