"""Multi-host layer tests: real two-process jax.distributed run on CPU.

The closest a single machine gets to the multi-host story (BASELINE
config 5): two OS processes with distinct jax process ids, coordinated via
a local coordinator, each compressing its span; the assembled stream must
be one valid framed stream decoding to the concatenated payload.
"""

import socket
import subprocess
import sys
import textwrap

import pytest

import snappy_tpu as s

WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from snappy_tpu.parallel import multihost

    coord, pid = sys.argv[1], int(sys.argv[2])
    multihost.initialize(coordinator_address=coord, num_processes=2, process_id=pid)

    payload = b"".join(bytes([i & 0xFF]) * 997 for i in range(300))  # ~300 KB
    span = len(payload) // (2 * 65536) * 65536
    local = payload[:span] if pid == 0 else payload[span:]

    blob, off, total = multihost.compress_framed_span(local)
    out = sys.argv[3]
    with open(f"{out}/span_{pid}", "wb") as f:
        f.write(blob)
    with open(f"{out}/meta_{pid}", "w") as f:
        f.write(f"{off} {total}")
    """
)


def _free_port():
    with socket.socket() as sock:
        sock.bind(("localhost", 0))
        return sock.getsockname()[1]


def test_two_process_framed_compress(tmp_path):
    port = _free_port()
    coord = f"localhost:{port}"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, coord, str(pid), str(tmp_path)],
            cwd="/root/repo",
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env={
                "PATH": "/usr/bin:/bin",
                "HOME": str(tmp_path),
                "JAX_PLATFORMS": "cpu",
            },
        )
        for pid in (0, 1)
    ]
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        assert p.returncode == 0, err.decode()[-2000:]

    from snappy_tpu.formats import constants as C

    span0 = (tmp_path / "span_0").read_bytes()
    span1 = (tmp_path / "span_1").read_bytes()
    off0, total = map(int, (tmp_path / "meta_0").read_text().split())
    off1, total1 = map(int, (tmp_path / "meta_1").read_text().split())
    assert total == total1
    assert off0 == len(C.FRAMING_HEADER)
    assert off1 == off0 + len(span0)
    assert total == off1 + len(span1)

    stream = C.FRAMING_HEADER + span0 + span1
    payload = b"".join(bytes([i & 0xFF]) * 997 for i in range(300))
    assert s.decode_framed(stream) == payload


def test_single_process_span_api():
    """The span API degrades gracefully to one process."""
    from snappy_tpu.formats import constants as C
    from snappy_tpu.parallel import multihost

    payload = b"single process span " * 2000
    blob, off, total = multihost.compress_framed_span(payload)
    assert off == len(C.FRAMING_HEADER) and total == off + len(blob)
    stream = C.FRAMING_HEADER + blob
    assert s.decode_framed(stream) == payload

    out, out_off, total_out, reason = multihost.uncompress_framed_span(stream)
    assert reason == "ok" and out_off == 0 and total_out == len(payload)
    assert out == payload
