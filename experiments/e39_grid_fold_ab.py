"""E39: A/B for folding the grid fast loop's input-overrun checks into
one unsigned-wrap compare (the chunk kernel's parse_validate shape).

The grid fast_step previously computed `pay_end` and tested literals
(`pay_end > navail`) and copies (`pos + hdr > navail`) separately —
~5 ops/tag over the chunk loop, a candidate explanation for the
mixed-stream gap (88.8 vs 98.5 MB/s, BENCH r5 validation run).
Run once on the OLD tree (git stash) and once on the NEW — same
session, pipelined device-resident timing (bench.py discipline).

Streams (bench shapes): mixed 8.4 MB corpus blob, 24 MB RLE,
24 MB incompressible, 24 MB dense text (plrabn12 tiled).
"""
import os
import sys
import time

sys.path.insert(0, os.environ.get('STPU_ROOT', '/root/repo'))

import jax
import jax.numpy as jnp
import numpy as np

from snappy_tpu import config as stpu_config, engine
from snappy_tpu.formats import varint
from snappy_tpu.ops import decode_stream
from snappy_tpu.testing import corpus

stpu_config.ensure_compilation_cache()


def sync(x):
    np.asarray(jax.device_get(x.reshape(-1)[:1]))


def pipelined(fn, samples=8):
    r = fn()
    sync(jax.tree_util.tree_leaves(r)[-1])
    t0 = time.perf_counter()
    for _ in range(samples):
        r = fn()
    sync(jax.tree_util.tree_leaves(r)[-1])
    return (time.perf_counter() - t0) / samples


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(11)
    names = ["html", "urls.10K", "fireworks.jpeg", "paper-100k.pdf",
             "alice29.txt", "geo.protodata", "kppkn.gtb"]
    blob = (b"".join(corpus.read_data(n) for n in names) * 4)[:8 << 20]
    text = (corpus.read_data("plrabn12.txt") * 64)[:24 << 20]
    cases = [
        ("mixed 8.4MB", blob),
        ("text 24MB", text),
        ("rle 24MB", b"j" * (24 << 20)),
        ("incompr 24MB",
         rng.integers(0, 256, 24 << 20, np.uint8).tobytes()),
    ]
    for name, payload in cases:
        enc = engine.raw_compress(payload, backend="host")
        decl, read = varint.decode_uint32(enc)
        body = enc[read:]
        words_b, n_win, n_steps = decode_stream._grid_shapes(
            len(body), decl)
        buf = np.zeros((words_b * 4,), dtype=np.uint8)
        buf[: len(body)] = np.frombuffer(body, np.uint8)
        dwords = jax.device_put(jnp.asarray(buf.view(np.int32)))
        args = (dwords, jnp.int32(len(body)), jnp.int32(decl),
                n_win, n_steps, False)
        out_f, st = decode_stream.decode_raw_stream_grid(*args)
        assert np.asarray(st)[0], f"{name} status"
        got = np.ascontiguousarray(np.asarray(out_f)).view(np.uint8)
        assert got[:decl].tobytes() == payload, f"{name} payload"
        t = pipelined(lambda: decode_stream.decode_raw_stream_grid(*args))
        print(f"{name:14s} {1e3*t:8.2f} ms  {decl/t/1e6:8.1f} MB/s",
              flush=True)


if __name__ == "__main__":
    main()
