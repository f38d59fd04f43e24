"""E31: device routing for small (<= 128 KiB output) raw streams.

BENCH r3/r4 shows `device decode_raw html (single stream)` at ~14 MB/s —
7.5 ms for 102 KB through the big-window kernel (decode_raw_words), far
above the ~0.8 ms fixed pallas_call dispatch plus ~0.8 ms of decode work.
Compare the three candidate device paths on pre-staged buffers:

  A. big-window kernel (decode_raw_words, one grid step, 291 KB SMEM buf)
  B. grid streaming kernel (decode_raw_stream_grid, 64 KiB windows)
  C. chunk kernel with nb=1/2 (only valid when the stream happens to
     split at 64 KiB block boundaries — raw streams from the standard
     encoder do; measured for reference, not a general route)
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
from snappy_tpu.ops import decode_scalar, decode_stream
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
    html = corpus.read_data("html")
    cases = [
        ("html 40KB", html[:40000]),
        ("html 102KB", html),
        ("alice 128KB", corpus.read_data("alice29.txt")[:131072]),
    ]
    for name, payload in cases:
        enc = engine.raw_compress(payload, backend="host")
        declared, read = varint.decode_uint32(enc)
        body = enc[read:]

        # A: big-window kernel
        rmeta, rcomp = decode_scalar.pack_raw(body, declared)
        drm, drc = jax.device_put(rmeta), jax.device_put(rcomp)
        out_w, st = decode_scalar.decode_raw_words(drm, drc)
        assert np.asarray(st)[0, 0, 0]
        got = np.ascontiguousarray(np.asarray(out_w)).view(np.uint8)
        assert got[0, 0, :declared].tobytes() == payload
        ta = pipelined(lambda: decode_scalar.decode_raw_words(drm, drc))

        # B: grid streaming kernel
        words_b, n_win, n_steps = decode_stream._grid_shapes(
            len(body), declared)
        buf = np.zeros((words_b * 4,), dtype=np.uint8)
        buf[: len(body)] = np.frombuffer(body, np.uint8)
        dw = jax.device_put(np.ascontiguousarray(buf).view(np.int32))
        args = (dw, jnp.int32(len(body)), jnp.int32(declared),
                n_win, n_steps, False)
        out_f, stb = decode_stream.decode_raw_stream_grid(*args)
        assert np.asarray(stb)[0]
        got = np.ascontiguousarray(np.asarray(out_f)).view(np.uint8)
        assert got[:declared].tobytes() == payload
        tb = pipelined(lambda: decode_stream.decode_raw_stream_grid(*args))

        print(f"{name:14s} A big-window {1e3*ta:6.2f} ms "
              f"({declared/ta/1e6:6.1f} MB/s)   "
              f"B grid-stream {1e3*tb:6.2f} ms "
              f"({declared/tb/1e6:6.1f} MB/s)", flush=True)


if __name__ == "__main__":
    main()
