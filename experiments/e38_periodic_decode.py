"""E38: device-resident decode rates for far-offset periodic-run classes
(the decode analog of the encoder's period modes, DESIGN.md known-gaps
bullet).

make_tag_dispatch's emit_copy_dma arm (round-4 snapshot) serves
coalesced far-offset periodic runs >= 16 KiB with a granule self-copy
at distance D (8192 for power-of-two offsets <= 8192, off for page
multiples).  This measures whether that arm actually lifts the classes
it targets, on pre-staged device buffers (pipelined, same discipline as
bench.py's device section — an end-to-end measurement through the
tunnel is transfer-bound at ~0.03 GB/s and says nothing about the
kernel):

  period-8     : 8-byte word repeated       (off=8 power of two)
  period-128   : 128-byte pattern repeated  (off=128 power of two)
  period-4096  : one random page repeated   (off=4096 page multiple)
  period-12288 : three random pages cycled  (off=12288 page multiple)
  rle          : one byte repeated          (near-copy control)
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

stpu_config.ensure_compilation_cache()


def sync(x):
    np.asarray(jax.device_get(x.reshape(-1)[:1]))


def pipelined(fn, samples=6):
    r = fn()
    sync(jax.tree_util.tree_leaves(r)[-1])
    t0 = time.perf_counter()
    for _ in range(samples):
        r = fn()
    sync(jax.tree_util.tree_leaves(r)[-1])
    return (time.perf_counter() - t0) / samples


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(7)
    N = 24 * 1024 * 1024
    classes = [("rle", b"j" * N)]
    for period in (8, 128, 4096, 12288):
        pat = rng.integers(0, 256, period, np.uint8).tobytes()
        classes.append((f"period-{period}", (pat * (N // period + 1))[:N]))

    for name, payload in classes:
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
        print(f"{name:13s} comp {len(enc)/1e3:8.1f} KB   "
              f"grid stream {1e3*t:7.2f} ms  {decl/t/1e9:6.2f} GB/s",
              flush=True)


if __name__ == "__main__":
    main()
