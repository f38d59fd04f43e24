"""E34: measured per-tag cost of the round-4 decode fast loop.

Hand-built streams isolate the per-tag overhead from emission:
  * lit1  — 2-byte tags emitting 1 byte each (pure parse+loop cost,
    32768 tags per 64 KiB block... output-capped: 65536 tags of 1 byte
    fill a 64 KiB window with 2-byte tags -> comp 128 KiB > C_WORDS;
    use 4-byte literals: 5 B/tag, 13107 tags/block);
  * lit8  — 9-byte tags emitting 8 bytes (head-only emit);
  * copy8 — tagCopy2 len-8 far copies (typical text copy shape).

ns/tag = block_time / tags.  Round-4 state after the branch/op
elimination pass (validation folds, no near arm, two-tier rounds).
"""
import os
import sys
import time

sys.path.insert(0, os.environ.get('STPU_ROOT', '/root/repo'))

import jax
import numpy as np

from snappy_tpu import config as stpu_config
from snappy_tpu.ops import decode_scalar
from snappy_tpu.testing import oracle

stpu_config.ensure_compilation_cache()

NB = 128


def sync(x):
    np.asarray(jax.device_get(x.reshape(-1)[:1]))


def pipelined(fn, samples=10):
    r = fn()
    sync(jax.tree_util.tree_leaves(r)[-1])
    t0 = time.perf_counter()
    for _ in range(samples):
        r = fn()
    sync(jax.tree_util.tree_leaves(r)[-1])
    return (time.perf_counter() - t0) / samples


def lit(data):
    n = len(data) - 1
    assert n < 60
    return bytes([n << 2]) + data


def c2(off, ln):
    return bytes([((ln - 1) << 2) | 2]) + off.to_bytes(2, "little")


def run(name, body, out_len, tags):
    want, err = oracle.decode_all_tags(body, 1 << 20)
    assert err is None and len(want) == out_len
    meta, comp = decode_scalar.pack_chunks([body] * NB, [out_len] * NB)
    dm, dc = jax.device_put(meta), jax.device_put(comp)
    out_w, st = decode_scalar.decode_chunks_words(dm, dc, NB)
    stn = np.asarray(st)
    assert stn[:, 0, 0].all()
    got = decode_scalar.unpack_output(np.asarray(out_w), stn[:, 0, 1])[0]
    assert got == bytes(want)
    t = pipelined(lambda: decode_scalar.decode_chunks_words(dm, dc, NB))
    per_blk = t / NB
    print(f"{name:8s}: {1e3*t:7.1f} ms/batch  {1e9*per_blk/tags:6.1f} ns/tag "
          f"({NB*out_len/t/1e6:7.1f} MB/s payload)", flush=True)


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    r = np.random.default_rng(9)
    # 4-byte literals filling 64 KiB: 13107 tags, 5 B comp each
    n_tags = 13107
    body = b"".join(lit(r.integers(0, 256, 4, np.uint8).tobytes())
                    for _ in range(n_tags))
    run("lit4", body, 4 * n_tags, n_tags)
    # 8-byte literals: 7281 tags
    n_tags = 7281
    body = b"".join(lit(r.integers(0, 256, 8, np.uint8).tobytes())
                    for _ in range(n_tags))
    run("lit8", body, 8 * n_tags, n_tags)
    # far copies len 8 at varied offsets (512 + i%64): head + copy loop
    head = lit(r.integers(0, 256, 59, np.uint8).tobytes()) * 12  # 708 B
    n_c = 8000
    body = head + b"".join(c2(512 + (i % 64), 8) for i in range(n_c))
    run("copy8", body, 708 + 8 * n_c, n_c + 12)


if __name__ == "__main__":
    main()
