"""E30: device encode throughput by data class (round 4).

The encode bench lines cover html / mixed / incompressible.  This sweeps
the remaining classes — RLE and periodic (long-match-dominated), geo
(structured), pdf (literal+match mix) — to find whether the encoder has
a long-match cost cliff worth a fast path (the decode side's coalescer
analog: findMatchLength walks the whole match at word pace, then
emit_copy splits it into 64-byte tags).
"""
import os
import sys
import time

sys.path.insert(0, os.environ.get('STPU_ROOT', '/root/repo'))

import jax
import numpy as np

from snappy_tpu import config as stpu_config
from snappy_tpu.ops import encode_scalar
from snappy_tpu.testing import corpus, oracle

stpu_config.ensure_compilation_cache()

NB = 128


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


def blocks_of(blob):
    blob = (blob * ((NB * 65536) // len(blob) + 1))[: NB * 65536]
    return [blob[i * 65536: (i + 1) * 65536] for i in range(NB)]


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(3)
    cases = [
        ("rle", b"j" * 65536),
        ("period8", bytes(range(8)) * 8192),
        ("period4096", rng.integers(0, 256, 4096, np.uint8).tobytes() * 16),
        ("geo.protodata", corpus.read_data("geo.protodata")),
        ("paper-100k.pdf", corpus.read_data("paper-100k.pdf")),
        ("fireworks.jpeg", corpus.read_data("fireworks.jpeg")),
        ("html", corpus.read_data("html")),
    ]
    for name, blob in cases:
        blocks = blocks_of(blob)
        meta, inw = encode_scalar.pack_blocks(blocks)
        dm, di = jax.device_put(meta), jax.device_put(inw)
        # correctness: on-chip bytes == greedy oracle (first 2 distinct)
        enc_w, elen = encode_scalar.encode_blocks_words(dm, di, NB)
        encs = encode_scalar.unpack_enc(
            np.asarray(enc_w), np.asarray(elen)[:, 0, 0])
        for k in (0, 1):
            assert encs[k] == oracle.encode_block(blocks[k]), \
                f"{name} block {k}: bytes != oracle"
        t = pipelined(lambda: encode_scalar.encode_blocks_words(dm, di, NB))
        total = NB * 65536
        ratio = sum(len(e) for e in encs) / total
        print(f"encode {name:16s} ratio={ratio:.3f}: {1e3*t:7.1f} ms "
              f"{total/t/1e6:7.1f} MB/s", flush=True)


if __name__ == "__main__":
    main()
