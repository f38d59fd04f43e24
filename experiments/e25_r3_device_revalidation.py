"""E25: round-3 device re-validation sweep (run FIRST when the relay is up).

The TPU relay was down for all of round 3, so two classes of change are
interpret-validated but unmeasured on hardware:

1. the encoder byte-identity fixes (encode_scalar.py: position-0 table
   candidates, probe-before-limit hit suppression, dynamic hash shift) —
   ~1-2 extra scalar ops per probe; measure the regression (if any)
   against the round-2 captured encode numbers;
2. the post-review grid-decoder edits from late round 2 (covered by
   e24's own script + tools/warm_device.py).

Run order when the relay listens:
    python tools/warm_device.py          # compile + byte-check all shapes
    python experiments/e25_r3_device_revalidation.py
    python experiments/e24_gated_dma_ab.py
    python experiments/e21_grid_stream_tpu.py --mix
    python bench.py

This script measures the chunk encode/decode kernels on the standard
per-file batches and prints deltas vs the round-2 captures.
"""
import sys
import time

sys.path.insert(0, '/root/repo')

import jax
import numpy as np

from snappy_tpu import config as stpu_config, engine
from snappy_tpu.formats import varint
from snappy_tpu.ops import decode_scalar, encode_scalar
from snappy_tpu.testing import corpus

stpu_config.ensure_compilation_cache()

# round-2 captured numbers (MB/s), from ROUND_NOTES / commit logs
R2_ENCODE = {"html": 73.5, "urls.10K": 46.0, "alice29.txt": 35.0,
             "plrabn12.txt": 31.6, "mixed": 46.6}
R2_DECODE = {"html": 130.0, "urls.10K": 95.0, "alice29.txt": 59.0,
             "fireworks.jpeg": 486.0, "mixed": 63.0}

NB = 128


def sync(x):
    np.asarray(jax.device_get(x.reshape(-1)[:1]))


def pipelined(fn, samples=3):
    r = fn()
    sync(jax.tree_util.tree_leaves(r)[-1])
    t0 = time.perf_counter()
    for _ in range(samples):
        r = fn()
    sync(jax.tree_util.tree_leaves(r)[-1])
    return (time.perf_counter() - t0) / samples


def batch_for(name):
    if name == "mixed":
        files = corpus.available_corpus()
        blob = (b"".join(corpus.read_data(n) for n in files) * 8)
    else:
        blob = corpus.read_data(name) * 200
    blob = blob[: NB * 65536]
    return [blob[i * 65536 : (i + 1) * 65536] for i in range(NB)]


def main():
    print(f"device: {jax.devices()[0]}")
    for name in ("html", "urls.10K", "alice29.txt", "plrabn12.txt", "mixed"):
        blocks = batch_for(name)
        total = sum(len(b) for b in blocks)
        meta, inw = encode_scalar.pack_blocks(blocks)
        dm, di = jax.device_put(meta), jax.device_put(inw)
        t = pipelined(lambda: encode_scalar.encode_blocks_words(dm, di, NB))
        mbps = total / t / 1e6
        base = R2_ENCODE.get(name)
        delta = f" ({mbps / base - 1:+.1%} vs r2 {base})" if base else ""
        print(f"encode {name:14s}: {1e3*t:7.1f} ms  {mbps:6.1f} MB/s{delta}")

    for name in ("html", "urls.10K", "alice29.txt", "fireworks.jpeg", "mixed"):
        blocks = batch_for(name)
        bodies, decls = [], []
        for blk in blocks:
            e = engine.raw_compress(blk, backend="host")
            _, v = varint.decode_uint32(e)
            bodies.append(e[v:])
            decls.append(len(blk))
        meta, comp = decode_scalar.pack_chunks(bodies, decls)
        dm, dc = jax.device_put(meta), jax.device_put(comp)
        total = sum(decls)
        t = pipelined(lambda: decode_scalar.decode_chunks_words(dm, dc, NB))
        mbps = total / t / 1e6
        base = R2_DECODE.get(name)
        delta = f" ({mbps / base - 1:+.1%} vs r2 {base})" if base else ""
        print(f"decode {name:14s}: {1e3*t:7.1f} ms  {mbps:6.1f} MB/s{delta}")

    # correctness on-chip: encoded bytes must equal the greedy oracle
    from snappy_tpu.testing import oracle

    blocks = batch_for("html")[:8]
    meta, inw = encode_scalar.pack_blocks(blocks)
    enc_w, elen = encode_scalar.encode_blocks_words(
        jax.device_put(meta), jax.device_put(inw), 8
    )
    encs = encode_scalar.unpack_enc(
        np.asarray(enc_w), np.asarray(elen)[:, 0, 0]
    )
    for k, blk in enumerate(blocks):
        assert encs[k] == oracle.encode_block(blk), f"on-chip bytes != oracle (blk {k})"
    print("on-chip encoder bytes == greedy oracle: OK")


if __name__ == "__main__":
    main()
