"""E42: A/B for replacing the fast loops' per-tag max() clamp with a
one-time head prologue (slow-validation rounds until 3 bytes of
reachable history exist, then a clamp-free fast loop).

Saves one scalar op per tag in the non-runs fast loops of BOTH the
chunk kernel and the grid streaming kernel.  Legs: chunk decode (128 x
64 KiB, dense text and mixed) + grid stream (24 MB text, 8.4 MB mixed),
pipelined device-resident timing.
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
    for _ in range(4):
        fn()
    sync(jax.tree_util.tree_leaves(fn())[-1])
    t0 = time.perf_counter()
    for _ in range(samples):
        r = fn()
    sync(jax.tree_util.tree_leaves(r)[-1])
    return (time.perf_counter() - t0) / samples


def chunk_leg(name, blob):
    blocks = [blob[k * 65536:(k + 1) * 65536] for k in range(128)]
    bodies, decls = [], []
    for blk in blocks:
        e = engine.raw_compress(blk, backend="host")
        _, v = varint.decode_uint32(e)
        bodies.append(e[v:])
        decls.append(len(blk))
    meta, comp = decode_scalar.pack_chunks(bodies, decls)
    dm, dc = jax.device_put(jnp.asarray(meta)), jax.device_put(jnp.asarray(comp))
    out_w, st = decode_scalar.decode_chunks_words(dm, dc, 128)
    stn = np.asarray(st)
    assert stn[:, 0, 0].all()
    got = np.ascontiguousarray(np.asarray(out_w)).view(np.uint8)
    for k, blk in enumerate(blocks):
        assert got[k, 0, :len(blk)].tobytes() == blk, k
    t = pipelined(lambda: decode_scalar.decode_chunks_words(dm, dc, 128))
    tot = sum(decls)
    print(f"chunk {name:10s} {1e3*t:8.2f} ms  {tot/t/1e6:7.1f} MB/s",
          flush=True)


def grid_leg(name, payload):
    enc = engine.raw_compress(payload, backend="host")
    decl, read = varint.decode_uint32(enc)
    body = enc[read:]
    words_b, n_win, n_steps = decode_stream._grid_shapes(len(body), decl)
    buf = np.zeros((words_b * 4,), dtype=np.uint8)
    buf[: len(body)] = np.frombuffer(body, np.uint8)
    dwords = jax.device_put(jnp.asarray(buf.view(np.int32)))
    args = (dwords, jnp.int32(len(body)), jnp.int32(decl),
            n_win, n_steps, False)
    out_f, st = decode_stream.decode_raw_stream_grid(*args)
    assert np.asarray(st)[0]
    got = np.ascontiguousarray(np.asarray(out_f)).view(np.uint8)
    assert got[:decl].tobytes() == payload
    t = pipelined(lambda: decode_stream.decode_raw_stream_grid(*args))
    print(f"grid  {name:10s} {1e3*t:8.2f} ms  {decl/t/1e6:7.1f} MB/s",
          flush=True)


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    text = (corpus.read_data("plrabn12.txt") * 24)[:128 * 65536]
    names = ["html", "urls.10K", "fireworks.jpeg", "paper-100k.pdf",
             "alice29.txt", "geo.protodata", "kppkn.gtb"]
    mixed = (b"".join(corpus.read_data(n) for n in names) * 6)[:128 * 65536]
    chunk_leg("text", text)
    chunk_leg("mixed", mixed)
    grid_leg("text24M", (corpus.read_data("plrabn12.txt") * 64)[:24 << 20])
    grid_leg("mixed8M", mixed)


if __name__ == "__main__":
    main()
