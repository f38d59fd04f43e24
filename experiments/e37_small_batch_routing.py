"""E37: A/B for routing <=64 KiB raw streams in decode_batch through the
chunk-shaped kernel (nb up to 512) instead of the big-window raw-batch
kernel (nb up to 128).

The big-window kernel carries a 291 KB SMEM buffer per stream and a
131 KiB out transfer per slab lane; a one-block stream needs neither.
Measures, for N small streams (html 40 KB slices + urls 50 KB slices):

  A. big-window slab (decode_raw_batch_words, slabs of 128)
  B. chunk slab (_decode_scalar_nocrc, slabs of 512)
  C. end-to-end engine.raw_uncompress_batch (new routing)
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
from snappy_tpu.ops import decode_scalar
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
    urls = corpus.read_data("urls.10K")
    pieces = []
    for base, step in ((html, 40000), (urls, 50000)):
        pieces += [base[i:i + step] for i in range(0, len(base) - step, step)]
    # replicate to a production-ish batch
    while len(pieces) < 96:
        pieces = pieces + pieces
    pieces = pieces[:96]
    encs = [engine.raw_compress(p, backend="host") for p in pieces]
    total = sum(len(p) for p in pieces)
    print(f"{len(pieces)} streams, {total/1e6:.2f} MB uncompressed", flush=True)

    bodies, decls = [], []
    for e in encs:
        d, r = varint.decode_uint32(e)
        bodies.append(e[r:])
        decls.append(int(d))

    # A: big-window slabs of 128
    slab_a = engine._nb_slab_raw(len(bodies))
    ba, da = list(bodies), list(decls)
    while len(ba) < slab_a:
        ba.append(b"")
        da.append(0)
    meta_a, comp_a = decode_scalar.pack_raw_batch(ba, da)
    dma, dca = jax.device_put(meta_a), jax.device_put(comp_a)
    out_a, st_a = decode_scalar.decode_raw_batch_words(dma, dca, slab_a)
    st = np.asarray(st_a)
    assert all(st[k, 0, 0] for k in range(len(bodies))), "A status"
    ta = pipelined(lambda: decode_scalar.decode_raw_batch_words(dma, dca, slab_a))

    # B: chunk slabs of 512
    slab_b = engine._nb_slab(len(bodies))
    bb, db = list(bodies), list(decls)
    while len(bb) < slab_b:
        bb.append(b"")
        db.append(0)
    meta_b, comp_b = decode_scalar.pack_chunks(bb, db)
    dmb, dcb = jax.device_put(meta_b), jax.device_put(comp_b)
    out_b, st_b = engine._decode_scalar_nocrc(dmb, dcb, slab_b)
    st = np.asarray(st_b)
    assert all(st[k, 0, 0] for k in range(len(bodies))), "B status"
    got = np.ascontiguousarray(np.asarray(out_b)).view(np.uint8)
    for k, p in enumerate(pieces):
        assert got[k, 0, :len(p)].tobytes() == p, f"B payload {k}"
    tb = pipelined(lambda: engine._decode_scalar_nocrc(dmb, dcb, slab_b))

    # C: end-to-end through the public batch entry (host staging included)
    res = engine.raw_uncompress_batch(encs, backend="device")
    assert [r[0] for r in res] == pieces, "C payload"
    t0 = time.perf_counter()
    for _ in range(4):
        engine.raw_uncompress_batch(encs, backend="device")
    tc = (time.perf_counter() - t0) / 4

    print(f"A big-window slab : {1e3*ta:7.2f} ms  {total/ta/1e6:7.1f} MB/s")
    print(f"B chunk slab      : {1e3*tb:7.2f} ms  {total/tb/1e6:7.1f} MB/s")
    print(f"C end-to-end batch: {1e3*tc:7.2f} ms  {total/tc/1e6:7.1f} MB/s")


if __name__ == "__main__":
    main()
