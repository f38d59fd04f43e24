"""Warm the Mosaic/XLA compilation cache for every production device-kernel
shape bench.py uses, then smoke-check byte-exactness.

Run after a kernel change (or a tunnel outage) so the benchmark and driver
runs hit a hot cache instead of paying fresh remote compiles:

    python tools/warm_device.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import snappy_tpu as s
from snappy_tpu import config as stpu_config

stpu_config.ensure_compilation_cache()
from snappy_tpu import engine
from snappy_tpu.formats import varint
from snappy_tpu.ops import crc32c_jax, crc32c_pallas, decode_scalar, \
    decode_stream, encode_scalar
from snappy_tpu.testing import corpus


def sync(x):
    np.asarray(jax.device_get(x.reshape(-1)[:1]))


def main():
    if not stpu_config.device_relay_reachable():
        print("TPU relay not listening; nothing to warm (a dead relay "
              "hangs every jax call)")
        return
    t0 = time.time()
    names = corpus.available_corpus()
    data = corpus.read_data(names[0]) if names else b"warm" * 40000
    datasets = {n: corpus.read_data(n) for n in names} or {"synthetic": data}
    NB = 128
    blob = (b"".join(datasets.values()) * 3)[: NB * 65536]

    # chunk decoder (NB x 64 KiB)
    blocks = [blob[k * 65536:(k + 1) * 65536] for k in range(NB)]
    bodies, decls = [], []
    for blk in blocks:
        e = s.encode(blk)
        _, v = varint.decode_uint32(e)
        bodies.append(e[v:])
        decls.append(len(blk))
    meta, comp = decode_scalar.pack_chunks(bodies, decls)
    out_w, st = decode_scalar.decode_chunks_words(
        jnp.asarray(meta), jnp.asarray(comp.view(np.int32)), NB
    )
    sync(st)
    sth = np.asarray(st)
    assert sth[:, 0, 0].all(), "chunk decode failed"
    print("chunk decoder warm (%.0fs)" % (time.time() - t0))

    # block encoder (NB x 64 KiB)
    emeta, inw = encode_scalar.pack_blocks(blocks)
    enc_w, enc_l = encode_scalar.encode_blocks_words(
        jnp.asarray(emeta), jnp.asarray(inw), NB
    )
    sync(enc_l)
    encs = encode_scalar.unpack_enc(np.asarray(enc_w), np.asarray(enc_l).reshape(-1))
    assert s.decode(varint.encode_uint32(65536) + encs[0]) == blocks[0]
    print("block encoder warm (%.0fs)" % (time.time() - t0))

    # big-window raw kernel (html single stream)
    enc_stream = engine.raw_compress(data, backend="host") or b""
    declared, read = varint.decode_uint32(enc_stream)
    if declared and declared <= 4 * decode_scalar.RAW_OUT_WORDS:
        rmeta, rcomp = decode_scalar.pack_raw(enc_stream[read:], declared)
        ow, stt = decode_scalar.decode_raw_words(
            jnp.asarray(rmeta), jnp.asarray(rcomp)
        )
        sync(stt)
        print("big-window raw kernel warm (%.0fs)" % (time.time() - t0))

    # grid streaming kernel on the bench blob shape + byte check
    big_enc = engine.raw_compress(blob, backend="host") or b""
    bdecl, bread = varint.decode_uint32(big_enc)
    out, reason = decode_stream.decode_raw_stream_bytes(
        big_enc[bread:], bdecl, interpret=False, mode="grid"
    )
    assert reason == "ok" and out == blob, reason
    print("grid streaming kernel warm + byte-exact (%.0fs)" % (time.time() - t0))

    # round-5 production shapes, via the public engine paths:
    # framed device decode of a >32 MiB stream hits the 512-chunk slab
    # (CRC-fused _decode_chunks_scalar) + the native header scan
    big_framed = engine.framed_compress(blob * 4, backend="host") or b""
    outf, reason = engine.framed_uncompress(big_framed, backend="device")
    assert reason == "ok" and outf == blob * 4, reason
    print("framed 512-slab pipeline warm + byte-exact (%.0fs)"
          % (time.time() - t0))
    # decode_batch: segment split + chunk slabs + big-window batch lanes
    res = engine.raw_uncompress_batch(
        [enc_stream] * 10, backend="device")
    assert all(r[1] == "ok" for r in res)
    print("decode_batch slabs warm (%.0fs)" % (time.time() - t0))
    # encode_batch slabs at both levels
    for lvl in (1, 2):
        encb = engine.raw_compress_batch(blocks[:32], backend="device",
                                         level=lvl)
        assert s.decode(encb[0]) == blocks[0]
    print("encode_batch slabs warm, levels 1+2 (%.0fs)" % (time.time() - t0))

    # CRC kernels (bench shape: 256 x 64 KiB)
    n_crc = 256
    chunks = np.zeros((n_crc, 65536), dtype=np.int32)
    lens = np.full((n_crc,), 65536, dtype=np.int32)
    dch, dln = jax.device_put(chunks), jax.device_put(lens)
    sync(crc32c_jax.masked_crc32c_chunks(dch, dln, 65536))
    if crc32c_pallas.available():
        sync(crc32c_pallas.masked_crc32c_chunks(dch, dln, 65536))
    print("crc kernels warm (%.0fs)" % (time.time() - t0))
    print("ALL WARM in %.0fs" % (time.time() - t0))


if __name__ == "__main__":
    main()
