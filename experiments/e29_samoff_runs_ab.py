"""E29: on-chip A/B of the generalized same-offset copy-run coalescer
(round 4) vs the round-3 identical-0xFE coalescer.

Round-3 state (captured, ROUND_NOTES_R3): chunk decode geo.protodata
~150 MB/s, html 126-131, urls ~94, mixed batch 84.9, alice29 59-61
(text control — must not regress: its walk selection is unchanged);
grid stream mixed 49 MB at 90-92 MB/s, RLE 1.81-1.9 GB/s.

Round-4 change under test (experiments/e28 composition data):
  * run detection generalized from byte-identical 0xFE tags to ANY
    same-offset tagCopy2 run (varying lengths) — scalar_emit.
    make_run_lookahead;
  * runs-walk ratio gate widened from <= 0.2 to <= 0.3, so html (0.236)
    and geo (0.197) chunks both select it.
Coverage: same-offset runs hold 43.8% of geo's and 31.1% of html's
output bytes (vs 37.4% / 14.5% identical-tag).
"""
import sys
import time

import os
sys.path.insert(0, os.environ.get('STPU_ROOT', '/root/repo'))

import jax
import numpy as np

from snappy_tpu import config as stpu_config, engine
from snappy_tpu.formats import varint
from snappy_tpu.ops import decode_scalar, decode_stream
from snappy_tpu.testing import corpus

stpu_config.ensure_compilation_cache()

R3_CHUNK = {"geo.protodata": 150.0, "html": 128.0, "urls.10K": 94.0,
            "kppkn.gtb": None, "alice29.txt": 60.0,
            "fireworks.jpeg": 946.0, "mixed": 84.9}
R3_GRID = {"geo.protodata": None, "html": 123.0, "mixed": 91.6,
           "rle": 1810.0}

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


def batch_for(name):
    if name == "mixed":
        files = corpus.available_corpus()
        blob = (b"".join(corpus.read_data(n) for n in files) * 8)
    else:
        blob = corpus.read_data(name) * 200
    blob = blob[: NB * 65536]
    return [blob[i * 65536: (i + 1) * 65536] for i in range(NB)]


def chunk_ab():
    for name in ("geo.protodata", "html", "urls.10K", "kppkn.gtb",
                 "alice29.txt", "fireworks.jpeg", "mixed"):
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
        # correctness first
        out_w, status = decode_scalar.decode_chunks_words(dm, dc, NB)
        st = np.asarray(status)
        assert st[:, 0, 0].all(), f"{name}: chunk decode not ok"
        got = decode_scalar.unpack_output(np.asarray(out_w), st[:, 0, 1])
        for k, blk in enumerate(blocks):
            assert got[k] == blk, f"{name}: block {k} bytes differ"
        t = pipelined(lambda: decode_scalar.decode_chunks_words(dm, dc, NB))
        mbps = total / t / 1e6
        base = R3_CHUNK.get(name)
        delta = f" ({mbps / base - 1:+.1%} vs r3 {base})" if base else ""
        print(f"chunk decode {name:16s}: {1e3*t:7.1f} ms "
              f"{mbps:7.1f} MB/s{delta}", flush=True)


def grid_one(name, payload, base):
    enc = engine.raw_compress(payload, backend="host")
    _, v = varint.decode_uint32(enc)
    body = enc[v:]
    declared = len(payload)
    words_b, n_win, n_steps = decode_stream._grid_shapes(len(body), declared)
    buf = np.zeros((words_b * 4,), dtype=np.uint8)
    buf[: len(body)] = np.frombuffer(body, np.uint8)
    dwords = jax.device_put(np.ascontiguousarray(buf).view(np.int32))
    import jax.numpy as jnp
    args = (dwords, jnp.int32(len(body)), jnp.int32(declared),
            n_win, n_steps, False)
    out_flat, status = decode_stream.decode_raw_stream_grid(*args)
    st = np.asarray(status)
    got = np.ascontiguousarray(np.asarray(out_flat)).view(np.uint8)[
        :declared].tobytes()
    assert bool(st[0]) and got == payload, f"grid {name}: wrong bytes"
    t = pipelined(
        lambda: decode_stream.decode_raw_stream_grid(*args), samples=10)
    mbps = declared / t / 1e6
    delta = f" ({mbps / base - 1:+.1%} vs r3 {base})" if base else ""
    print(f"grid decode {name:16s}: {1e3*t:7.1f} ms "
          f"{mbps:7.1f} MB/s{delta}", flush=True)


def grid_ab():
    files = corpus.available_corpus()
    mixed = (b"".join(corpus.read_data(n) for n in files) * 8)
    cases = [
        ("geo.protodata", (corpus.read_data("geo.protodata") * 200)
         [: 16 * 1024 * 1024]),
        ("html", (corpus.read_data("html") * 200)[: 16 * 1024 * 1024]),
        ("mixed", mixed),
        ("rle", b"\x00" * (48 * 1024 * 1024)),
    ]
    for name, payload in cases:
        grid_one(name, payload, R3_GRID.get(name))


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    chunk_ab()
    grid_ab()


if __name__ == "__main__":
    main()
