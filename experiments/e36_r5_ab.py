"""E36: round-5 A/B harness — grid decode classes with PIPELINED timing.

e35 synced every iteration, so the fast classes (RLE, incompressible)
carry a ~3-26 ms tunnel RTT per sample and are useless for A/B'ing
changes whose effect is a few us per window (comp-DMA double-buffering).
This harness dispatches ``nit`` decodes back-to-back and syncs once,
like bench.py's device section.

Usage: python experiments/e36_r5_ab.py [--quick] [classes...]
Classes: blob47 rle48 rand48 text16 (default: all).
"""
import os
import sys
import time

sys.path.insert(0, '/root/repo')
import jax
import jax.numpy as jnp
import numpy as np

import snappy_tpu as s
from snappy_tpu import config as stpu_config
from snappy_tpu.formats import varint
from snappy_tpu.ops import decode_stream

stpu_config.ensure_compilation_cache()


def sync(x):
    np.asarray(jax.device_get(x.reshape(-1)[:1]))


def run_grid(name, payload, nit):
    enc = s.encode(payload)
    _, v = varint.decode_uint32(enc)
    body = enc[v:]
    declared = len(payload)
    words_b, n_win, n_steps = decode_stream._grid_shapes(len(body), declared)
    buf = np.zeros((words_b * 4,), dtype=np.uint8)
    buf[: len(body)] = np.frombuffer(body, np.uint8)
    dwords = jax.device_put(jnp.asarray(buf.view(np.int32)))
    t0 = time.time()
    out_flat, status = decode_stream.decode_raw_stream_grid(
        dwords, jnp.int32(len(body)), jnp.int32(declared),
        n_win, n_steps, False)
    sync(status)
    tc = time.time() - t0
    st = np.asarray(status)
    got = np.ascontiguousarray(np.asarray(out_flat)).view(np.uint8)[
        :declared].tobytes()
    ok = bool(st[0]) and got == payload
    best = float('inf')
    for _ in range(3):
        t0 = time.time()
        for _ in range(nit):
            out_flat, status = decode_stream.decode_raw_stream_grid(
                dwords, jnp.int32(len(body)), jnp.int32(declared),
                n_win, n_steps, False)
        sync(status)
        best = min(best, (time.time() - t0) / nit)
    print("grid %-8s correct=%s ratio=%.3f %6.2f MB: %7.2f ms -> %7.1f MB/s"
          " (first %.0fs)"
          % (name, ok, len(body) / declared, declared / 1e6, best * 1e3,
             declared / best / 1e6, tc), flush=True)
    return best


def main():
    quick = '--quick' in sys.argv
    want = [a for a in sys.argv[1:] if not a.startswith('-')] or [
        'blob47', 'rle48', 'rand48', 'text16']
    ddir = '/root/reference/tests/data/'
    corpus = {}
    for name in sorted(os.listdir(ddir)):
        if not name.endswith(('.rawsnappy', '.snappy')):
            corpus[name] = open(ddir + name, 'rb').read()
    rng = np.random.default_rng(7)
    cases = {
        'blob47': lambda: (b"".join(corpus.values()) * 16)[: 47 * 1024 * 1024],
        'rle48': lambda: b"j" * (48 * 1024 * 1024),
        'rand48': lambda: rng.integers(0, 256, 48 * 1024 * 1024,
                                       np.uint8).tobytes(),
        'text16': lambda: (corpus['plrabn12.txt'] * 40)[: 16 * 1024 * 1024],
    }
    for name in want:
        nit = {'blob47': 2, 'text16': 2}.get(name, 8)
        if quick:
            nit = max(1, nit // 2)
        run_grid(name, cases[name](), nit)


if __name__ == '__main__':
    main()
