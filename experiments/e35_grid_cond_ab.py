"""E35: A/B the grid fast-loop condition (drop the `w < m` term).

The fast tag loop carries THREE exit terms (pos bound, special flag,
w < m) vs the chunk kernel's two.  Analysis (ROUND_NOTES_R4 "parked
candidate"): at w == m every tag is already special via the fused
`length > m - w` compare (min tag length is 1), and the slow step's
eff=0 split records a pending segment that the existing cross-window
machinery services — so the term is redundant.  This script measures
grid decode on the two headline classes (mixed 47 MB corpus stream,
48 MB RLE) so the edit can be A/B'd same-session per the relay
methodology note in DESIGN.md.

Usage: python experiments/e35_grid_cond_ab.py [--quick]
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
    for _ in range(nit):
        t0 = time.time()
        out_flat, status = decode_stream.decode_raw_stream_grid(
            dwords, jnp.int32(len(body)), jnp.int32(declared),
            n_win, n_steps, False)
        sync(status)
        best = min(best, time.time() - t0)
    print("grid %-14s correct=%s %6.2f MB: %7.1f ms -> %7.1f MB/s "
          "(first %.0fs)"
          % (name, ok, declared / 1e6, best * 1e3, declared / best / 1e6, tc))
    return best


def main():
    quick = '--quick' in sys.argv
    ddir = '/root/reference/tests/data/'
    corpus = {}
    for name in sorted(os.listdir(ddir)):
        if not name.endswith(('.rawsnappy', '.snappy')):
            corpus[name] = open(ddir + name, 'rb').read()
    blob47 = (b"".join(corpus.values()) * 16)[: 47 * 1024 * 1024]
    rle = b"j" * (48 * 1024 * 1024)
    nit = 2 if quick else 4
    run_grid('blob47', blob47, nit)
    run_grid('rle48', rle, nit)
    # dense text: the per-tag floor class the saved ops matter most for
    text = (corpus['plrabn12.txt'] * 40)[: 16 * 1024 * 1024]
    run_grid('text16', text, nit)


if __name__ == '__main__':
    main()
