"""E21: grid-mode streaming decoder on the real chip — correctness + A/B
vs the scan-mode decoder on the 47 MB corpus stream.

The grid kernel runs the whole raw stream in ONE pallas_call (one ~0.5-0.8 ms
dispatch total instead of one per 64 KiB window) with the v3 emit/parse from
the chunk decoder; scan mode is the round-2 baseline (43.7 MB/s captured).
"""
import sys, time
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compilation")
import snappy_tpu as s
from snappy_tpu.formats import varint
from snappy_tpu.ops import decode_stream

def sync(x): np.asarray(jax.device_get(x.reshape(-1)[:1]))

import os
corpus = {}
ddir = '/root/reference/tests/data/'
for name in sorted(os.listdir(ddir)):
    if not name.endswith(('.rawsnappy', '.snappy')):
        corpus[name] = open(ddir + name, 'rb').read()

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
    got = np.ascontiguousarray(np.asarray(out_flat)).view(np.uint8)[:declared].tobytes()
    ok = bool(st[0]) and got == payload
    t0 = time.time()
    for _ in range(nit):
        out_flat, status = decode_stream.decode_raw_stream_grid(
            dwords, jnp.int32(len(body)), jnp.int32(declared),
            n_win, n_steps, False)
    sync(status)
    dt = (time.time() - t0) / nit
    print("grid %-12s correct=%s %6.2f MB: %7.1f ms -> %6.1f MB/s  (compile+first %.0fs, steps=%d)"
          % (name, ok, declared/1e6, dt*1e3, declared/dt/1e6, tc, n_steps))
    return dt

def run_scan(name, payload, nit):
    enc = s.encode(payload)
    _, v = varint.decode_uint32(enc)
    body = enc[v:]
    declared = len(payload)
    comp_len = len(body)
    w_needed = -(-comp_len // 4) + decode_stream.SC_WORDS + 1024 + 8
    buf = np.zeros((w_needed * 4,), dtype=np.uint8)
    buf[:comp_len] = np.frombuffer(body, np.uint8)
    dwords = jax.device_put(jnp.asarray(buf.view(np.int32)))
    steps = decode_stream._n_steps(comp_len, declared)
    t0 = time.time()
    w, wr, st = decode_stream.decode_raw_stream(
        dwords, jnp.int32(comp_len), jnp.int32(declared), steps, False)
    sync(st)
    tc = time.time() - t0
    ok = bool(np.asarray(st)[0])
    t0 = time.time()
    for _ in range(nit):
        w, wr, st = decode_stream.decode_raw_stream(
            dwords, jnp.int32(comp_len), jnp.int32(declared), steps, False)
    sync(st)
    dt = (time.time() - t0) / nit
    print("scan %-12s correct=%s %6.2f MB: %7.1f ms -> %6.1f MB/s  (compile+first %.0fs)"
          % (name, ok, declared/1e6, dt*1e3, declared/dt/1e6, tc))
    return dt

# small stream first (fast compile sanity), then the 8.4 MB bench blob,
# then the 47 MB corpus x16 stream the round notes quote.
html = corpus['html']
blob47 = (b"".join(corpus.values()) * 16)[: 47 * 1024 * 1024]
blob8 = blob47[: 128 * 65536]

if '--scan' in sys.argv:
    run_scan('blob8', blob8, 3)
    run_scan('blob47', blob47, 2)
elif '--steps' not in sys.argv:
    run_grid('html', html, 8)
    run_grid('blob8', blob8, 3)
    run_grid('blob47', blob47, 2)

def run_grid_steps(name, payload, nit, n_steps_override):
    enc = s.encode(payload)
    _, v = varint.decode_uint32(enc)
    body = enc[v:]
    declared = len(payload)
    words_b, n_win, n_steps = decode_stream._grid_shapes(len(body), declared)
    n_steps = n_steps_override
    buf = np.zeros((words_b * 4,), dtype=np.uint8)
    buf[: len(body)] = np.frombuffer(body, np.uint8)
    dwords = jax.device_put(jnp.asarray(buf.view(np.int32)))
    out_flat, status = decode_stream.decode_raw_stream_grid(
        dwords, jnp.int32(len(body)), jnp.int32(declared), n_win, n_steps, False)
    sync(status)
    st = np.asarray(status)
    t0 = time.time()
    for _ in range(nit):
        out_flat, status = decode_stream.decode_raw_stream_grid(
            dwords, jnp.int32(len(body)), jnp.int32(declared), n_win, n_steps, False)
    sync(status)
    dt = (time.time() - t0) / nit
    print("grid-steps=%-5d %-8s ok=%d %6.2f MB: %7.1f ms -> %6.1f MB/s"
          % (n_steps, name, st[0], declared/1e6, dt*1e3, declared/dt/1e6))
if "--steps" in sys.argv:
    for ns in (1536, 1024, 768):
        run_grid_steps("blob47", blob47, 2, ns)

if '--mix' in sys.argv:
    rng = np.random.default_rng(3)
    incomp = rng.integers(0, 256, 47*1024*1024, dtype=np.uint8).tobytes()
    rle = b"j" * (47*1024*1024)
    textish = (corpus['plrabn12.txt'] * 110)[:47*1024*1024]
    run_grid('incomp47', incomp, 3)
    run_grid('rle47', rle, 3)
    run_grid('text47', textish, 2)
