"""E24: A/B the grid decoder's gated comp-slice DMA (round-3 opener).

The gate (decode_stream._kernel_grid: skip the ~82 KB HBM->SMEM comp DMA
when the 1024-word-aligned cursor is unchanged from the previous grid
step) shipped at the end of round 2 while the TPU relay was down, so it
is interpret-validated but unmeasured on hardware.  Expected effect:
high-ratio streams decode many windows per comp slice (RLE47 was
223 MB/s with the unconditional DMA); text/mixed should be unchanged.

Run:  python experiments/e24_gated_dma_ab.py
(The production kernel already has the gate; this just measures the
standard payload set and prints a comparison against the round-2
captured numbers.)
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

# round-2 captured baselines (pre-gate two-tier kernel, experiments/e21)
R2 = {"blob47": 89.3, "incomp47": 584.3, "rle47": 223.3, "text47": 55.1}


def sync(x):
    np.asarray(jax.device_get(x.reshape(-1)[:1]))


def run(name, payload, nit):
    enc = s.encode(payload)
    _, v = varint.decode_uint32(enc)
    body = enc[v:]
    declared = len(payload)
    words_b, n_win, n_steps = decode_stream._grid_shapes(len(body), declared)
    buf = np.zeros((words_b * 4,), dtype=np.uint8)
    buf[: len(body)] = np.frombuffer(body, np.uint8)
    dwords = jax.device_put(jnp.asarray(buf.view(np.int32)))
    out_flat, status = decode_stream.decode_raw_stream_grid(
        dwords, jnp.int32(len(body)), jnp.int32(declared),
        n_win, n_steps, False)
    sync(status)
    st = np.asarray(status)
    got = (np.ascontiguousarray(np.asarray(out_flat))
           .view(np.uint8)[:declared].tobytes())
    ok = bool(st[0]) and got == payload
    t0 = time.time()
    for _ in range(nit):
        out_flat, status = decode_stream.decode_raw_stream_grid(
            dwords, jnp.int32(len(body)), jnp.int32(declared),
            n_win, n_steps, False)
    sync(status)
    dt = (time.time() - t0) / nit
    mbps = declared / dt / 1e6
    base = R2.get(name)
    delta = f" ({mbps/base:+.1%} vs r2 {base:.1f})" if base else ""
    print("gated %-9s ok=%s %6.2f MB: %7.1f ms -> %6.1f MB/s%s"
          % (name, ok, declared/1e6, dt*1e3, mbps, delta))


def main():
    if not stpu_config.device_relay_reachable():
        print("TPU relay not listening; run when the chip is back")
        return
    ddir = '/root/reference/tests/data/'
    names = [n for n in sorted(os.listdir(ddir))
             if not n.endswith(('.rawsnappy', '.snappy'))]
    corpus = {n: open(ddir + n, 'rb').read() for n in names}
    blob47 = (b"".join(corpus.values()) * 16)[: 47 * 1024 * 1024]
    rng = np.random.default_rng(3)
    run("blob47", blob47, 2)
    run("incomp47",
        rng.integers(0, 256, 47 * 1024 * 1024, dtype=np.uint8).tobytes(), 3)
    run("rle47", b"j" * (47 * 1024 * 1024), 3)
    run("text47", (corpus['plrabn12.txt'] * 110)[: 47 * 1024 * 1024], 2)


if __name__ == "__main__":
    main()
