"""E16: does interleaving two INDEPENDENT tag walks raise scalar-core IPC?

Hypothesis: the ~2 cycles/op sustained rate of the single-stream walk is
load-use latency on the in-order scalar pipeline, not issue width.  Two
independent chunks' parse loops interleaved in one kernel body give the
scheduler two dependency chains to overlap.  (The round-1 "2x unroll was
slower" dead-end unrolled the SAME stream — a single dependent chain.)

Parse-only (LUT walk, no emit) to isolate the question:

  K1: one stream per grid step        (baseline ns/tag)
  K2: two streams per grid step, interleaved state

python experiments/e16_interleave.py [interpret]
"""
import sys, time
sys.path.insert(0, '/root/repo')
INTERPRET = "interpret" in sys.argv[1:]
if INTERPRET:
    import os
    os.environ["JAX_PLATFORMS"] = "cpu"
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compilation")

import snappy_tpu as s
from snappy_tpu.formats import varint
from snappy_tpu.ops import decode_scalar as ds

CW_PAD = ds.CW_PAD
_I32 = jnp.int32
_LUT_HDR_MASK = 7
_LUT_LIT = 8
_LUT_EXT = 16


def parse_stream_step(lut_ref, gbyte, gword, pos):
    b = gbyte(pos)
    e = lut_ref[b]
    em = lut_ref[256 + b]
    hdr = e & _LUT_HDR_MASK
    is_lit = (e & _LUT_LIT) != 0
    needs = (e & _LUT_EXT) != 0
    lenb = (e >> 5) & 127
    ext_word = gword(pos + 1)
    ext_val = ext_word & em
    length = jax.lax.select(needs, ext_val + 1, lenb)
    consumed = hdr + jax.lax.select(is_lit, length, 0)
    return consumed


def make_k1():
    def _kernel(lut_ref, meta_ref, comp_ref, cnt_ref, buf_ref, sem_in):
        i = pl.program_id(0)
        n = meta_ref[0, 0, 0]
        cp = pltpu.make_async_copy(
            comp_ref.at[pl.ds(i * CW_PAD, CW_PAD)],
            buf_ref.at[pl.ds(0, CW_PAD)], sem_in)
        cp.start(); cp.wait()

        def gbyte(p):
            w = buf_ref[p >> 2]
            return (w >> ((p & 3) * 8)) & 255

        def gword(p):
            wa = buf_ref[p >> 2]
            wb = buf_ref[(p >> 2) + 1]
            sh = (p & 3) * 8
            lo = (wa >> sh) & ((jnp.int32(1) << (32 - sh)) - 1)
            return jax.lax.select(sh == 0, wa, lo | (wb << (32 - sh)))

        def step(st):
            pos, c = st
            consumed = parse_stream_step(lut_ref, gbyte, gword, pos)
            # clamp: a truncated/corrupt final tag must not walk OOB
            return jnp.minimum(pos + jnp.maximum(consumed, 1), n), c + 1

        pos, c = jax.lax.while_loop(lambda st: st[0] < n, step,
                                    (jnp.int32(0), jnp.int32(0)))
        cnt_ref[0, 0, 0] = c
        cnt_ref[0, 0, 1] = pos

    return _kernel


def make_k2():
    def _kernel(lut_ref, meta_ref, comp_ref, cnt_ref, buf_ref, sem_in):
        i = pl.program_id(0)
        n0 = meta_ref[0, 0, 0]
        n1 = meta_ref[0, 0, 2]
        cp = pltpu.make_async_copy(
            comp_ref.at[pl.ds(i * 2 * CW_PAD, 2 * CW_PAD)],
            buf_ref.at[pl.ds(0, 2 * CW_PAD)], sem_in)
        cp.start(); cp.wait()

        def mk(base):
            def gbyte(p):
                w = buf_ref[base + (p >> 2)]
                return (w >> ((p & 3) * 8)) & 255

            def gword(p):
                wa = buf_ref[base + (p >> 2)]
                wb = buf_ref[base + (p >> 2) + 1]
                sh = (p & 3) * 8
                lo = (wa >> sh) & ((jnp.int32(1) << (32 - sh)) - 1)
                return jax.lax.select(sh == 0, wa, lo | (wb << (32 - sh)))

            return gbyte, gword

        gb0, gw0 = mk(0)
        gb1, gw1 = mk(CW_PAD)

        def step(st):
            p0, p1, c0, c1 = st
            con0 = parse_stream_step(lut_ref, gb0, gw0, p0)
            con1 = parse_stream_step(lut_ref, gb1, gw1, p1)
            a0 = p0 < n0
            a1 = p1 < n1
            p0n = jax.lax.select(
                a0, jnp.minimum(p0 + jnp.maximum(con0, 1), n0), p0)
            p1n = jax.lax.select(
                a1, jnp.minimum(p1 + jnp.maximum(con1, 1), n1), p1)
            c0n = jax.lax.select(a0, c0 + 1, c0)
            c1n = jax.lax.select(a1, c1 + 1, c1)
            return p0n, p1n, c0n, c1n

        p0, p1, c0, c1 = jax.lax.while_loop(
            lambda st: (st[0] < n0) | (st[1] < n1), step,
            (jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0)))
        cnt_ref[0, 0, 0] = c0 + c1
        cnt_ref[0, 0, 1] = p0
        cnt_ref[0, 0, 2] = p1

    return _kernel


import functools


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def call_k(kern, nb_steps, streams_per, meta, comp):
    return pl.pallas_call(
        kern,
        grid=(nb_steps,),
        in_specs=[
            pl.BlockSpec((512,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 2 * streams_per), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, 4), lambda i: (i, 0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((nb_steps, 1, 4), jnp.int32),
        scratch_shapes=[
            pltpu.SMEM((streams_per * CW_PAD,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=INTERPRET,
    )(jnp.asarray(ds._host_lut()), meta, comp)


def sync(x):
    np.asarray(jax.device_get(x.reshape(-1)[:1]))


def prep(nb):
    bodies = []
    for name in ("urls.10K", "html", "alice29.txt"):
        data = open('/root/reference/tests/data/' + name, 'rb').read()
        for i in range(0, len(data), 65536):
            blk = data[i:i + 65536]
            e = s.encode(blk)
            _, v = varint.decode_uint32(e)
            bodies.append(e[v:])
    while len(bodies) < nb:
        bodies += bodies
    bodies = bodies[:nb]
    if INTERPRET:
        bodies = [b[:1500] for b in bodies]  # interpreter is ~ms/tag
    comp = np.zeros((nb, 4 * CW_PAD), dtype=np.uint8)
    lens = np.zeros(nb, np.int32)
    for k, b in enumerate(bodies):
        arr = np.frombuffer(b, np.uint8)
        comp[k, :len(arr)] = arr
        lens[k] = len(arr)
    return comp.reshape(-1).view(np.int32), lens


NB = 4 if INTERPRET else 32
comp_np, lens = prep(NB)
comp = jnp.asarray(comp_np)
total_bytes = int(lens.sum())

meta1 = jnp.asarray(
    np.stack([lens, np.zeros_like(lens)], -1).reshape(NB, 1, 2))
meta2 = jnp.asarray(
    np.stack([lens[0::2], np.zeros(NB // 2, np.int32),
              lens[1::2], np.zeros(NB // 2, np.int32)], -1)
    .reshape(NB // 2, 1, 4).astype(np.int32))

k1 = make_k1()
k2 = make_k2()

for name, kern, steps, sp, meta in (
        ("K1 single", k1, NB, 1, meta1),
        ("K2 2-interleave", k2, NB // 2, 2, meta2)):
    t0 = time.time()
    r = call_k(kern, steps, sp, meta, comp)
    sync(r)
    print("%s compile+first %.1fs dev=%s" % (name, time.time() - t0, r.devices()))
    rh = np.asarray(r)
    tags = int(rh[:, 0, 0].sum())
    NIT = 1 if INTERPRET else 10
    t0 = time.time()
    for _ in range(NIT):
        r = call_k(kern, steps, sp, meta, comp)
    sync(r)
    dt = (time.time() - t0) / NIT
    print("  %s: %d tags, %.2f ms -> %.1f ns/tag, parse %.1f MB/s" %
          (name, tags, dt * 1e3, dt * 1e9 / tags, total_bytes / dt / 1e6))
