"""E26: can the DMA engines take over long-segment emission?  NO — proof.

The scalar word loop commits ~2 words per iteration (~0.7 GB/s), which is
the measured ceiling on incompressible streams.  The hope: an async
SMEM->SMEM DMA moves long segments while the scalar core keeps parsing.

KILLER (first compile attempt, kept below as finding F0): Mosaic SMEM
memref slices must be aligned to the 1024-word tiling — BOTH the offset
and the length of `ref.at[pl.ds(off, L)]` must be multiples of 1024
words (4 KiB).  Snappy segments start at arbitrary BYTE offsets, so no
tag-level emit can be expressed as a DMA at all.  The same constraint
already shaped the HBM slab layout (CW_PAD multiples in decode_scalar).

What this script still measures (the rest of the proof, on-chip):

  A. scalar word-copy loop ns/word (baseline = emit_mem interior)
  B. SMEM->SMEM DMA at the only legal granularity (4 KiB aligned):
     latency + bandwidth -> how big a segment WOULD have to be
  D. overlap: a 4 KiB-aligned DMA in flight under a dependent scalar
     chain — does the scalar core keep issuing while the DMA runs?

Run:  python experiments/e26_dma_emit.py [interpret]
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

BUF = 40960  # int32 words of SMEM scratch (160 KiB)


def sync(x):
    np.asarray(jax.device_get(x.reshape(-1)[:1]))


def bench(fn, *args, nit=10):
    r = fn(*args)
    sync(r)
    t0 = time.time()
    for _ in range(nit):
        r = fn(*args)
    sync(r)
    return (time.time() - t0) / nit, r


def reps_for(L):
    """Keep each call ~8M words of traffic so tunnel dispatch amortizes."""
    return 2 if INTERPRET else max(64, (1 << 23) // max(L, 1))


def pcall(kernel, nsem=1):
    @jax.jit
    def call(src):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            scratch_shapes=[pltpu.SMEM((BUF,), jnp.int32),
                            pltpu.SemaphoreType.DMA if nsem == 1
                            else pltpu.SemaphoreType.DMA((nsem,))],
            interpret=INTERPRET,
        )(src)
    return call


# ------------------------------------------------------------- 0: empty floor
def make_empty(R):
    def k(src_ref, out_ref, buf_ref, sem):
        cp = pltpu.make_async_copy(src_ref, buf_ref.at[pl.ds(0, 8192)], sem)
        cp.start(); cp.wait()

        def rep(r, acc):
            return acc + buf_ref[r & 1023]

        out_ref[0, 0] = jax.lax.fori_loop(0, R, rep, jnp.int32(0))
    return pcall(k)


# --------------------------------------------------------------- A: word loop
def make_wordloop(L, R):
    def k(src_ref, out_ref, buf_ref, sem):
        cp = pltpu.make_async_copy(src_ref, buf_ref.at[pl.ds(0, 8192)], sem)
        cp.start(); cp.wait()

        def rep(r, acc):
            base = 8192 + (r & 3) * 4096

            def body(st):
                kk, wo, si = st
                buf_ref[wo] = buf_ref[si]
                buf_ref[wo + 1] = buf_ref[si + 1]
                return kk + 2, wo + 2, si + 2

            _, wo, _ = jax.lax.while_loop(
                lambda st: st[0] < L, body,
                (jnp.int32(0), jnp.int32(base), jnp.int32(r & 7)))
            return acc + buf_ref[base] + wo

        out_ref[0, 0] = jax.lax.fori_loop(0, R, rep, jnp.int32(0))
    return pcall(k)


# --------------------------------- B: SMEM->SMEM DMA (4 KiB-aligned, only legal)
def make_dmaloop(L, R):
    assert L % 1024 == 0
    def k(src_ref, out_ref, buf_ref, sem):
        cp = pltpu.make_async_copy(src_ref, buf_ref.at[pl.ds(0, 8192)], sem)
        cp.start(); cp.wait()

        def rep(r, acc):
            base = 8192 + (r & 3) * 4096
            d = pltpu.make_async_copy(
                buf_ref.at[pl.ds((r & 1) * 1024, L)],
                buf_ref.at[pl.ds(base, L)], sem)
            d.start()
            d.wait()
            return acc + buf_ref[base]

        out_ref[0, 0] = jax.lax.fori_loop(0, R, rep, jnp.int32(0))
    return pcall(k)


# ---------------------------------------------------------------- D: overlap
def make_overlap(L, R, K, do_dma):
    """R reps of: [start DMA of L words] + K-iteration dependent scalar
    chain + [wait].  do_dma=False -> pure chain time."""
    def k(src_ref, out_ref, buf_ref, sem):
        cp = pltpu.make_async_copy(src_ref, buf_ref.at[pl.ds(0, 8192)], sem)
        cp.start(); cp.wait()

        def rep(r, acc):
            base = 8192 + (r & 3) * 4096
            if do_dma:
                d = pltpu.make_async_copy(
                    buf_ref.at[pl.ds((r & 1) * 1024, L)],
                    buf_ref.at[pl.ds(base, L)], sem)
                d.start()

            def body(st):
                p, s = st
                w = buf_ref[p & 4095]
                p2 = p + ((w >> (p & 3)) & 7) + 1
                return p2, s + w

            p, s = jax.lax.while_loop(
                lambda st: st[1] < K + st[0] * 0, body,
                (jnp.int32(r & 15), jnp.int32(0)))
            s = s & 0  # chain result folded to 0; keep dependency via p
            if do_dma:
                d.wait()
            return acc + s + p + buf_ref[base]

        out_ref[0, 0] = jax.lax.fori_loop(0, R, rep, jnp.int32(0))
    return pcall(k)


rng = np.random.default_rng(0)
# small positive words so the chain walk advances 1..8 per step
src = jnp.asarray(rng.integers(1, 7, size=8192, dtype=np.int32))

print("== 0: empty rep floor ==")
R0 = 2 if INTERPRET else 1 << 20
dt0, _ = bench(make_empty(R0), src)
print("  %.2f ns/rep (loop+1 load floor)" % (dt0 / R0 * 1e9))

print("== A: scalar word-copy loop (2 words/iter) ==")
for L in (16, 64, 256, 1024, 4096):
    R = reps_for(L)
    dt, _ = bench(make_wordloop(L, R), src)
    ns = dt / R * 1e9
    print("  L=%5d words: %9.1f ns/seg  %6.2f ns/word  %7.2f GB/s"
          % (L, ns, ns / L, 4 * L / ns))

print("== B: SMEM->SMEM DMA start+wait (4 KiB-aligned only) ==")
for L in (1024, 2048, 4096):
    R = reps_for(L)
    dt, _ = bench(make_dmaloop(L, R), src)
    ns = dt / R * 1e9
    print("  L=%5d words: %9.1f ns/seg  %6.2f ns/word  %7.2f GB/s"
          % (L, ns, ns / L, 4 * L / ns))

print("== D: overlap (DMA L=4096 words under a K-long dependent chain) ==")
L = 4096
R = reps_for(L)
dtb, _ = bench(make_dmaloop(L, R), src)
for K in (256, 1024, 4096, 16384):
    dt_nod, _ = bench(make_overlap(L, R, K, False), src)
    dt_dma, _ = bench(make_overlap(L, R, K, True), src)
    chain = dt_nod / R * 1e9
    both = dt_dma / R * 1e9
    serial = dtb / R * 1e9
    hidden = 100 * max(0.0, 1 - max(both - chain, 0) / serial)
    print("  K=%5d: chain %8.1f ns, chain+dma %8.1f ns, dma alone %8.1f ns"
          " -> %3.0f%% of the DMA hidden" % (K, chain, both, serial, hidden))
