"""E5: how much of decode time is parse+validate vs the copy engine?
Runs decode_scalar with the emit calls stubbed out."""
import sys, time
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compilation")
import snappy_tpu as s
from snappy_tpu.formats import varint
from snappy_tpu.ops import decode_scalar as ds

# monkeypatch: rebuild the kernel with emits disabled
import snappy_tpu.ops.decode_scalar as mod
src_kernel = mod._kernel

import functools
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _kernel_noemit(meta_ref, comp_ref, out_ref, status_ref):
    n = meta_ref[0, 0, 0]
    m = meta_ref[0, 0, 1]
    def _funnel(wa, wb, sh):
        lo = (wa >> sh) & ((jnp.int32(1) << (32 - sh)) - 1)
        return jax.lax.select(sh == 0, wa, lo | (wb << (32 - sh)))
    def gbyte(p):
        return (comp_ref[0, 0, p >> 2] >> ((p & 3) * 8)) & 255
    def gword_comp(p):
        wa = comp_ref[0, 0, p >> 2]; wb = comp_ref[0, 0, (p >> 2) + 1]
        return _funnel(wa, wb, (p & 3) * 8)
    def tag_step(state):
        pos, w, err = state
        p = pos
        b = gbyte(p); t = b & 3; lc = b >> 2
        is_lit = t == 0
        ex = jnp.clip(lc - 59, 0, 4)
        ext_word = gword_comp(p + 1)
        emask = jax.lax.select(ex == 4, jnp.int32(-1), (jnp.int32(1) << (ex * 8)) - 1)
        ext_val = ext_word & emask
        lit_wrap = is_lit & (lc >= 60) & (ext_val < 0)
        lit_len = jax.lax.select(lc < 60, lc + 1, ext_val + 1)
        hdr = jax.lax.select(is_lit, 1 + ex, 1 + t + ((t >> 1) & t & 1))
        e1 = ext_word & 255
        off = jax.lax.select(t == 1, ((b & 0xE0) << 3) | e1, ext_word)
        off = jax.lax.select(t == 2, ext_word & 0xFFFF, off)
        cl = jax.lax.select(t == 1, 4 + (lc & 7), 1 + lc)
        length = jax.lax.select(is_lit, lit_len, cl)
        consumed = hdr + jax.lax.select(is_lit, length, 0)
        bad = lit_wrap
        bad |= is_lit & (lit_len < 0)
        bad |= (pos + jnp.minimum(consumed, 4*ds.C_WORDS) > n) | (consumed < 0)
        bad |= (length > m - w)
        bad |= (~is_lit) & ((off <= 0) | (off > w))
        pos2 = jax.lax.select(bad, pos, pos + consumed)
        w2 = jax.lax.select(bad, w, w + length)
        return pos2, w2, err | bad
    def cond(state):
        pos, w, err = state
        return (pos < n) & (~err)
    pos, w, err = jax.lax.while_loop(cond, tag_step, (jnp.int32(0), jnp.int32(0), jnp.bool_(False)))
    status_ref[0, 0, 0] = jax.lax.select((~err) & (pos == n) & (w == m), jnp.int32(1), jnp.int32(0))
    status_ref[0, 0, 1] = w
    out_ref[0, 0, 0] = 0

mod._kernel = _kernel_noemit

def sync(x): np.asarray(jax.device_get(x.reshape(-1)[:1]))

data = (open('/root/reference/tests/data/urls.10K','rb').read() * 18)[:192*65536]
blocks = [data[i*65536:(i+1)*65536] for i in range(192)]
bodies, decls = [], []
for blk in blocks:
    e = s.encode(blk); _, v = varint.decode_uint32(e)
    bodies.append(e[v:]); decls.append(len(blk))
meta, comp = ds.pack_chunks(bodies, decls)
meta, comp = jnp.asarray(meta), jnp.asarray(comp)
out_w, st = ds.decode_chunks_words(meta, comp, 192); sync(st)
print("all ok:", bool(np.asarray(st)[:,0,0].all()))
t0 = time.time(); NIT=5
for _ in range(NIT):
    out_w, st = ds.decode_chunks_words(meta, comp, 192)
sync(st)
dt = (time.time()-t0)/NIT
print("parse-only 192 chunks: %.2f ms (%.3f GB/s) vs full ~169 ms" % (dt*1e3, 192*65536/dt/1e9))
