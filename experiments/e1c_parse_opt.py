"""E1c: optimized scalar parser — pl.when-guarded writes, shift masks,
smaller SMEM footprint; measures fixed overhead via a tiny input."""
import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compilation")

def sync(x):
    np.asarray(jax.device_get(x.reshape(-1)[:1]))

C_WORDS = 20480   # 80KB compressed cap (one 64KiB block worst case 76490)
T_CAP = 8192      # typical-case cap; overflow flag triggers big-cap rerun
UNROLL = 4

def kernel(words_ref, n_ref, tagpos_ref, meta_ref):
    n = n_ref[0]

    def tag_step(pos):
        w0 = words_ref[pos >> 2]
        sh = (pos & 3) * 8
        b = (w0 >> sh) & 255
        t = b & 3
        lc = b >> 2
        ex = jnp.clip(lc - 59, 0, 4)
        p1 = pos + 1
        wa = words_ref[p1 >> 2]
        wb = words_ref[(p1 >> 2) + 1]
        sh1 = (p1 & 3) * 8
        ext_word = jax.lax.select(sh1 == 0, wa, (wa >> sh1) | (wb << (32 - sh1)))
        m = jax.lax.select(ex == 4, jnp.int32(-1),
                           (jnp.int32(1) << (ex * 8)) - 1)
        lit_len = jax.lax.select(lc < 60, lc + 1, (ext_word & m) + 1)
        is_lit = t == 0
        hdr = jax.lax.select(is_lit, 1 + ex,
              jax.lax.select(t == 1, 2, jax.lax.select(t == 2, 3, 5)))
        consumed = hdr + jax.lax.select(is_lit, lit_len, 0)
        return jnp.maximum(consumed, 1)

    def body(state):
        pos, t = state
        for _ in range(UNROLL):
            ok = (pos < n) & (t < T_CAP)
            ts = jnp.minimum(t, T_CAP - 1)
            @pl.when(ok)
            def _():
                tagpos_ref[ts] = pos
            c = tag_step(jnp.minimum(pos, 4 * C_WORDS - 8))
            pos = jax.lax.select(ok, pos + c, pos)
            t = jax.lax.select(ok, t + 1, t)
        return pos, t

    def cond(state):
        pos, t = state
        return (pos < n) & (t < T_CAP)

    pos, t = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))
    meta_ref[0] = t
    meta_ref[1] = pos

@jax.jit
def run(words, n):
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((T_CAP,), jnp.int32),
                   jax.ShapeDtypeStruct((2,), jnp.int32)),
    )(words, n)

import sys
sys.path.insert(0, '/root/repo')
import snappy_tpu as s
from snappy_tpu.formats import varint
data = open('/root/reference/tests/data/html','rb').read()[:65536]
enc = s.encode(data)
_, vlen = varint.decode_uint32(enc)
body_b = enc[vlen:]
arr = np.zeros(4 * C_WORDS, dtype=np.uint8)
arr[:len(body_b)] = np.frombuffer(body_b, np.uint8)
words = jnp.asarray(arr.view(np.int32))

for label, nn in (("tiny-16B", 16), ("html-block", len(body_b))):
    n = jnp.asarray([nn], dtype=jnp.int32)
    t0 = time.time()
    tp, meta = run(words, n); sync(meta)
    if label == "tiny-16B":
        print("compile+first: %.1fs" % (time.time() - t0))
    m = np.asarray(meta)
    for trial in range(2):
        t0 = time.time()
        NIT = 50
        for _ in range(NIT):
            tp, meta = run(words, n)
        sync(meta)
        dt = (time.time() - t0) / NIT
        print("%s: tags=%d  %.3f ms (%.0f ns/tag)" % (label, m[0], dt*1e3, dt/max(1,m[0])*1e9))
