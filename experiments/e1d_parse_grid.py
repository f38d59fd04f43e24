"""E1d: amortize per-call overhead — parse N blocks in one pallas_call grid."""
import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compilation")
def sync(x): np.asarray(jax.device_get(x.reshape(-1)[:1]))

C_WORDS = 20480
T_CAP = 8192
UNROLL = 4
NB = 16  # blocks per call

def kernel(n_ref, words_ref, tagpos_ref, meta_ref):
    n = n_ref[0, 0, 0]
    def tag_step(pos):
        w0 = words_ref[0, 0, pos >> 2]
        sh = (pos & 3) * 8
        b = (w0 >> sh) & 255
        t = b & 3
        lc = b >> 2
        ex = jnp.clip(lc - 59, 0, 4)
        p1 = pos + 1
        wa = words_ref[0, 0, p1 >> 2]
        wb = words_ref[0, 0, (p1 >> 2) + 1]
        sh1 = (p1 & 3) * 8
        ext_word = jax.lax.select(sh1 == 0, wa, (wa >> sh1) | (wb << (32 - sh1)))
        m = jax.lax.select(ex == 4, jnp.int32(-1), (jnp.int32(1) << (ex * 8)) - 1)
        lit_len = jax.lax.select(lc < 60, lc + 1, (ext_word & m) + 1)
        is_lit = t == 0
        hdr = jax.lax.select(is_lit, 1 + ex,
              jax.lax.select(t == 1, 2, jax.lax.select(t == 2, 3, 5)))
        return jnp.maximum(hdr + jax.lax.select(is_lit, lit_len, 0), 1)

    def body(state):
        pos, t = state
        for _ in range(UNROLL):
            ok = (pos < n) & (t < T_CAP)
            ts = jnp.minimum(t, T_CAP - 1)
            @pl.when(ok)
            def _():
                tagpos_ref[0, 0, ts] = pos
            c = tag_step(jnp.minimum(pos, 4 * C_WORDS - 8))
            pos = jax.lax.select(ok, pos + c, pos)
            t = jax.lax.select(ok, t + 1, t)
        return pos, t
    def cond(state):
        pos, t = state
        return (pos < n) & (t < T_CAP)
    pos, t = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))
    meta_ref[0, 0, 0] = t
    meta_ref[0, 0, 1] = pos

@jax.jit
def run(words, ns):
    return pl.pallas_call(
        kernel,
        grid=(NB,),
        in_specs=[pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, 1, C_WORDS), lambda i: (i, 0, 0), memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec((1, 1, T_CAP), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
                   pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0), memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((NB, 1, T_CAP), jnp.int32),
                   jax.ShapeDtypeStruct((NB, 1, 2), jnp.int32)),
    )(ns, words)

import sys
sys.path.insert(0, '/root/repo')
import snappy_tpu as s
from snappy_tpu.formats import varint
full = open('/root/reference/tests/data/urls.10K','rb').read()
blocks = [full[i*65536:(i+1)*65536] for i in range(NB)]
arrs = np.zeros((NB, 4*C_WORDS), dtype=np.uint8)
ns = np.zeros((NB,), np.int32)
for k, blk in enumerate(blocks):
    e = s.encode(blk); _, v = varint.decode_uint32(e); bb = e[v:]
    arrs[k, :len(bb)] = np.frombuffer(bb, np.uint8)
    ns[k] = len(bb)
words = jnp.asarray(arrs.view(np.int32)).reshape(NB, 1, -1)
nsd = jnp.asarray(ns).reshape(-1, 1, 1)

t0 = time.time()
tp, meta = run(words, nsd); sync(meta)
print("compile+first: %.1fs" % (time.time()-t0))
m = np.asarray(meta)[:, 0, :]
print("tags per block:", m[:,0].tolist())
total_tags = int(m[:,0].sum())
for trial in range(3):
    t0 = time.time()
    NIT = 30
    for _ in range(NIT):
        tp, meta = run(words, nsd)
    sync(meta)
    dt = (time.time()-t0)/NIT
    print("parse %d blocks (1MB): %.3f ms  (%.1f us/block, %.0f ns/tag, %.2f GB/s)"
          % (NB, dt*1e3, dt/NB*1e6, dt/total_tags*1e9, NB*65536/dt/1e9))
