"""E1b: realistic snappy tag parse on the scalar core, 4-way unrolled.

Each sub-step does the full tag-advance: read word(s), decode kind,
compute consumed, emit tag position. Guarded by pos<n selects (branchless).
"""
import time, functools
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compilation")

def sync(x):
    np.asarray(jax.device_get(x.reshape(-1)[:1]))

C_WORDS = 32768  # up to 128KB compressed
T_CAP = 40960    # max tags
UNROLL = 4

def kernel(words_ref, n_ref, tagpos_ref, meta_ref):
    n = n_ref[0]

    def get_byte(p):
        w = words_ref[p >> 2]
        return (w >> ((p & 3) * 8)) & 255

    def tag_step(pos):
        """Return (consumed,) for a tag at pos; assumes pos < n."""
        b = get_byte(pos)
        t = b & 3
        lc = b >> 2
        # literal: ext bytes for lc >= 60
        ex = jnp.clip(lc - 59, 0, 4)
        # read up to 4 extension bytes as a little-endian word at pos+1
        p1 = pos + 1
        w0 = words_ref[p1 >> 2]
        w1 = words_ref[(p1 >> 2) + 1]
        sh = (p1 & 3) * 8
        ext_word = jax.lax.select(sh == 0, w0, (w0 >> sh) | (w1 << (32 - sh)))
        mask = jax.lax.select(ex == 0, 0,
                (jnp.int32(-1) >> (8 * (4 - ex))) & jnp.int32(0x7fffffff) | jax.lax.select(ex == 4, jnp.int32(-1) << 31, 0))
        # simpler: mask by ex bytes
        m = jax.lax.switch(ex, [lambda: jnp.int32(0), lambda: jnp.int32(0xff),
                                lambda: jnp.int32(0xffff), lambda: jnp.int32(0xffffff),
                                lambda: jnp.int32(-1)])
        ext_val = ext_word & m
        lit_len = jax.lax.select(lc < 60, lc + 1, ext_val + 1)
        hdr = jax.lax.select(t == 0, 1 + ex,
              jax.lax.select(t == 1, 2, jax.lax.select(t == 2, 3, 5)))
        consumed = hdr + jax.lax.select(t == 0, lit_len, 0)
        return jnp.maximum(consumed, 1)

    def body(state):
        pos, t = state
        for _ in range(UNROLL):
            ok = (pos < n) & (t < T_CAP)
            tagpos_ref[jnp.minimum(t, T_CAP - 1)] = jax.lax.select(ok, pos, tagpos_ref[jnp.minimum(t, T_CAP - 1)])
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
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((T_CAP,), jnp.int32),
                   jax.ShapeDtypeStruct((2,), jnp.int32)),
    )(words, n)

# Build a real snappy tag stream: encode html corpus block
import sys
sys.path.insert(0, '/root/repo')
import snappy_tpu as s
from snappy_tpu.formats import varint
data = open('/root/reference/tests/data/html','rb').read()[:65536]
enc = s.encode(data)
_, vlen = varint.decode_uint32(enc)
body_bytes = enc[vlen:]
print("compressed body:", len(body_bytes))
arr = np.zeros(4 * C_WORDS, dtype=np.uint8)
arr[:len(body_bytes)] = np.frombuffer(body_bytes, np.uint8)
words = jnp.asarray(arr.view(np.int32))
n = jnp.asarray([len(body_bytes)], dtype=jnp.int32)

t0 = time.time()
tp, meta = run(words, n)
sync(meta)
print("compile+first: %.1fs" % (time.time() - t0))
m = np.asarray(meta)
print("tags found:", m[0], "end pos:", m[1], "(body len %d)" % len(body_bytes))

for trial in range(3):
    t0 = time.time()
    NIT = 50
    for _ in range(NIT):
        tp, meta = run(words, n)
    sync(meta)
    dt = (time.time() - t0) / NIT
    print("parse: %.3f ms  (%.0f ns/tag, %.0f MB/s of output)"
          % (dt*1e3, dt/max(1,m[0])*1e9, 65536/dt/1e6))

# sanity: verify tag positions against python oracle walk
from snappy_tpu.testing import oracle
tags_ref = []
pos = 0
b = body_bytes
while pos < len(b):
    tags_ref.append(pos)
    tb = b[pos]
    t = tb & 3
    lc = tb >> 2
    if t == 0:
        ex = max(0, min(lc - 59, 4))
        if ex:
            v = int.from_bytes(b[pos+1:pos+1+ex], 'little')
            ll = v + 1
        else:
            ll = lc + 1
        pos += 1 + ex + ll
    elif t == 1:
        pos += 2
    elif t == 2:
        pos += 3
    else:
        pos += 5
got_tags = np.asarray(tp)[:m[0]]
want = np.asarray(tags_ref, dtype=np.int32)
print("tag positions match oracle:", np.array_equal(got_tags, want), len(want))
