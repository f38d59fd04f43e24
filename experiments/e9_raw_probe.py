"""E9: why is the single-stream raw (big-window) kernel slow? Probe per-call
cost vs the chunked kernel on identical data."""
import sys, time
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compilation")
import snappy_tpu as s
from snappy_tpu.formats import varint
from snappy_tpu.ops import decode_scalar as ds

def sync(x): np.asarray(jax.device_get(x.reshape(-1)[:1]))

data = open('/root/reference/tests/data/html','rb').read()
enc = s.encode(data); _, v = varint.decode_uint32(enc)
body = enc[v:]

# raw big-window
rmeta, rcomp = ds.pack_raw(body, len(data))
drm, drc = jax.device_put(jnp.asarray(rmeta)), jax.device_put(jnp.asarray(rcomp))
out, st = ds.decode_raw_words(drm, drc); sync(st)
print("raw ok:", bool(np.asarray(st)[0,0,0]))
for _ in range(2):
    t0 = time.time()
    for _ in range(10): out, st = ds.decode_raw_words(drm, drc)
    sync(st)
    print("raw single window: %.2f ms" % ((time.time()-t0)/10*1e3))

# same content through the chunk kernel (2 chunks)
blocks = [data[:65536], data[65536:]]
bodies, decls = [], []
for blk in blocks:
    e = s.encode(blk); _, vv = varint.decode_uint32(e)
    bodies.append(e[vv:]); decls.append(len(blk))
bodies += [b""] * 6; decls += [0] * 6
meta, comp = ds.pack_chunks(bodies, decls)
dm, dc = jax.device_put(jnp.asarray(meta)), jax.device_put(jnp.asarray(comp))
o2, s2 = ds.decode_chunks_words(dm, dc, 8); sync(s2)
for _ in range(2):
    t0 = time.time()
    for _ in range(10): o2, s2 = ds.decode_chunks_words(dm, dc, 8)
    sync(s2)
    print("chunked (8-slab): %.2f ms" % ((time.time()-t0)/10*1e3))
