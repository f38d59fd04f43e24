"""E4: production scalar decoder on the real chip — correctness + throughput."""
import sys, time
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compilation")
import snappy_tpu as s
from snappy_tpu.formats import varint
from snappy_tpu.ops import decode_scalar as ds

def sync(x): np.asarray(jax.device_get(x.reshape(-1)[:1]))

def prep(data, nb):
    blocks = [data[i*65536:(i+1)*65536] for i in range((len(data)+65535)//65536)][:nb]
    bodies, decls = [], []
    for blk in blocks:
        e = s.encode(blk); _, v = varint.decode_uint32(e)
        bodies.append(e[v:]); decls.append(len(blk))
    while len(bodies) < nb:
        bodies.append(b""); decls.append(0)
    meta, comp = ds.pack_chunks(bodies, decls)
    return jnp.asarray(meta), jnp.asarray(comp.view(np.int32)), blocks

for name in ("html", "urls.10K", "plrabn12.txt"):
    data = open('/root/reference/tests/data/'+name,'rb').read()
    NB = 16
    meta, comp, blocks = prep(data, NB)
    t0 = time.time()
    out_w, st = ds.decode_chunks_words(meta, comp, NB)
    sync(st)
    if name == "html":
        print("compile+first: %.1fs" % (time.time()-t0))
    st_h = np.asarray(st); out_h = np.asarray(out_w)
    outs = ds.unpack_output(out_h, st_h[:, 0, 1])
    ok = all(bool(st_h[k,0,0]) and outs[k] == blocks[k] for k in range(len(blocks)))
    total = sum(len(b) for b in blocks)
    t0 = time.time(); NIT = 20
    for _ in range(NIT):
        out_w, st = ds.decode_chunks_words(meta, comp, NB)
    sync(st)
    dt = (time.time()-t0)/NIT
    print("%-14s correct=%s  %d chunks %.0f KB: %.3f ms -> %.3f GB/s"
          % (name, ok, len(blocks), total/1024, dt*1e3, total/dt/1e9))

# big batch: 12 MB (192 chunks) of repeated corpus
data = (open('/root/reference/tests/data/urls.10K','rb').read() * 18)[:192*65536]
NB = 192
meta, comp, blocks = prep(data, NB)
out_w, st = ds.decode_chunks_words(meta, comp, NB); sync(st)
st_h = np.asarray(st); out_h = np.asarray(out_w)
outs = ds.unpack_output(out_h, st_h[:, 0, 1])
ok = all(bool(st_h[k,0,0]) and outs[k] == blocks[k] for k in range(len(blocks)))
total = sum(len(b) for b in blocks)
t0 = time.time(); NIT = 5
for _ in range(NIT):
    out_w, st = ds.decode_chunks_words(meta, comp, NB)
sync(st)
dt = (time.time()-t0)/NIT
print("big-batch      correct=%s  %d chunks %.1f MB: %.2f ms -> %.3f GB/s"
      % (ok, NB, total/1e6, dt*1e3, total/dt/1e9))
