"""E22: nested probe/copy-chain loops in the encoder (production A/B).

The flat phase-switch loop paid a lax.cond dispatch + a 7-value carry per
probe; the nested structure (reference encoder.nim:255-381 shape, same
two-tier insight as the grid decoder) carries 4 values through a dedicated
probe loop.  This measures the PRODUCTION ops/encode_scalar.py on-chip —
run before and after the restructure (git stash) for the A/B, and checks
output bytes decode everywhere + sizes vs the greedy oracle.
"""
import sys, time
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compilation")
import snappy_tpu as s
from snappy_tpu.ops import encode_scalar as es
from snappy_tpu.testing import oracle

def sync(x): np.asarray(jax.device_get(x.reshape(-1)[:1]))

import os
ddir = '/root/reference/tests/data/'
corpus = {n: open(ddir+n,'rb').read() for n in
          ('html', 'urls.10K', 'alice29.txt', 'plrabn12.txt',
           'fireworks.jpeg', 'paper-100k.pdf')}

NB = 96
for name, data in corpus.items():
    blocks = [data[i*65536:(i+1)*65536] for i in range(-(-len(data)//65536))]
    reps = (blocks * (NB // len(blocks) + 1))[:NB]
    meta, inw = es.pack_blocks(reps)
    dm, di = jax.device_put(jnp.asarray(meta)), jax.device_put(jnp.asarray(inw))
    enc_w, enc_l = es.encode_blocks_words(dm, di, NB)
    sync(enc_l)
    # correctness: every block decodes + size == oracle greedy size
    encs = es.unpack_enc(np.asarray(enc_w), np.asarray(enc_l).reshape(-1))
    ok = True
    for k, b in enumerate(reps[:len(blocks)]):
        out, errc = oracle.decode_all_tags(encs[k], len(b))
        osz = len(oracle.encode_block(b))
        ok &= (errc is None and bytes(out) == b
               and len(encs[k]) <= osz + osz // 1000 + 8)
    total = sum(len(b) for b in reps)
    t0 = time.time(); NIT = 4
    for _ in range(NIT):
        enc_w, enc_l = es.encode_blocks_words(dm, di, NB)
    sync(enc_l)
    dt = (time.time()-t0)/NIT
    print("%-16s ok=%s %5.2f MB: %7.1f ms -> %6.1f MB/s (sizes vs oracle ok)"
          % (name, ok, total/1e6, dt*1e3, total/dt/1e6))
