"""E10: Pallas-fused MXU CRC throughput on the chip + encoder match-hoist check."""
import sys, time
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compilation")
from snappy_tpu.ops import crc32c_mxu, crc32c_native
def sync(x): np.asarray(jax.device_get(x.reshape(-1)[:1]))
N, P = 64, 65536
rng = np.random.default_rng(0)
chunks = rng.integers(0, 256, (N, P), dtype=np.uint8)
lengths = np.full((N,), P, np.int32)
cd, ld = jnp.asarray(chunks.astype(np.int32)), jnp.asarray(lengths)
t0 = time.time()
r = crc32c_mxu.masked_crc32c_chunks_fused(cd, ld, P); sync(r)
print("fused compile+first: %.1fs" % (time.time()-t0))
print("correct:", int(np.asarray(r)[0]) == crc32c_native.masked_crc32c(chunks[0].tobytes()))
for _ in range(3):
    t0 = time.time()
    for _ in range(10): r = crc32c_mxu.masked_crc32c_chunks_fused(cd, ld, P)
    sync(r)
    dt = (time.time()-t0)/10
    print("fused MXU crc 4MB: %.3f ms (%.2f GB/s)" % (dt*1e3, N*P/dt/1e9))

# encoder with hoisted match_len
import snappy_tpu as s
from snappy_tpu.ops import encode_scalar as es
from snappy_tpu.testing import oracle
from snappy_tpu.formats import varint
data = open('/root/reference/tests/data/urls.10K','rb').read()[:10*65536]
blocks = [data[i*65536:(i+1)*65536] for i in range(10)]
meta, inw = es.pack_blocks(blocks)
dm, di = jnp.asarray(meta), jnp.asarray(inw)
t0 = time.time()
enc_w, elen = es.encode_blocks_words(dm, di, 10); sync(elen)
print("encoder compile+first: %.1fs" % (time.time()-t0))
elens = np.asarray(elen)[:, 0, 0]
encs = es.unpack_enc(np.asarray(enc_w), elens)
ok = all(oracle.decode_all_tags(encs[k], len(blocks[k]))[1] is None for k in range(10))
print("encoder correct:", ok)
for _ in range(2):
    t0 = time.time()
    for _ in range(15): enc_w, elen = es.encode_blocks_words(dm, di, 10)
    sync(elen)
    dt = (time.time()-t0)/15
    total = sum(len(b) for b in blocks)
    print("encode 10 blocks: %.2f ms (%.1f MB/s)" % (dt*1e3, total/dt/1e6))
