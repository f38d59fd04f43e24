"""E6: CRC bit-serial clocks — fori_loop vs fully unrolled elementwise chain."""
import sys, time
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compilation")
from snappy_tpu.ops import crc32c_jax as cj
from snappy_tpu.ops import crc32c_native

def sync(x): np.asarray(jax.device_get(x.reshape(-1)[:1]))

N, P = 64, 65536   # 4 MB batch
rng = np.random.default_rng(0)
chunks = rng.integers(0, 256, (N, P), dtype=np.uint8).astype(np.int32)
lengths = np.full((N,), P, np.int32)
cd, ld = jnp.asarray(chunks), jnp.asarray(lengths)

r = cj.masked_crc32c_chunks(cd, ld, P); sync(r)
t0 = time.time()
for _ in range(10): r = cj.masked_crc32c_chunks(cd, ld, P)
sync(r)
dt = (time.time()-t0)/10
print("fori clocks: %.3f ms (%.2f GB/s)" % (dt*1e3, N*P/dt/1e9))

# unrolled variant
def lane_registers_unrolled(chunk_u32):
    lanes = chunk_u32.shape[0]
    b = chunk_u32
    x = (b[:, 0].astype(jnp.uint32) | (b[:, 1].astype(jnp.uint32) << 8)
         | (b[:, 2].astype(jnp.uint32) << 16) | (b[:, 3].astype(jnp.uint32) << 24))
    poly = jnp.uint32(cj._POLY_REFLECTED)
    for _ in range(32):
        m = x & jnp.uint32(1)
        x = (x >> 1) ^ (poly * m)
    return x

def crc_padded_unrolled(chunk_bytes, length, padded_len):
    lanes = padded_len // 4
    regs = lane_registers_unrolled(chunk_bytes.reshape(lanes, 4))
    fwd, inv = cj._shift_matrices()
    level = 0
    while regs.shape[0] > 1:
        cols = jnp.asarray(fwd[2 + level])
        left, right = regs[0::2], regs[1::2]
        regs = cj._mat_apply_jnp(cols, left) ^ right
        level += 1
    reg = regs[0] ^ jnp.uint32(cj._init_term(padded_len))
    pad = (jnp.int32(padded_len) - length).astype(jnp.uint32)
    for j in range(17):
        cols = jnp.asarray(inv[j])
        bit = (pad >> jnp.uint32(j)) & jnp.uint32(1)
        reg = jnp.where(bit == 1, cj._mat_apply_jnp(cols, reg[None])[0], reg)
    return reg ^ jnp.uint32(0xFFFFFFFF)

import functools
@functools.partial(jax.jit, static_argnums=(2,))
def crc_unrolled(chunks, lengths, padded_len):
    un = jax.vmap(lambda c, n: crc_padded_unrolled(c, n, padded_len))(chunks, lengths)
    return cj.mask_crc(un)

t0 = time.time()
r2 = crc_unrolled(cd, ld, P); sync(r2)
print("unrolled compile+first: %.1fs" % (time.time()-t0))
want = crc32c_native.masked_crc32c(chunks[0].astype(np.uint8).tobytes())
print("correct:", int(np.asarray(r2)[0]) == want, np.array_equal(np.asarray(r), np.asarray(r2)))
t0 = time.time()
for _ in range(10): r2 = crc_unrolled(cd, ld, P)
sync(r2)
dt = (time.time()-t0)/10
print("unrolled: %.3f ms (%.2f GB/s)" % (dt*1e3, N*P/dt/1e9))
