"""E7: Pallas CRC kernel with unrolled LFSR clocks (VMEM-resident)."""
import sys, time
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compilation")
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from snappy_tpu.ops import crc32c_jax, crc32c_native
import snappy_tpu.ops.crc32c_pallas as cp
import functools

def sync(x): np.asarray(jax.device_get(x.reshape(-1)[:1]))

def kernel_factory(lanes, n_levels, unroll_clocks):
    def kernel(mats_ref, words_ref, out_ref):
        x = words_ref[:]
        if unroll_clocks:
            poly = jnp.uint32(cp._POLY)
            for _ in range(32):
                m = x & jnp.uint32(1)
                x = (x >> 1) ^ (poly * m)
        else:
            def clock(_, x):
                m = x & jnp.uint32(1)
                return (x >> 1) ^ (jnp.uint32(cp._POLY) * m)
            x = jax.lax.fori_loop(0, 32, clock, x)
        half = lanes // 2
        for level in range(n_levels):
            left = x[:, :half]
            right = x[:, half : 2 * half]
            def mat_bit(i, acc):
                bit = (left >> jnp.uint32(i)) & jnp.uint32(1)
                return acc ^ (mats_ref[level, i] * bit)
            x = jax.lax.fori_loop(0, 32, mat_bit, jnp.zeros_like(left)) ^ right
            half //= 2
        out_ref[:] = jnp.broadcast_to(x[:, :1], out_ref.shape)
    return kernel

ROWS = 8
@functools.partial(jax.jit, static_argnums=(1, 2))
def lane_fold(words, lanes, unroll):
    n = words.shape[0]
    mats = np.stack([m.astype(np.uint32) for m in cp._fold_matrices(lanes)])
    out = pl.pallas_call(
        kernel_factory(lanes, mats.shape[0], unroll),
        grid=(n // ROWS,),
        in_specs=[
            pl.BlockSpec((mats.shape[0], 32), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((ROWS, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 128), jnp.uint32),
    )(jnp.asarray(mats), words)
    return out[:, 0]

N, P = 64, 65536
rng = np.random.default_rng(0)
chunks = rng.integers(0, 256, (N, P), dtype=np.uint8)
b = chunks.astype(np.uint32).reshape(N, P//4, 4)
words = b[:,:,0] | (b[:,:,1]<<8) | (b[:,:,2]<<16) | (b[:,:,3]<<24)
wd = jnp.asarray(words)

for unroll in (False, True):
    t0 = time.time()
    r = lane_fold(wd, P//4, unroll); sync(r)
    print("unroll=%s compile+first: %.1fs" % (unroll, time.time()-t0))
    t0 = time.time()
    for _ in range(10): r = lane_fold(wd, P//4, unroll)
    sync(r)
    dt = (time.time()-t0)/10
    print("  %.3f ms (%.2f GB/s)" % (dt*1e3, N*P/dt/1e9))
    # correctness: finish the crc on host for chunk 0
    reg = int(np.asarray(r)[0]) ^ int(crc32c_jax._init_term(P))
    want_reg = None
    import zlib
    # verify via native full path
    full = crc32c_native.masked_crc32c(chunks[0].tobytes())
    got = ((reg ^ 0xFFFFFFFF) >> 15 | (reg ^ 0xFFFFFFFF) << 17) & 0xFFFFFFFF
    got = (got + 0xA282EAD8) & 0xFFFFFFFF
    print("  correct:", got == full)
