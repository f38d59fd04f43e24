"""E3: SMEM word-copy loop throughput on the scalar core.
Simulates the decoder's copy kernel: per iteration, read an unaligned
word (2 reads + shifts) and store an aligned word. Unrolled 4x."""
import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compilation")
def sync(x): np.asarray(jax.device_get(x.reshape(-1)[:1]))

W = 16384  # 64KB in words
NB = 8

def kernel(n_ref, src_ref, out_ref):
    nwords = n_ref[0, 0, 0]
    def body(i, carry):
        # unaligned source read at byte offset 4*i+1 -> aligned store at word i
        for u in range(4):
            j = 4 * i + u
            s = j + 0  # word index
            wa = src_ref[0, 0, s]
            wb = src_ref[0, 0, s + 1]
            w = (wa >> 8) | (wb << 24)  # shift by 1 byte
            out_ref[0, 0, j] = w
        return carry
    jax.lax.fori_loop(0, nwords // 4, body, 0)

@jax.jit
def run(src, ns):
    return pl.pallas_call(
        kernel, grid=(NB,),
        in_specs=[pl.BlockSpec((1,1,1), lambda i: (i,0,0), memory_space=pltpu.SMEM),
                  pl.BlockSpec((1,1,W+8), lambda i: (i,0,0), memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1,1,W), lambda i: (i,0,0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((NB,1,W), jnp.int32),
    )(ns, src)

src = jnp.asarray(np.random.randint(0, 2**31, (NB,1,W+8), dtype=np.int32))
ns = jnp.asarray(np.full((NB,1,1), W, np.int32))
t0=time.time(); r = run(src, ns); sync(r); print("compile: %.1fs" % (time.time()-t0))
for _ in range(3):
    t0=time.time(); NIT=30
    for _ in range(NIT): r = run(src, ns)
    sync(r)
    dt=(time.time()-t0)/NIT
    print("copy %d x 64KB: %.3f ms (%.1f ns/word, %.2f GB/s)"
          % (NB, dt*1e3, dt/(NB*W)*1e9, NB*W*4/dt/1e9))
