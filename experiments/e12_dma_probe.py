"""E12: probe Mosaic capabilities for the multi-window streaming kernel:
1) DMA from an ANY/HBM input ref at a DYNAMIC word offset into SMEM scratch;
2) DMA from SMEM scratch into the current grid step's SMEM output block;
3) dynamic leading index into 2D SMEM scratch (ring parity)."""
import sys, time
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compilation")
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W = 4096   # SMEM window words
G = 4      # grid steps

def kernel(off_ref, hbm_ref, out_ref, scr, ring, sem1, sem2):
    g = pl.program_id(0)
    p = g & 1
    off_raw = off_ref[0, 0, 0] + g * W  # dynamic word offset
    off = pl.multiple_of((off_raw >> 10) << 10, 1024)  # 1024-word aligned
    dma = pltpu.make_async_copy(hbm_ref.at[pl.ds(off, W)], scr, sem1)
    dma.start()
    dma.wait()
    # touch via scalar + write into ring[p]
    def body(i, c):
        ring[p, 0, 0, i] = scr[i] + 1
        return c
    jax.lax.fori_loop(0, W, body, 0)
    # read a value from the OTHER ring slot (prev window analog)
    prev0 = ring[1 - p, 0, 0, 0]
    ring[p, 0, 0, 0] = ring[p, 0, 0, 0] + prev0 * 0  # keep dependency
    dma2 = pltpu.make_async_copy(ring.at[p], out_ref, sem2)
    dma2.start()
    dma2.wait()

@jax.jit
def run(off, hbm):
    return pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda i: (0, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, W), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((G, 1, W), jnp.int32),
        scratch_shapes=[
            pltpu.SMEM((W,), jnp.int32),
            pltpu.SMEM((2, 1, 1, W), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )(off, hbm)

hbm = jnp.arange(16 * W, dtype=jnp.int32)
off = jnp.asarray([[[W // 2]]], dtype=jnp.int32)
t0 = time.time()
r = run(off, hbm)
got = np.asarray(r)
print("compile+run: %.1fs" % (time.time()-t0))
al = (W//2 >> 10) << 10
ok = all(np.array_equal(got[g, 0], np.arange(al + g*W, al + (g+1)*W) + 1) for g in range(G))
print("DMA probe correct:", ok)
