"""E26b: what is the finest legal DMA slice granularity in SMEM/VMEM?

e26 found 1D SMEM memrefs carry #tpu.tiled<(1024)> — slice offset/shape
must be 4 KiB-aligned.  Here: does a 2D buffer (N, W) reduce the dim-0
tiling so `ref.at[pl.ds(off, L), :]` can start at a finer pitch?  And do
VMEM refs behave differently?  Each case compiles+runs a tiny kernel and
prints OK/FAIL.

python experiments/e26b_dma_granularity.py
"""
import sys
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compilation")


def try_case(name, build):
    try:
        r = build()
        np.asarray(jax.device_get(r))
        print("  OK   %s" % name)
        return True
    except Exception as e:
        msg = str(e)
        for line in msg.splitlines():
            if "must be aligned" in line or "Not implemented" in line \
                    or "Unsupported" in line or "invalid" in line.lower():
                msg = line.strip()
                break
        else:
            msg = msg.splitlines()[0][:160] if msg else "?"
        print("  FAIL %s: %s" % (name, msg[:200]))
        return False


def smem2d(rows, w, off, L):
    def k(src_ref, out_ref, buf_ref, sem):
        d = pltpu.make_async_copy(
            buf_ref.at[pl.ds(off, L), :], buf_ref.at[pl.ds(off + L, L), :],
            sem)
        d.start(); d.wait()
        out_ref[0, 0] = buf_ref[off + L, 0]

    def call():
        return pl.pallas_call(
            k,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            scratch_shapes=[pltpu.SMEM((rows, w), jnp.int32),
                            pltpu.SemaphoreType.DMA],
        )(jnp.zeros((8,), jnp.int32))
    return call


def vmem1d(n, off, L):
    def k(src_ref, out_ref, buf_ref, sem, sem2):
        d = pltpu.make_async_copy(
            buf_ref.at[pl.ds(off, L)], buf_ref.at[pl.ds(off + L, L)], sem)
        d.start(); d.wait()
        d2 = pltpu.make_async_copy(
            buf_ref.at[pl.ds(0, 8)], out_ref, sem2)
        d2.start(); d2.wait()

    def call():
        return pl.pallas_call(
            k,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((8,), jnp.int32),
            scratch_shapes=[pltpu.VMEM((n,), jnp.int32),
                            pltpu.SemaphoreType.DMA,
                            pltpu.SemaphoreType.DMA],
        )(jnp.zeros((8,), jnp.int32))
    return call


def vmem2d(rows, w, off, L):
    def k(src_ref, out_ref, buf_ref, sem, sem2):
        d = pltpu.make_async_copy(
            buf_ref.at[pl.ds(off, L), :], buf_ref.at[pl.ds(off + L, L), :],
            sem)
        d.start(); d.wait()
        d2 = pltpu.make_async_copy(buf_ref.at[pl.ds(0, 8), :], out_ref, sem2)
        d2.start(); d2.wait()

    def call():
        return pl.pallas_call(
            k,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((8, w), jnp.int32),
            scratch_shapes=[pltpu.VMEM((rows, w), jnp.int32),
                            pltpu.SemaphoreType.DMA,
                            pltpu.SemaphoreType.DMA],
        )(jnp.zeros((8,), jnp.int32))
    return call


def smem2d_to_smem1d(rows, w, off, L):
    """Cross-shape DMA: (L, w) 2D slice -> 1D flat SMEM slice."""
    def k(src_ref, out_ref, b2_ref, b1_ref, sem):
        d = pltpu.make_async_copy(
            b2_ref.at[pl.ds(off, L), :], b1_ref.at[pl.ds(0, 1024)], sem)
        d.start(); d.wait()
        out_ref[0, 0] = b1_ref[0]

    def call():
        return pl.pallas_call(
            k,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            scratch_shapes=[pltpu.SMEM((rows, w), jnp.int32),
                            pltpu.SMEM((1024,), jnp.int32),
                            pltpu.SemaphoreType.DMA],
        )(jnp.zeros((8,), jnp.int32))
    return call


print("== SMEM 2D (rows, 8): dim-0 slice pitch ==")
try_case("(5120,8) off=1024 L=128 (x8 words = 1 KiW rows?)",
         smem2d(5120, 8, 1024, 128))
try_case("(5120,8) off=128  L=128", smem2d(5120, 8, 128, 128))
try_case("(5120,8) off=1    L=8", smem2d(5120, 8, 1, 8))

print("== SMEM 2D (rows, 128) ==")
try_case("(320,128) off=8 L=8", smem2d(320, 128, 8, 8))
try_case("(320,128) off=1 L=1", smem2d(320, 128, 1, 1))

print("== VMEM 1D ==")
try_case("(40960,) off=1024 L=1024", vmem1d(40960, 1024, 1024))
try_case("(40960,) off=128  L=128", vmem1d(40960, 128, 128))
try_case("(40960,) off=1    L=8", vmem1d(40960, 1, 8))

print("== VMEM 2D (rows, 128) ==")
try_case("(320,128) off=8 L=8", vmem2d(320, 128, 8, 8))
try_case("(320,128) off=1 L=1", vmem2d(320, 128, 1, 1))

print("== cross-shape SMEM (128-row x 8) 2D -> 1024-word 1D ==")
try_case("(5120,8) rows off=128 L=128 -> flat 1024",
         smem2d_to_smem1d(5120, 8, 128, 128))
