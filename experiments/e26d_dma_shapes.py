"""E26d: DMA shape-compatibility facts that decide the long-segment design.

  1. cross-shape equal-count DMA: (32,128) VMEM <-> (4096,) 1D SMEM slice
     (if legal, the unified 1D SMEM buffer can stay 1D: 4 KiB-aligned
     slices bounce through a 2D VMEM tile for the VPU rotate)
  2. the REAL error for 1D VMEM slices (e26b's got masked)
  3. the REAL error for (rows, 8) SMEM slices
  4. scalar hot-loop cost of 2D SMEM indexing vs 1D (is (p>>9, (p>>2)&127)
     per access affordable?)

python experiments/e26d_dma_shapes.py
"""
import sys, time
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
        lines = [l for l in str(e).splitlines()
                 if ("error" in l.lower() or "aligned" in l.lower()
                     or "support" in l.lower() or "invalid" in l.lower())
                 and "TPU_WORKER" not in l and "hostname" not in l]
        print("  FAIL %s" % name)
        for l in lines[:4]:
            print("        %s" % l.strip()[:180])
        return False


def cross(src_shape, dst_shape, s_space, d_space, s_off, d_off):
    def k(x_ref, out_ref, b_src, b_dst, sem):
        sl_s = b_src.at[pl.ds(s_off, src_shape[0] if len(src_shape) == 2
                              else src_shape[0])] \
            if len(src_shape) == 1 else b_src.at[pl.ds(s_off, src_shape[0]), :]
        sl_d = b_dst.at[pl.ds(d_off, dst_shape[0])] \
            if len(dst_shape) == 1 else b_dst.at[pl.ds(d_off, dst_shape[0]), :]
        d = pltpu.make_async_copy(sl_s, sl_d, sem)
        d.start(); d.wait()
        out_ref[0, 0] = jnp.int32(1)

    full_s = (src_shape[0] * 2,) + src_shape[1:]
    full_d = (dst_shape[0] * 2,) + dst_shape[1:]

    def call():
        return pl.pallas_call(
            k,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            scratch_shapes=[s_space(full_s, jnp.int32),
                            d_space(full_d, jnp.int32),
                            pltpu.SemaphoreType.DMA],
        )(jnp.zeros((8,), jnp.int32))
    return call


print("== 1: cross-shape equal-count DMA ==")
try_case("(32,128) VMEM -> (4096,) SMEM (off 0)",
         cross((32, 128), (4096,), pltpu.VMEM, pltpu.SMEM, 0, 0))
try_case("(4096,) SMEM -> (32,128) VMEM (off 0)",
         cross((4096,), (32, 128), pltpu.SMEM, pltpu.VMEM, 0, 0))
try_case("(32,128) SMEM2D -> (4096,) SMEM1D",
         cross((32, 128), (4096,), pltpu.SMEM, pltpu.SMEM, 0, 0))

print("== 2: 1D VMEM slice reality ==")
try_case("(2048,) VMEM slice off=1024 L=1024 -> same",
         cross((1024,), (1024,), pltpu.VMEM, pltpu.VMEM, 0, 1))
try_case("(256,) VMEM slice off=0 -> (256,) VMEM",
         cross((256,), (256,), pltpu.VMEM, pltpu.VMEM, 0, 1))

print("== 3: (rows, 8) SMEM slice reality ==")
try_case("(128,8) SMEM rows off=1",
         cross((128, 8), (128, 8), pltpu.SMEM, pltpu.SMEM, 0, 1))
try_case("(128,8) VMEM rows off=1",
         cross((128, 8), (128, 8), pltpu.VMEM, pltpu.VMEM, 0, 1))

# ---------------------------------------------------------- 4: 2D SMEM cost
print("== 4: scalar loop with 1D vs 2D SMEM addressing ==")
R = 1 << 21


def make_walk(two_d):
    def k(x_ref, out_ref, buf_ref):
        def rep(i, st):
            p, acc = st
            if two_d:
                w = buf_ref[p >> 9, (p >> 2) & 127]
            else:
                w = buf_ref[p >> 2]
            p2 = (p + ((w >> (p & 3)) & 7) + 1) & 16383
            return p2, acc + w

        p, acc = jax.lax.fori_loop(0, R, rep, (jnp.int32(0), jnp.int32(0)))
        out_ref[0, 0] = acc + p

    shape = (32, 128) if two_d else (4096,)

    @jax.jit
    def call(x):
        return pl.pallas_call(
            k,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            scratch_shapes=[pltpu.SMEM(shape, jnp.int32)],
        )(x)
    return call


def sync(x):
    np.asarray(jax.device_get(x.reshape(-1)[:1]))


x = jnp.asarray(np.random.default_rng(0).integers(
    1, 7, size=(8,), dtype=np.int32))
for name, twod in (("1D buf[p>>2]", False), ("2D buf[p>>9,(p>>2)&127]", True)):
    try:
        f = make_walk(twod)
        r = f(x); sync(r)
        t0 = time.time()
        NIT = 10
        for _ in range(NIT):
            r = f(x)
        sync(r)
        dt = (time.time() - t0) / NIT / R
        print("  %s: %.2f ns/iter" % (name, dt * 1e9))
    except Exception as e:
        print("  %s FAILED: %s" % (name, str(e)[:200]))
