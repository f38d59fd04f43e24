"""E2b: find where the MXU one-hot gather loses its FLOPs.
Variants: (a) pure int8 matmul (no onehot build), (b) pure bf16 matmul,
(c) full gather with bf16 onehot, (d) bigger K tile per step."""
import time, functools
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compilation")
def sync(x): np.asarray(jax.device_get(x.reshape(-1)[:1]))

M, K = 65536, 65536
M_T = 1024
K_ROWS = K // 128

def bench(name, fn, *args, nit=20, mac=None):
    r = fn(*args); sync(r)
    t0 = time.time()
    for _ in range(nit): r = fn(*args)
    sync(r)
    dt = (time.time()-t0)/nit
    extra = "  %.1f TMAC/s" % (mac/dt/1e12) if mac else ""
    print("%-28s %.3f ms%s" % (name, dt*1e3, extra))
    return r

# (a) pure int8 matmul, same shapes as the gather inner loop
def k_int8(a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(a_ref[:], b_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

@jax.jit
def mm_int8(a, b):
    return pl.pallas_call(k_int8, grid=(M // M_T,),
        in_specs=[pl.BlockSpec((M_T, K_ROWS), lambda i: (i, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((K_ROWS, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((M_T, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, 128), jnp.int32))(a, b)

rng = np.random.default_rng(0)
a8 = jnp.asarray(rng.integers(-128, 127, (M, K_ROWS), dtype=np.int8))
b8 = jnp.asarray(rng.integers(-128, 127, (K_ROWS, 128), dtype=np.int8))
bench("pure int8 (M,512)@(512,128)", mm_int8, a8, b8, mac=M*K_ROWS*128)

# (b) pure bf16 matmul
def k_bf16(a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(a_ref[:], b_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

@jax.jit
def mm_bf16(a, b):
    return pl.pallas_call(k_bf16, grid=(M // M_T,),
        in_specs=[pl.BlockSpec((M_T, K_ROWS), lambda i: (i, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((K_ROWS, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((M_T, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, 128), jnp.float32))(a, b)

abf = jnp.asarray(rng.standard_normal((M, K_ROWS)).astype(jnp.bfloat16))
bbf = jnp.asarray(rng.standard_normal((K_ROWS, 128)).astype(jnp.bfloat16))
bench("pure bf16 (M,512)@(512,128)", mm_bf16, abf, bbf, mac=M*K_ROWS*128)

# (c) full gather with bf16 onehot
def k_gather_bf16(idx_ref, table_ref, out_ref):
    idx = idx_ref[:]
    r = (idx >> 7).reshape(M_T, 1)
    c = (idx & 127).reshape(M_T, 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (M_T, K_ROWS), 1)
    onehot = jnp.where(rows == r, jnp.bfloat16(1), jnp.bfloat16(0))
    R = jax.lax.dot_general(onehot, table_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (M_T, 128), 1)
    out_ref[:] = jnp.sum(jnp.where(cols == c, R, 0.), axis=1, keepdims=True)

@jax.jit
def gather_bf16(idx, table):
    return pl.pallas_call(k_gather_bf16, grid=(M // M_T,),
        in_specs=[pl.BlockSpec((M_T,), lambda i: (i,), memory_space=pltpu.VMEM),
                  pl.BlockSpec((K_ROWS, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((M_T, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, 1), jnp.float32))(idx, table)

table = rng.integers(0, 256, K, dtype=np.uint8)
idx = rng.integers(0, K, M, dtype=np.int32)
tb = jnp.asarray(table.astype(jnp.bfloat16).reshape(K_ROWS, 128))
r = bench("gather bf16 onehot", gather_bf16, jnp.asarray(idx), tb, mac=M*K_ROWS*128)
got = np.asarray(r).reshape(-1).astype(np.int32)
print("   correct:", np.array_equal(got, table[idx].astype(np.int32)))
