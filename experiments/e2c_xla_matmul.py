"""E2c: XLA matmul ceiling on this chip + full one-hot gather in plain XLA."""
import time, functools
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compilation")
def sync(x): np.asarray(jax.device_get(x.reshape(-1)[:1]))

def bench(name, fn, *args, nit=20, mac=None):
    r = fn(*args); sync(r)
    t0 = time.time()
    for _ in range(nit): r = fn(*args)
    sync(r)
    dt = (time.time()-t0)/nit
    extra = "  %.1f TMAC/s" % (mac/dt/1e12) if mac else ""
    print("%-36s %.3f ms%s" % (name, dt*1e3, extra))
    return r, dt

rng = np.random.default_rng(0)

# square bf16 ceiling
A = jnp.asarray(rng.standard_normal((4096, 4096)).astype(jnp.bfloat16))
B = jnp.asarray(rng.standard_normal((4096, 4096)).astype(jnp.bfloat16))
mm = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32))
bench("XLA bf16 4096^3", mm, A, B, mac=4096**3)

# int8 square
A8 = jnp.asarray(rng.integers(-128,127,(4096,4096),dtype=np.int8))
B8 = jnp.asarray(rng.integers(-128,127,(4096,4096),dtype=np.int8))
mm8 = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.int32))
bench("XLA int8 4096^3", mm8, A8, B8, mac=4096**3)

# gather-shaped bf16
M, K = 65536, 65536
K_ROWS = K // 128
Ag = jnp.asarray(rng.standard_normal((M, K_ROWS)).astype(jnp.bfloat16))
Bg = jnp.asarray(rng.standard_normal((K_ROWS, 128)).astype(jnp.bfloat16))
bench("XLA bf16 (64K,512)@(512,128)", mm, Ag, Bg, mac=M*K_ROWS*128)

# full one-hot gather in plain XLA
table = rng.integers(0, 256, K, dtype=np.uint8)
idx = rng.integers(0, K, M, dtype=np.int32)

@jax.jit
def onehot_gather(idx, table_bf):
    r = idx >> 7
    c = idx & 127
    rows = jax.lax.broadcasted_iota(jnp.int32, (M, K_ROWS), 1)
    onehot = (rows == r[:, None]).astype(jnp.bfloat16)
    R = jnp.dot(onehot, table_bf, preferred_element_type=jnp.float32)  # [M,128]
    cols = jax.lax.broadcasted_iota(jnp.int32, (M, 128), 1)
    return jnp.sum(jnp.where(cols == c[:, None], R, 0.), axis=1).astype(jnp.int32)

tb = jnp.asarray(table.astype(jnp.bfloat16).reshape(K_ROWS, 128))
r, dt = bench("XLA one-hot gather 64K<-64K", onehot_gather, jnp.asarray(idx), tb, mac=M*K_ROWS*128)
print("   correct:", np.array_equal(np.asarray(r), table[idx].astype(np.int32)),
      "  -> %.2f GB/s gather" % (M/dt/1e9))

# one-hot gather with int8
@jax.jit
def onehot_gather_i8(idx, table_i8):
    r = idx >> 7
    c = idx & 127
    rows = jax.lax.broadcasted_iota(jnp.int32, (M, K_ROWS), 1)
    onehot = (rows == r[:, None]).astype(jnp.int8)
    R = jnp.dot(onehot, table_i8, preferred_element_type=jnp.int32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (M, 128), 1)
    return jnp.sum(jnp.where(cols == c[:, None], R, 0), axis=1) + 128

ti8 = jnp.asarray((table.astype(np.int16)-128).astype(np.int8).reshape(K_ROWS, 128))
r, dt = bench("XLA one-hot gather int8", onehot_gather_i8, jnp.asarray(idx), ti8, mac=M*K_ROWS*128)
print("   correct:", np.array_equal(np.asarray(r), table[idx].astype(np.int32)),
      "  -> %.2f GB/s gather" % (M/dt/1e9))
