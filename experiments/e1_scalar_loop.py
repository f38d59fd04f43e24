"""E1: can the TPU scalar core run a sequential parse loop at useful speed?

Measures a Pallas kernel doing N fori_loop iterations of scalar SMEM reads
+ arithmetic + scalar SMEM writes (the shape of a sequential tag parse).
"""
import time, functools
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compilation")

def sync(x):
    np.asarray(jax.device_get(x.reshape(-1)[:1]))

N_WORDS = 16384  # 64KB of packed bytes as int32 words in SMEM

def kernel(words_ref, n_ref, out_ref):
    n = n_ref[0]
    def body(state):
        pos, t, acc = state
        w = words_ref[pos >> 2]
        byte = (w >> ((pos & 3) * 8)) & 255
        # fake tag decode: advance by 1 + (byte & 7), record
        step = 1 + (byte & 7)
        out_ref[t] = pos + acc
        return pos + step, t + 1, acc ^ byte
    def cond(state):
        pos, t, acc = state
        return (pos < n) & (t < out_ref.shape[0])
    pos, t, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0), jnp.int32(0)))
    out_ref[out_ref.shape[0]-1] = t

@jax.jit
def run(words, n):
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((20000,), jnp.int32),
    )(words, n)

words = jnp.asarray(np.random.randint(0, 2**31, N_WORDS, dtype=np.int32))
n = jnp.asarray([65536], dtype=jnp.int32)

t0 = time.time()
r = run(words, n)
sync(r)
print("compile+first run: %.1fs" % (time.time() - t0))
# avg tag advance = 1+3.5=4.5 bytes -> ~14500 iterations
iters = 65536 / 4.5
for trial in range(3):
    t0 = time.time()
    M = 20
    for _ in range(M):
        r = run(words, n)
    sync(r)
    dt = (time.time() - t0) / M
    print("per call: %.3f ms  (%.0f ns/iter, ~%.0f MB/s-equivalent-64KB-block)"
          % (dt*1e3, dt/iters*1e9, 65536/ (dt*(iters/ (65536/4.5))) / 1e6 if dt>0 else 0))
print("result tail:", np.asarray(r)[-1], "expected iters ~", iters)
