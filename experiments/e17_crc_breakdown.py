"""E17: where does the Pallas CRC path spend its time?

The measured plateau (~1.6-1.7 GB/s across three formulations) was blamed
on per-iteration loop overhead / narrow matmuls.  But masked_crc32c_chunks
has an XLA *prologue* — uint8 -> uint32 arithmetic byte packing — that
materializes several 16 MB intermediates in HBM.  The bytes are already LE
in memory: a bitcast is free.

  A: full masked_crc32c_chunks           (production, arithmetic packing)
  B: _lane_fold_pallas on packed words   (kernel alone)
  C: bitcast packing + kernel + epilogue (candidate production)
  D: kernel with _ROWS=16/32             (grid-step amortization)

python experiments/e17_crc_breakdown.py
"""
import sys, time
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compilation")
from snappy_tpu.ops import crc32c_pallas as cp
from snappy_tpu.ops import crc32c_jax as cj
from snappy_tpu.ops import crc32c_native as cn


def sync(x):
    np.asarray(jax.device_get(x.reshape(-1)[:1]))


N = 256           # chunks
PAD = 65536       # bytes per chunk
LANES = PAD // 4
rng = np.random.default_rng(7)
chunks_np = rng.integers(0, 256, (N, PAD), dtype=np.uint8)
lengths_np = np.full((N,), PAD, np.int32)
chunks = jax.device_put(jnp.asarray(chunks_np))
lengths = jax.device_put(jnp.asarray(lengths_np))
words_np = chunks_np.view("<u4").astype(np.uint32)
words = jax.device_put(jnp.asarray(words_np))

ref = np.asarray([cn.masked_crc32c(chunks_np[i].tobytes()) for i in range(4)])


def timeit(fn, samples=8):
    r = fn()
    sync(jax.tree_util.tree_leaves(r)[-1])
    t0 = time.perf_counter()
    for _ in range(samples):
        r = fn()
    sync(jax.tree_util.tree_leaves(r)[-1])
    return (time.perf_counter() - t0) / samples, r


total = N * PAD

# A: production path
dt, r = timeit(lambda: cp.masked_crc32c_chunks(chunks, lengths, PAD))
got = np.asarray(r)[:4]
print("A full pallas path : %6.2f ms  %5.2f GB/s  correct=%s"
      % (dt * 1e3, total / dt / 1e9, bool((got == ref).all())))

# B: kernel alone on pre-packed words
dt, r = timeit(lambda: cp._lane_fold_pallas(words, LANES, False))
print("B kernel alone     : %6.2f ms  %5.2f GB/s" % (dt * 1e3, total / dt / 1e9))


# C: bitcast packing end-to-end
@jax.jit
def path_bitcast(chunks, lengths):
    n = chunks.shape[0]
    w = jax.lax.bitcast_convert_type(
        chunks.reshape(n, LANES, 4), jnp.uint32)
    reg = cp._lane_fold_pallas(w, LANES, False)
    reg = reg ^ jnp.uint32(cj._init_term(PAD))
    _, inv = cj._shift_matrices()
    pad = (jnp.int32(PAD) - lengths).astype(jnp.uint32)
    for j in range(17):
        cols = jnp.asarray(inv[j])
        bit = (pad >> jnp.uint32(j)) & jnp.uint32(1)
        reg = jnp.where(bit == 1, cj._mat_apply_jnp(cols, reg), reg)
    return cj.mask_crc(reg ^ jnp.uint32(0xFFFFFFFF))


dt, r = timeit(lambda: path_bitcast(chunks, lengths))
got = np.asarray(r)[:4]
print("C bitcast path     : %6.2f ms  %5.2f GB/s  correct=%s"
      % (dt * 1e3, total / dt / 1e9, bool((got == ref).all())))

# D: _ROWS sweep on the kernel alone
for rows in (16, 32, 64):
    old = cp._ROWS
    try:
        cp._ROWS = rows
        cp._lane_fold_pallas.clear_cache()
        dt, r = timeit(lambda: cp._lane_fold_pallas(words, LANES, False))
        print("D kernel _ROWS=%-3d : %6.2f ms  %5.2f GB/s"
              % (rows, dt * 1e3, total / dt / 1e9))
    except Exception as e:
        print("D kernel _ROWS=%-3d : FAILED %s" % (rows, type(e).__name__))
    finally:
        cp._ROWS = old
        cp._lane_fold_pallas.clear_cache()
