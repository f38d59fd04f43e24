"""E26c: dynamic byte-rotate of a (L,128) int32 VMEM tile on the VPU.

Needed for the long-segment DMA emitter: a segment DMA'd at 512-byte row
granularity lands with a wrong intra-row byte phase; the VPU must rotate
the tile by a DYNAMIC byte amount (0..511) to fix it.

Composition tested (flat word-rotate by w = shift>>2, then byte funnel
by r = shift&3):
  a  = roll(T, -(w//128), axis=0)              # row part
  b  = roll(T, -(w//128)-1, axis=0)
  ra = roll(a, -(w%128), axis=1); rb = roll(b, -(w%128), axis=1)
  R  = where(lane < 128-(w%128), ra, rb)       # flat rotate by w words
  Rn = flat rotate of R by one more word       # (same trick, shift=1)
  out= (R >>u 8r) | (Rn << (32-8r))            # byte funnel

Questions: does pltpu.roll accept a traced (dynamic) shift?  If not,
does a dynamic_gather lane permutation work?  Cost per rotate of a
(128,128) tile (64 KiB)?

python experiments/e26c_vpu_rotate.py
"""
import sys, time
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compilation")

L = 128  # rows; tile = L x 128 int32 = 64 KiB


def flat_rotate_words(T, w):
    """R.flat[i] = T.flat[(i + w) % (L*128)], w dynamic in [0, L*128)."""
    rows = w // 128
    lanes = w % 128
    a = pltpu.roll(T, -rows, axis=0)
    b = pltpu.roll(T, -(rows + 1), axis=0)
    ra = pltpu.roll(a, -lanes, axis=1)
    rb = pltpu.roll(b, -lanes, axis=1)
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, T.shape, 1)
    return jnp.where(lane_idx < 128 - lanes, ra, rb)


def rotate_bytes(T, byte_shift):
    w = byte_shift >> 2
    r = byte_shift & 3
    R = flat_rotate_words(T, w)
    Rn = flat_rotate_words(T, w + 1)
    Tu = pltpu.bitcast(R, jnp.uint32)
    Nu = pltpu.bitcast(Rn, jnp.uint32)
    sh = (8 * r).astype(jnp.uint32)
    out = jax.lax.select(
        r == 0, Tu,
        (Tu >> sh) | (Nu << (jnp.uint32(32) - sh)))
    return pltpu.bitcast(out, jnp.int32)


def make_rot(R_REPS, use_byte):
    def k(x_ref, s_ref, out_ref):
        def rep(i, acc):
            sh = s_ref[0] + i  # vary the shift so nothing hoists
            if use_byte:
                acc = acc + rotate_bytes(x_ref[:], sh & 511)
            else:
                acc = acc + flat_rotate_words(x_ref[:], sh & 127)
            return acc

        out_ref[:] = jax.lax.fori_loop(
            0, R_REPS, rep, jnp.zeros((L, 128), jnp.int32))

    @jax.jit
    def call(x, s):
        return pl.pallas_call(
            k,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((L, 128), jnp.int32),
        )(x, s)
    return call


def sync(x):
    np.asarray(jax.device_get(x.reshape(-1)[:1]))


rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(0, 2**31, size=(L, 128), dtype=np.int32))
s = jnp.asarray([5], dtype=np.int32)

# correctness first (small shift, compare vs numpy)
try:
    r1 = make_rot(1, True)(x, s)
    got = np.asarray(r1).reshape(-1).view(np.uint8)
    flat = np.asarray(x).reshape(-1).view(np.uint8)
    want = np.roll(flat, -5)
    ok = np.array_equal(got, want)
    print("byte-rotate correctness (shift=5): %s" % ok)
    if not ok:
        print("  got[:12] ", got[:12])
        print("  want[:12]", want[:12])
except Exception as e:
    print("byte-rotate FAILED to build/run: %s" % str(e)[:400])
    sys.exit(1)

REPS = 256
for name, use_byte in (("word-rotate", False), ("byte-rotate", True)):
    f = make_rot(REPS, use_byte)
    r = f(x, s); sync(r)
    t0 = time.time()
    NIT = 20
    for _ in range(NIT):
        r = f(x, s)
    sync(r)
    dt = (time.time() - t0) / NIT / REPS
    print("%s of 64 KiB tile: %7.1f ns  -> %6.2f GB/s"
          % (name, dt * 1e9, L * 128 * 4 / dt / 1e9))
