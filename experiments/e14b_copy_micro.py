"""E14b: isolate copy-engine costs on the real chip.

M1: one long copy (64 KiB literal, aligned-ish) — streaming ceiling.
    scalar SMEM word loop vs VPU row loop (load2/roll/select/funnel/store).
M2: 4096 fixed 16-byte segments, no branching — per-segment fixed cost.
M3: per-segment cost with the branchless funnel but dynamic src/dst from
    SMEM (the integration shape).

python experiments/e14b_copy_micro.py [interpret]
"""
import sys, time
sys.path.insert(0, '/root/repo')
INTERPRET = "interpret" in sys.argv[1:]
if INTERPRET:
    import os
    os.environ["JAX_PLATFORMS"] = "cpu"
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compilation")

LANES = 128
ROWS = 16384 // LANES  # 64 KiB of int32 words


def sync(x):
    np.asarray(jax.device_get(x.reshape(-1)[:1]))


def bench(f, args, label, nbytes, nit=50):
    t0 = time.time()
    out = f(*args)
    sync(out[-1] if isinstance(out, (tuple, list)) else out)
    t0 = time.time()
    for _ in range(nit):
        out = f(*args)
    sync(out[-1] if isinstance(out, (tuple, list)) else out)
    dt = (time.time() - t0) / nit
    print("%-28s %8.3f ms  %8.1f MB/s" % (label, dt * 1e3, nbytes / dt / 1e6))
    return dt


# --- M1 scalar: copy 64 KiB words SMEM->SMEM, 2 words per iter -------------

def _m1_scalar(rep_ref, src_ref, out_ref, done_ref):
    def rep(r, c):
        def body(s):
            i, _ = s
            out_ref[i] = src_ref[i]
            out_ref[i + 1] = src_ref[i + 1]
            return i + 2, 0
        jax.lax.while_loop(lambda s: s[0] < 16384, body, (r * 0, 0))
        return c
    jax.lax.fori_loop(0, rep_ref[0], rep, 0)
    done_ref[0] = 1


# --- M1 vector: row loop with dynamic roll (unaligned source) --------------

def _m1_vector(off_ref, src_ref, out_ref, done_ref):
    """Copy ROWS rows from word offset woff (dynamic) in src to out."""
    woff = off_ref[0]
    k = woff % LANES
    r0 = woff // LANES
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    pick_hi = lane >= (LANES - k)
    sh = (off_ref[1] & 3) * 8  # byte funnel amount (dynamic)

    def body(s):
        i, _ = s
        rows = src_ref[pl.ds(r0 + (i % ROWS), 2), :]
        rolled = pltpu.roll(rows, (LANES - k) % LANES, 1)
        w0 = jnp.where(pick_hi, rolled[1:2], rolled[0:1])
        # byte funnel: neighbor word = shift left by one lane
        nxt = pltpu.roll(w0, LANES - 1, 1)  # nxt[j] = w0[j+1]
        lo = jax.lax.shift_right_logical(w0, sh)
        fun = lo | (nxt << (32 - sh))
        v = jnp.where(jnp.full((1, 1), sh == 0), w0, fun)
        out_ref[pl.ds(i % ROWS, 1), :] = v
        return i + 1, 0
    jax.lax.while_loop(lambda s: s[0] < ROWS * off_ref[2], body, (jnp.int32(0), 0))
    done_ref[0] = 1


# --- M2 scalar: 4096 x 16-byte segment copies (dynamic src/dst) ------------

def _m2_scalar(segs_ref, src_ref, out_ref, done_ref):
    def body(j, c):
        i = j % 4096
        sw = segs_ref[2 * i]      # src word index
        dw = segs_ref[2 * i + 1]  # dst word index
        out_ref[dw] = src_ref[sw]
        out_ref[dw + 1] = src_ref[sw + 1]
        out_ref[dw + 2] = src_ref[sw + 2]
        out_ref[dw + 3] = src_ref[sw + 3]
        return c
    jax.lax.fori_loop(0, 4096 * segs_ref[8192], body, 0)
    done_ref[0] = 1


# --- M2 vector: 4096 x 16-byte segments via roll/select/RMW-store ----------

def _m2_vector(segs_ref, src_ref, out_ref, done_ref):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    def body(j, c):
        i = j % 4096
        sw = segs_ref[2 * i]
        dw = segs_ref[2 * i + 1]
        # read 128 words at sw
        k = sw % LANES
        rows = src_ref[pl.ds(sw // LANES, 2), :]
        rolled = pltpu.roll(rows, (LANES - k) % LANES, 1)
        v = jnp.where(lane >= (LANES - k), rolled[1:2], rolled[0:1])
        # write 4 words at dw: roll into place + masked RMW of 2 rows
        dk = dw % LANES
        dr = dw // LANES
        vr = pltpu.roll(v, dk, 1)
        m = (lane >= dk) & (lane < dk + 4)          # no row wrap when dk<125
        mwrap = lane < dk + 4 - LANES               # wrapped lanes
        dst = out_ref[pl.ds(dr, 2), :]
        new0 = jnp.where(m[0], vr[0], dst[0])
        new1 = jnp.where(mwrap[0], vr[0], dst[1])
        out_ref[pl.ds(dr, 2), :] = jnp.stack([new0, new1])
        return c
    jax.lax.fori_loop(0, 4096 * segs_ref[8192], body, 0)
    done_ref[0] = 1



def run():
    src_w = np.arange(16384, dtype=np.int32)
    f1s = pl.pallas_call(
        _m1_scalar,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((16386,), jnp.int32),
                   jax.ShapeDtypeStruct((1,), jnp.int32)),
        interpret=INTERPRET,
    )
    r1 = np.asarray([1], np.int32)
    r9 = np.asarray([65], np.int32)
    out = f1s(r1, src_w)
    assert np.array_equal(np.asarray(out[0])[:16384], src_w)
    d1 = bench(f1s, (r1, src_w), "M1 scalar x1", 65536)
    d9 = bench(f1s, (r9, src_w), "M1 scalar x65", 65536 * 65)
    dc = (d9 - d1) / 64
    print("    -> copy-only %.3f ms, %.1f MB/s, %.2f ns/word"
          % (dc * 1e3, 65536 / dc / 1e6, dc / 16384 * 1e9))

    src_v = src_w.reshape(ROWS, LANES)
    src_vp = np.vstack([src_v, np.zeros((2, LANES), np.int32)])
    f1v = pl.pallas_call(
        _m1_vector,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((ROWS, LANES), jnp.int32),
                   jax.ShapeDtypeStruct((1,), jnp.int32)),
        interpret=INTERPRET,
    )
    off = np.asarray([5, 0, 1], np.int32)  # word offset 5, no byte shift, x1
    out = f1v(off, src_vp)
    got = np.asarray(out[0]).reshape(-1)
    want = np.concatenate([src_w[5:], np.zeros(5, np.int32)])
    assert np.array_equal(got[:16384 - 128], want[:16384 - 128]), "M1v mismatch"
    d1 = bench(f1v, (off, src_vp), "M1 vector x1", 65536)
    off9 = np.asarray([5, 0, 65], np.int32)
    d9 = bench(f1v, (off9, src_vp), "M1 vector x65", 65536 * 65)
    dc = (d9 - d1) / 64
    print("    -> copy-only %.3f ms, %.1f MB/s, %.1f ns/row(512B)"
          % (dc * 1e3, 65536 / dc / 1e6, dc / ROWS * 1e9))
    offf = np.asarray([5, 1, 1], np.int32)
    d1 = bench(f1v, (offf, src_vp), "M1 vector+funnel x1", 65536)
    offf9 = np.asarray([5, 1, 65], np.int32)
    d9 = bench(f1v, (offf9, src_vp), "M1 vector+funnel x65", 65536 * 65)
    dc = (d9 - d1) / 64
    print("    -> copy-only %.3f ms, %.1f MB/s" % (dc * 1e3, 65536 / dc / 1e6))

    # M2: segments
    rng = np.random.default_rng(0)
    segs = np.zeros((4096, 2), np.int32)
    segs[:, 0] = rng.integers(0, 16000, 4096)          # src word
    segs[:, 1] = (np.arange(4096) * 4) % 16000         # dst word (sequentialish)

    def flat(s, reps):
        return np.concatenate([s.reshape(-1), np.asarray([reps], np.int32)])

    f2s = pl.pallas_call(
        _m2_scalar,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((16388,), jnp.int32),
                   jax.ShapeDtypeStruct((1,), jnp.int32)),
        interpret=INTERPRET,
    )
    d1 = bench(f2s, (flat(segs, 1), src_w), "M2 scalar x1", 65536)
    d9 = bench(f2s, (flat(segs, 65), src_w), "M2 scalar x65", 65536 * 65)
    dc = (d9 - d1) / 64
    print("    -> %.1f ns/segment copy-only" % (dc / 4096 * 1e9))

    f2v = pl.pallas_call(
        _m2_vector,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((ROWS + 2, LANES), jnp.int32),
                   jax.ShapeDtypeStruct((1,), jnp.int32)),
        interpret=INTERPRET,
    )
    segs_c = np.asarray([[0, 4], [130, 200], [1000, 300]] + [[0, 8]] * 4093, np.int32)
    out = f2v(flat(segs_c, 1), src_vp)
    ow = np.asarray(out[0]).reshape(-1)
    assert np.array_equal(ow[4:8], src_w[0:4]), ow[:12]
    assert np.array_equal(ow[200:204], src_w[130:134])
    assert np.array_equal(ow[300:304], src_w[1000:1004])
    d1 = bench(f2v, (flat(segs, 1), src_vp), "M2 vector x1", 65536)
    d9 = bench(f2v, (flat(segs, 65), src_vp), "M2 vector x65", 65536 * 65)
    dc = (d9 - d1) / 64
    print("    -> %.1f ns/segment copy-only" % (dc / 4096 * 1e9))


if __name__ == "__main__":
    run()
