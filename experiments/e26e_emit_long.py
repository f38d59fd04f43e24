"""E26e: validate + time snappy_tpu.ops.emit_long on-chip.

Contract-based checker (full-buffer equality is wrong by design: up to
4 KiB past each segment end is a clobber zone with unspecified bytes):
  * [dst, dst+len) == source bytes
  * bytes below dst (window prefix + whole buffer prefix) preserved
Cases use disjoint write windows and pristine low-region sources.

Timing: len in {2K, 8K, 32K, 57K} at an adversarial unaligned phase and
at the aligned (direct SMEM->SMEM) phase, vs the 1.25 ns/byte scalar
word loop.

python experiments/e26e_emit_long.py [interpret]
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

from snappy_tpu.ops import emit_long as EL

BUF = 40960          # unified 1D SMEM words (160 KiB) in this harness


def make_kernel(cases_n, reps):
    def k(cases_ref, data_ref, out_ref, buf_ref, vbuf_ref, hbuf_ref,
          sem_in, sems, sem_h):
        cp = pltpu.make_async_copy(data_ref, buf_ref.at[pl.ds(0, BUF)],
                                   sem_in)
        cp.start(); cp.wait()
        emit = EL.make_emit_long(buf_ref, vbuf_ref, hbuf_ref, sems, sem_h)

        def rep(r, acc):
            def case(i, acc2):
                emit(cases_ref[i, 0], cases_ref[i, 1], cases_ref[i, 2])
                return acc2
            return jax.lax.fori_loop(0, cases_n, case, acc)

        jax.lax.fori_loop(0, reps, rep, jnp.int32(0))
        cp_o = pltpu.make_async_copy(buf_ref.at[pl.ds(0, BUF)], out_ref,
                                     sem_in)
        cp_o.start(); cp_o.wait()

    el_scratch = EL.scratch_shapes()

    @jax.jit
    def call(cases, data):
        return pl.pallas_call(
            k,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((BUF,), jnp.int32),
            scratch_shapes=[pltpu.SMEM((BUF,), jnp.int32),
                            el_scratch[0], el_scratch[1],
                            pltpu.SemaphoreType.DMA,
                            el_scratch[2], el_scratch[3]],
            interpret=INTERPRET,
        )(cases, data)
    return call


def check(got, base, cases):
    """Contract check; returns list of violation strings."""
    bad = []
    windows = []
    for dst, ln, src in cases:
        d0 = (dst >> 12) << 12
        lw = ((dst - d0 + ln + 4095) >> 12) << 12
        windows.append((d0, d0 + lw))
        if got[dst:dst + ln] != base[src:src + ln]:
            g = got[dst:dst + ln]
            w = base[src:src + ln]
            i = next(j for j in range(ln) if g[j] != w[j])
            bad.append("case dst=%d ln=%d src=%d: payload diff at +%d "
                       "(got %d want %d)" % (dst, ln, src, i, g[i], w[i]))
    for (a, b), (dst, ln, src) in zip(windows, cases):
        if got[a:dst] != base[a:dst]:
            i = next(j for j in range(dst - a)
                     if got[a + j] != base[a + j])
            bad.append("case dst=%d: head byte below dst damaged at %d"
                       % (dst, a + i))
    lo = min(a for a, _ in windows)
    if got[:lo] != base[:lo]:
        bad.append("prefix below all windows damaged")
    return bad


def sync(x):
    np.asarray(jax.device_get(x.reshape(-1)[:1]))


rng = np.random.default_rng(7)
data = rng.integers(0, 256, size=4 * BUF, dtype=np.uint8)
data_words = jnp.asarray(data.view(np.int32))
base = data.tobytes()

print("== correctness: randomized disjoint emit_long cases ==")
CN = 8
cases = []
slot = 90000
for i in range(CN):
    ln = int(rng.integers(2048, 8000))
    src = int(rng.integers(4200, 60000 - ln))
    dst = slot + int(rng.integers(0, 64))
    if i == 3:                      # one aligned (direct-path) case
        dst = (slot + 4095) & ~4095
        src = ((src >> 12) << 12) + (dst & 4095)
    slot = dst + ln + 4096 + 64
    cases.append((dst, ln, src))
assert slot < 4 * BUF - 4096
cases_np = np.asarray(cases, np.int32)
f = make_kernel(CN, 1)
out = np.asarray(jax.device_get(f(jnp.asarray(cases_np), data_words)))
got = out.view(np.uint8).tobytes()
bad = check(got, base, cases)
if not bad:
    print("  CONTRACT-EXACT on %d random cases (incl. 1 direct-path)" % CN)
else:
    for b in bad[:8]:
        print("  VIOLATION:", b)
    sys.exit(1)

# one big rotate-path and one big direct-path case
for tag, dst, src in (("rotate", 90000 + 1233, 4096 + 777),
                      ("direct", 90112, 8192 + (90112 & 4095))):
    ln = 57344
    f1 = make_kernel(1, 1)
    out = np.asarray(jax.device_get(
        f1(jnp.asarray([[dst, ln, src]], np.int32), data_words)))
    bad = check(out.view(np.uint8).tobytes(), base, [(dst, ln, src)])
    print("  big %s case (ln=57344): %s"
          % (tag, "OK" if not bad else bad[0]))
    if bad:
        sys.exit(1)

if INTERPRET:
    sys.exit(0)

print("== timing per segment (scalar word loop ~1.25 ns/byte) ==")
for tag, dst, src in (("rotate", 90000 + 1233, 4096 + 777),
                      ("direct", 90112, 8192 + (90112 & 4095))):
    for ln in (2048, 8192, 32768, 57344):
        c1 = jnp.asarray(np.asarray([[dst, ln, src]], np.int32))
        REPS = max(16, (1 << 24) // ln)
        f = make_kernel(1, REPS)
        r = f(c1, data_words); sync(r)
        t0 = time.time()
        NIT = 5
        for _ in range(NIT):
            r = f(c1, data_words)
        sync(r)
        dt = (time.time() - t0) / NIT / REPS
        scal = ln * 1.25e-9
        print("  %s len=%6d: %8.1f ns  %6.2f GB/s  (scalar ~%.0f ns"
              " -> %4.1fx)" % (tag, ln, dt * 1e9, ln / dt / 1e9,
                               scal * 1e9, scal / dt))
