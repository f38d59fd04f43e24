"""E14: can the VPU materialize decode segments faster than the scalar core?

Probe A — dynamic-roll correctness: extract 128 consecutive words starting
at an arbitrary (runtime) word offset from a (rows,128) VMEM buffer via
two dynamically-indexed row loads + pltpu.roll(dynamic shift) + lane select.

Probe B — segment materialization A/B: parse a real corpus block on the
host into a segment list (dst, src, len, kind), then materialize the output
on-device two ways:
  B1: scalar-core SMEM word loop (the production emit path shape)
  B2: VPU vector copies in VMEM (roll + select + masked RMW store)
Times ONLY materialization (parse precomputed), so the delta is the copy
engine itself.

Run on CPU (interpret): python experiments/e14_vector_copy.py interpret
Run on TPU:             python experiments/e14_vector_copy.py
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


def sync(x):
    np.asarray(jax.device_get(x.reshape(-1)[:1]))


# ---------------------------------------------------------------------------
# Probe A: dynamic roll extract
# ---------------------------------------------------------------------------

def _extract_kernel(off_ref, buf_ref, out_ref):
    """out[0,:] = buf.flat[woff : woff+128] (word offset woff, runtime)."""
    woff = off_ref[0]
    r = woff // LANES
    k = woff % LANES
    rows = buf_ref[pl.ds(r, 2), :]                     # (2,128)
    rolled = pltpu.roll(rows, (LANES - k) % LANES, 1)  # rolled[j]=row[(j+k)%128]
    lane = jax.lax.broadcasted_iota(jnp.int32, (2, LANES), 1)
    pick_hi = lane >= (LANES - k)
    out_ref[0, :] = jnp.where(pick_hi[0], rolled[1], rolled[0])


def probe_a():
    ROWS = 16
    buf = np.arange(ROWS * LANES, dtype=np.int32).reshape(ROWS, LANES)
    f = pl.pallas_call(
        _extract_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY if False else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, LANES), jnp.int32),
        interpret=INTERPRET,
    )
    ok = True
    for woff in (0, 1, 127, 128, 200, 1000, (ROWS - 2) * LANES + 127):
        out = np.asarray(f(np.asarray([woff], np.int32), buf))[0]
        want = buf.reshape(-1)[woff:woff + LANES]
        if not np.array_equal(out, want):
            ok = False
            print("  probe A FAIL at woff=%d: got %s want %s" % (woff, out[:5], want[:5]))
    print("probe A dynamic-roll extract:", "OK" if ok else "FAIL")
    return ok


# ---------------------------------------------------------------------------
# Probe B: segment materialization A/B
# ---------------------------------------------------------------------------
# Segment list layout (int32): [nseg, 4] rows of (kind, dst, src, len_bytes)
# kind 0 = literal (src is byte offset into comp), 1 = copy (src = dst - off,
# off >= 4 guaranteed by construction here; near-copies counted separately).

def parse_segments(enc_body, out_len):
    """Host-side reference parse -> segment list (numpy)."""
    segs = []
    pos, w = 0, 0
    b = enc_body
    n = len(b)
    while pos < n:
        t0 = b[pos]
        t = t0 & 3
        lc = t0 >> 2
        if t == 0:
            if lc < 60:
                ln, hdr = lc + 1, 1
            else:
                ex = lc - 59
                ln = int.from_bytes(b[pos + 1:pos + 1 + ex], "little") + 1
                hdr = 1 + ex
            segs.append((0, w, pos + hdr, ln))
            pos += hdr + ln
            w += ln
        else:
            if t == 1:
                off = ((t0 & 0xE0) << 3) | b[pos + 1]
                ln = 4 + (lc & 7)
                hdr = 2
            elif t == 2:
                off = int.from_bytes(b[pos + 1:pos + 3], "little")
                ln = 1 + lc
                hdr = 3
            else:
                off = int.from_bytes(b[pos + 1:pos + 5], "little")
                ln = 1 + lc
                hdr = 5
            segs.append((1 if off >= 4 else 2, w, w - off, ln))
            pos += hdr
            w += ln
    assert w == out_len
    return np.asarray(segs, np.int32)


def _seg_scalar_kernel(meta_ref, segs_ref, comp_ref, out_ref, done_ref):
    """B1: materialize segments with the production-style scalar word loop.

    comp/out are SMEM word buffers; segments with kind==2 (near copy) take a
    byte loop.  Matches ops/decode_scalar.emit structure (simplified: no
    speculative over-write trick — plain word loop + byte tail).
    """
    nseg = meta_ref[0]

    def gbyte(ref, p):
        return (ref[p >> 2] >> ((p & 3) * 8)) & 255

    def pbyte(p, v):
        wi = p >> 2
        sh = (p & 3) * 8
        w = out_ref[wi]
        out_ref[wi] = (w & ~(255 << sh)) | ((v & 255) << sh)

    def gword(ref, p):
        wa = ref[p >> 2]
        wb = ref[(p >> 2) + 1]
        sh = (p & 3) * 8
        lo = (wa >> sh) & ((jnp.int32(1) << (32 - sh)) - 1)
        return jax.lax.select(sh == 0, wa, lo | (wb << (32 - sh)))

    def seg_step(i, carry):
        kind = segs_ref[4 * i]
        dst = segs_ref[4 * i + 1]
        src = segs_ref[4 * i + 2]
        ln = segs_ref[4 * i + 3]

        def word_copy(ref):
            def body(s):
                o, _ = s
                v = gword(ref, src + o)
                # unaligned dst store (read-merge-write both words)
                p = dst + o
                wi = p >> 2
                sh = (p & 3) * 8
                keep = (jnp.int32(1) << sh) - 1
                lo = out_ref[wi]
                out_ref[wi] = (lo & keep) | (v << sh)
                hi = out_ref[wi + 1]
                spill = (v >> (31 - sh) >> 1) & keep
                out_ref[wi + 1] = (hi & ~keep) | spill
                return o + 4, 0
            jax.lax.while_loop(lambda s: s[0] < ln, body, (jnp.int32(0), 0))

        @pl.when(kind == 0)
        def _():
            word_copy(comp_ref)

        @pl.when(kind == 1)
        def _():
            word_copy(out_ref)

        @pl.when(kind == 2)
        def _():
            def body(o, c):
                pbyte(dst + o, gbyte(out_ref, src + o))
                return c
            jax.lax.fori_loop(0, ln, body, 0)

        return carry

    jax.lax.fori_loop(0, nseg, seg_step, 0)
    done_ref[0] = 1


def _seg_vector_kernel(meta_ref, segs_ref, compv_ref, out_ref, done_ref):
    """B2: VPU materialization.  out is a (ROWS,128) int32 VMEM buffer;
    compv a (CROWS,128) VMEM copy of the compressed bytes.

    Each segment is written row-chunk by row-chunk: per destination row we
    build the 128 source words (two dynamically-indexed rows + dynamic roll
    + lane select + byte funnel) and do a masked RMW store.
    """
    nseg = meta_ref[0]
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    def read128(ref, woff):
        """(1,128) words = ref.flat[woff : woff+128] (unaligned, dynamic)."""
        r = woff // LANES
        k = woff % LANES
        rows = ref[pl.ds(r, 2), :]
        rolled = pltpu.roll(rows, (LANES - k) % LANES, 1)
        pick_hi = lane1[0] >= (LANES - k)
        return jnp.where(pick_hi, rolled[1], rolled[0])[None, :]

    def read_bytes128(ref, boff):
        """(1,128) words holding bytes ref.bytes[boff : boff+512]."""
        w0 = read128(ref, boff >> 2)
        sh = (boff & 3) * 8

        def funnel():
            w1 = read128(ref, (boff >> 2) + 1)
            lo = jax.lax.shift_right_logical(w0, sh)
            return lo | (w1 << (32 - sh))
        return jax.lax.cond(sh == 0, lambda: w0, funnel)

    def write_bytes_row(vals, dst, nbytes):
        """Store vals (1,128 words = 512B) at byte offset dst, first nbytes
        bytes only, masked RMW.  dst may be unaligned."""
        # split into word-aligned store with byte shift
        sh = (dst & 3) * 8
        woff = dst >> 2
        r = woff // LANES
        k = woff % LANES
        # shift vals right... we store words w[i] covering bytes
        # [dst - (dst&3) + 4i, +4): build the byte-shifted word stream
        # sv[i] = (vals[i] << sh) | (vals[i-1] >> (32-sh)), 129 words for
        # nbytes+ (dst&3) bytes.  Handle with roll by 1 for the neighbor.
        prev = pltpu.roll(vals, 1, 1)  # prev[j] = vals[j-1]
        prev = jnp.where(lane1 == 0, 0, prev)
        sv = jax.lax.cond(
            sh == 0,
            lambda: vals,
            lambda: (vals << sh) | jax.lax.shift_right_logical(prev, 32 - sh),
        )
        total = nbytes + (dst & 3)  # bytes to cover starting at word boundary
        # byte-granular masks per word: word i covers bytes 4i..4i+3 rel base
        bytestart = lane1 * 4  # (1,128)
        # leading partial: bytes < (dst&3) keep old; trailing: >= total keep old
        # full words where bytestart >= dstmod && bytestart+4 <= total
        # build per-byte keep mask as 4 bool lanes folded into a word mask
        dstmod = dst & 3

        def byte_mask():
            # mask word: for byte j of word i (global byte g=4i+j):
            # new if dstmod <= g < total
            m = jnp.int32(0)
            parts = []
            for j in range(4):
                g = bytestart + j
                newb = (g >= dstmod) & (g < total)
                mk = int(np.array(255 << (8 * j), np.uint32).view(np.int32))
                parts.append(jnp.where(newb, jnp.int32(mk), jnp.int32(0)))
            m = parts[0] | parts[1] | parts[2] | parts[3]
            return m

        m = byte_mask()
        # destination spans rows r and r+1 after lane offset k: roll sv/m
        # into lane position k then select
        svr = pltpu.roll(sv, k, 1)
        mr = pltpu.roll(m, k, 1)
        in_lo = lane1 >= k  # lanes k.. belong to row r; wrapped lanes < k to r+1
        dstrows = out_ref[pl.ds(r, 2), :]
        m_lo = jnp.where(in_lo, mr, 0)
        m_hi = jnp.where(in_lo, 0, mr)
        new_lo = (dstrows[0] & ~m_lo[0]) | (svr[0] & m_lo[0])
        new_hi = (dstrows[1] & ~m_hi[0]) | (svr[0] & m_hi[0])
        out_ref[pl.ds(r, 2), :] = jnp.stack([new_lo, new_hi])

    def copy_seg(src_ref, src0, dst0, ln):
        """Copy ln bytes from byte src0 (in src_ref) to dst0 (out), row loop."""
        def body(s):
            done, _ = s
            # total = take + (dst&3) must fit the 128-word register
            take = jnp.minimum(ln - done, 512 - ((dst0 + done) & 3))
            vals = read_bytes128(src_ref, src0 + done)
            write_bytes_row(vals, dst0 + done, take)
            return done + take, 0
        jax.lax.while_loop(lambda s: s[0] < ln, body, (jnp.int32(0), 0))

    def seg_step(i, carry):
        kind = segs_ref[4 * i]
        dst = segs_ref[4 * i + 1]
        src = segs_ref[4 * i + 2]
        ln = segs_ref[4 * i + 3]

        @pl.when(kind == 0)
        def _():
            copy_seg(compv_ref, src, dst, ln)

        @pl.when(kind == 1)
        def _():
            off = dst - src
            # direct row copy valid when reads lag writes by >= the step
            # size; for off < 512 double the pattern: each pass copies
            # min(off*2^k, remaining) bytes from already-final data.
            # Bytes [src, src+done+off) are final and periodic with period
            # off, so reading at src+phase (phase = done mod off) yields
            # the continuation pattern with up to done+off-phase final
            # bytes — the read window doubles every pass.
            def dbl(s):
                done, _ = s
                phase = jax.lax.rem(done, off)
                take = jnp.minimum(ln - done, done + off - phase)
                take = jnp.minimum(take, 512 - ((dst + done) & 3))
                vals = read_bytes128(out_ref, src + phase)
                write_bytes_row(vals, dst + done, take)
                return done + take, 0
            jax.lax.while_loop(lambda s: s[0] < ln, dbl, (jnp.int32(0), 0))

        @pl.when(kind == 2)
        def _():
            # near copy (off in 1..3): build pattern word then roll out.
            off = dst - src
            srcw = read_bytes128(out_ref, src)  # first 4 source bytes suffice
            w0 = srcw[0, 0]
            b0 = w0 & 255
            b1 = (w0 >> 8) & 255
            b2 = (w0 >> 16) & 255
            pat = jax.lax.select(
                off == 1,
                b0 * jnp.int32(0x01010101),
                jax.lax.select(
                    off == 2,
                    b0 | (b1 << 8) | (b0 << 16) | (b1 << 24),
                    b0 | (b1 << 8) | (b2 << 16) | (b0 << 24),
                ),
            )
            # period = off; for off==3 the word pattern repeats every 3
            # words (12 bytes): lanes need pattern rotated by (4*lane)%3.
            lanemod = (lane1 * 4) % jnp.maximum(off, 1)
            # byte rotate pat by lanemod bytes: pat3 variants
            def rot(pw, byts):
                sh = byts * 8
                return jax.lax.cond(
                    False, lambda: pw, lambda: jax.lax.shift_right_logical(pw, sh) | (pw << ((32 - sh) % 32)))
            # build per-lane pattern for off<=3 via select over lanemod
            p0 = pat
            p1 = jax.lax.shift_right_logical(pat, 8) | (pat << 24)
            p2 = jax.lax.shift_right_logical(pat, 16) | (pat << 16)
            lv = jnp.where(lanemod == 0, p0, jnp.where(lanemod == 1, p1, p2))

            def body(s):
                done, _ = s
                take = jnp.minimum(ln - done, 512 - ((dst + done) & 3))
                # NOTE: pattern phase not realigned across rows (probe-only)
                write_bytes_row(lv, dst + done, take)
                return done + take, 0
            # NOTE: correct only when 512 % off == 0 or single row; the
            # real integration recomputes lv per row.  For the probe,
            # synthetic near segments are <= 512 bytes.
            jax.lax.while_loop(lambda s: s[0] < ln, body, (jnp.int32(0), 0))

        return carry

    jax.lax.fori_loop(0, nseg, seg_step, 0)
    done_ref[0] = 1


def probe_b():
    import snappy_tpu as s
    from snappy_tpu.formats import varint

    data = open('/root/reference/tests/data/html', 'rb').read()[:65536]
    enc = s.encode(data)
    _, v = varint.decode_uint32(enc)
    segs = parse_segments(enc[v:], len(data))
    counts = np.bincount(segs[:, 0], minlength=3)
    lens = [segs[segs[:, 0] == k, 3] for k in range(3)]
    print("segments: lit=%d (avg %.1fB) far=%d (avg %.1fB) near=%d (avg %.1fB)"
          % (counts[0], lens[0].mean() if len(lens[0]) else 0,
             counts[1], lens[1].mean() if len(lens[1]) else 0,
             counts[2], lens[2].mean() if len(lens[2]) else 0))

    comp = np.frombuffer(enc[v:], np.uint8)
    NSEG = len(segs)
    OUT_WORDS = 16384 + 128

    # B1 scalar
    compw = np.zeros((4 * ((len(comp) + 3) // 4 + 128),), np.uint8)
    compw[:len(comp)] = comp
    compw = compw.view(np.int32)
    f1 = pl.pallas_call(
        _seg_scalar_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((OUT_WORDS,), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ),
        interpret=INTERPRET,
    )
    meta = np.asarray([NSEG], np.int32)
    t0 = time.time()
    outw, d = f1(meta, segs.reshape(-1), compw)
    sync(d)
    print("B1 compile+run: %.1fs" % (time.time() - t0))
    got = np.asarray(outw).view(np.uint8)[:len(data)].tobytes()
    ok1 = got == data
    NIT = 3 if INTERPRET else 20
    t0 = time.time()
    for _ in range(NIT):
        outw, d = f1(meta, segs.reshape(-1), compw)
    sync(d)
    dt1 = (time.time() - t0) / NIT
    print("B1 scalar: correct=%s %.3f ms -> %.1f MB/s" % (ok1, dt1 * 1e3, len(data) / dt1 / 1e6))

    # B2 vector
    CROWS = (len(comp) + 512 * LANES) // (4 * LANES) + 2
    compv = np.zeros((CROWS * LANES * 4,), np.uint8)
    compv[:len(comp)] = comp
    compv = compv.view(np.int32).reshape(CROWS, LANES)
    OROWS = 16384 // LANES + 4
    f2 = pl.pallas_call(
        _seg_vector_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((OROWS, LANES), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ),
        interpret=INTERPRET,
    )
    t0 = time.time()
    outv, d = f2(meta, segs.reshape(-1), compv)
    sync(d)
    print("B2 compile+run: %.1fs" % (time.time() - t0))
    got2 = np.asarray(outv).reshape(-1).view(np.uint8)[:len(data)].tobytes()
    ok2 = got2 == data
    if not ok2:
        g = np.frombuffer(got2, np.uint8)
        w = np.frombuffer(data, np.uint8)
        bad = np.nonzero(g != w)[0]
        print("  first mismatch at byte %d (of %d), %d bad" % (bad[0], len(w), len(bad)))
    t0 = time.time()
    for _ in range(NIT):
        outv, d = f2(meta, segs.reshape(-1), compv)
    sync(d)
    dt2 = (time.time() - t0) / NIT
    print("B2 vector: correct=%s %.3f ms -> %.1f MB/s" % (ok2, dt2 * 1e3, len(data) / dt2 / 1e6))


if __name__ == "__main__":
    if probe_a():
        probe_b()
