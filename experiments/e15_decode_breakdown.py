"""E15: where do the decoder's cycles go?  Strip the production kernel into
cumulative layers and difference the timings on real corpus chunks.

  M1 parse only                  (tag walk, no validation, no emit)
  M2 + validation
  M3 + branch dispatch           (arms do one fixed store)
  M4 full                        (production kernel)
  M5 LUT parse variant           (256-entry tag table in SMEM)

python experiments/e15_decode_breakdown.py [interpret]
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

import snappy_tpu as s
from snappy_tpu.formats import varint
from snappy_tpu.ops import decode_scalar as ds

C_WORDS = ds.C_WORDS
OUT_PAD_WORDS = ds.OUT_PAD_WORDS
_I32 = jnp.int32


def make_kernel(mode):
    def _kernel(meta_ref, comp_ref, out_ref, status_ref):
        n = meta_ref[0, 0, 0]
        m = meta_ref[0, 0, 1]
        MAXB = 4 * (comp_ref.shape[2] - 4)
        out_pad_words = out_ref.shape[2]

        def gbyte(p):
            w = comp_ref[0, 0, p >> 2]
            return (w >> ((p & 3) * 8)) & 255

        def _funnel(wa, wb, sh):
            lo = (wa >> sh) & ((jnp.int32(1) << (32 - sh)) - 1)
            return jax.lax.select(sh == 0, wa, lo | (wb << (32 - sh)))

        def gword_comp(p):
            wa = comp_ref[0, 0, p >> 2]
            wb = comp_ref[0, 0, (p >> 2) + 1]
            return _funnel(wa, wb, (p & 3) * 8)

        def gbyte_out(p):
            w = out_ref[0, 0, p >> 2]
            return (w >> ((p & 3) * 8)) & 255

        def pbyte_out(p, v):
            wi = p >> 2
            sh = (p & 3) * 8
            w = out_ref[0, 0, wi]
            out_ref[0, 0, wi] = (w & ~(255 << sh)) | ((v & 255) << sh)

        def emit(dst0, length, make_load):
            sh_d = (dst0 & 3) * 8
            keep_d = (jnp.int32(1) << sh_d) - 1

            def store_u(p, v):
                wi = p >> 2
                lo = out_ref[0, 0, wi]
                out_ref[0, 0, wi] = (lo & keep_d) | (v << sh_d)
                hi = out_ref[0, 0, wi + 1]
                spill = (v >> (31 - sh_d) >> 1) & keep_d
                out_ref[0, 0, wi + 1] = (hi & ~keep_d) | spill

            g0 = make_load(jnp.int32(0))
            store_u(dst0, g0(jnp.int32(0)))

            @pl.when(length > 4)
            def _():
                store_u(dst0 + 4, g0(jnp.int32(4)))

            @pl.when(length > 8)
            def _():
                o0 = (((dst0 + 8) >> 2) << 2) - dst0
                g1 = make_load(o0)
                wi0 = (dst0 + o0) >> 2
                rem = length - o0

                def body(s):
                    k, wi = s
                    out_ref[0, 0, wi] = g1(k)
                    out_ref[0, 0, wi + 1] = g1(k + 4)
                    return k + 8, wi + 2

                jax.lax.while_loop(
                    lambda s: s[0] < rem, body, (jnp.int32(0), wi0)
                )

        def make_load_comp(base):
            def make(off):
                b2 = base + off
                bw = b2 >> 2
                sh = (b2 & 3) * 8
                mm = (jnp.int32(1) << (32 - sh)) - 1

                def g(o):
                    wi = bw + (o >> 2)
                    wa = comp_ref[0, 0, wi]
                    wb = comp_ref[0, 0, wi + 1]
                    return jax.lax.select(
                        sh == 0, wa, ((wa >> sh) & mm) | (wb << (32 - sh))
                    )

                return g

            return make

        def make_load_out(base):
            def make(off):
                b2 = base + off
                bw = b2 >> 2
                sh = (b2 & 3) * 8
                mm = (jnp.int32(1) << (32 - sh)) - 1

                def g(o):
                    wi = bw + (o >> 2)
                    wa = out_ref[0, 0, wi]
                    wb = out_ref[0, 0, jnp.minimum(wi + 1, out_pad_words - 1)]
                    return jax.lax.select(
                        sh == 0, wa, ((wa >> sh) & mm) | (wb << (32 - sh))
                    )

                return g

            return make

        def do_copy_near(w, off, length):
            b0 = gbyte_out(w - off)
            b1 = gbyte_out(w - off + (off >> 1))
            pat1 = b0 * jnp.int32(0x01010101)
            pat2 = b0 | (b1 << 8) | (b0 << 16) | (b1 << 24)
            pat2s = b1 | (b0 << 8) | (b1 << 16) | (b0 << 24)

            @pl.when(off != 3)
            def _():
                pa = jax.lax.select(off == 1, pat1, pat2)
                pb = jax.lax.select(off == 1, pat1, pat2s)

                def make(off2):
                    pv = jax.lax.select((off2 & 1) == 0, pa, pb)
                    return lambda o: pv

                emit(w, length, make)

            @pl.when(off == 3)
            def _():
                def body(i, carry):
                    pbyte_out(w + i, gbyte_out(w - 3 + i))
                    return carry

                jax.lax.fori_loop(0, length, body, 0)

        def tag_step(state):
            pos, w, err = state
            p = pos
            b = gbyte(p)
            t = b & 3
            lc = b >> 2
            is_lit = t == 0

            ex = jnp.clip(lc - 59, 0, 4)
            ext_word = gword_comp(p + 1)
            emask = jax.lax.select(ex == 4, jnp.int32(-1), (jnp.int32(1) << (ex * 8)) - 1)
            ext_val = ext_word & emask
            lit_wrap = is_lit & (lc >= 60) & (ext_val < 0)
            lit_len = jax.lax.select(lc < 60, lc + 1, ext_val + 1)
            hdr = jax.lax.select(is_lit, 1 + ex, 1 + t + ((t >> 1) & t & 1))

            e1 = ext_word & 255
            off = jax.lax.select(
                t == 1,
                ((b & 0xE0) << 3) | e1,
                ext_word,
            )
            off = jax.lax.select(t == 2, ext_word & 0xFFFF, off)
            cl = jax.lax.select(t == 1, 4 + (lc & 7), 1 + lc)

            length = jax.lax.select(is_lit, lit_len, cl)
            consumed = hdr + jax.lax.select(is_lit, length, 0)

            if mode >= 2:
                bad = lit_wrap
                bad |= is_lit & (lit_len < 0)
                bad |= (pos + jnp.minimum(consumed, MAXB) > n) | (consumed < 0)
                bad |= (length > m - w)
                bad |= (~is_lit) & ((off <= 0) | (off > w))
            else:
                bad = jnp.bool_(False)

            if mode == 5:  # branchless single store
                out_ref[0, 0, (w >> 2) & 16383] = jax.lax.select(bad, off, ext_word)
            elif mode == 6:  # one branch
                @pl.when(~bad)
                def _():
                    out_ref[0, 0, w >> 2] = ext_word
            elif mode == 8:  # branchless emit (timing model; wrong output)
                src = jax.lax.select(is_lit, pos + hdr, jnp.maximum(pos - off, 0))
                ln = jax.lax.select(bad, jnp.int32(1), length)
                emit(jnp.minimum(w, 4 * 16384), ln, make_load_comp(src))
            if mode >= 4 and mode != 5 and mode != 6 and mode != 8:
                @pl.when(~bad)
                def _():
                    @pl.when(is_lit)
                    def _():
                        emit(w, length, make_load_comp(pos + hdr))

                    @pl.when((~is_lit) & (off >= 4))
                    def _():
                        emit(w, length, make_load_out(w - off))

                    @pl.when((~is_lit) & (off < 4))
                    def _():
                        do_copy_near(w, off, length)
            elif mode >= 3:
                @pl.when(~bad)
                def _():
                    @pl.when(is_lit)
                    def _():
                        out_ref[0, 0, w >> 2] = ext_word

                    @pl.when((~is_lit) & (off >= 4))
                    def _():
                        out_ref[0, 0, w >> 2] = off

                    @pl.when((~is_lit) & (off < 4))
                    def _():
                        out_ref[0, 0, w >> 2] = off + 1

            pos2 = jax.lax.select(bad, pos, pos + consumed)
            w2 = jax.lax.select(bad, w, w + length)
            return pos2, w2, err | bad

        def cond(state):
            pos, w, err = state
            return (pos < n) & (~err)

        pos, w, err = jax.lax.while_loop(
            cond, tag_step, (jnp.int32(0), jnp.int32(0), jnp.bool_(False))
        )
        ok = (~err) & (pos == n) & (w == m)
        status_ref[0, 0, 0] = jax.lax.select(ok, jnp.int32(1), jnp.int32(0))
        status_ref[0, 0, 1] = w

    return _kernel


def host_lut():
    """lut[b] = hdr | is_lit<<3 | needs_ext<<4 | len<<5 | off_base<<12;
    lut[256+b] = ext mask for long literals."""
    lut = np.zeros(512, np.int32)
    for b in range(256):
        t = b & 3
        lc = b >> 2
        if t == 0:
            if lc < 60:
                hdr, ln, needs, ex = 1, lc + 1, 0, 0
            else:
                ex = lc - 59
                hdr, ln, needs = 1 + ex, 1, 1
            lut[b] = hdr | (1 << 3) | (needs << 4) | (ln << 5)
            lut[256 + b] = -1 if ex == 4 else (1 << (8 * ex)) - 1
        else:
            if t == 1:
                hdr, ln, ob = 2, 4 + (lc & 7), (b & 0xE0) << 3
            elif t == 2:
                hdr, ln, ob = 3, 1 + lc, 0
            else:
                hdr, ln, ob = 5, 1 + lc, 0
            lut[b] = hdr | (ln << 5) | (ob << 12)
    return lut


def make_kernel_lut(mode):
    def _kernel(lut_ref, meta_ref, comp_ref, out_ref, status_ref):
        n = meta_ref[0, 0, 0]
        m = meta_ref[0, 0, 1]
        MAXB = 4 * (comp_ref.shape[2] - 4)

        def gbyte(p):
            w = comp_ref[0, 0, p >> 2]
            return (w >> ((p & 3) * 8)) & 255

        def gword_comp(p):
            wa = comp_ref[0, 0, p >> 2]
            wb = comp_ref[0, 0, (p >> 2) + 1]
            sh = (p & 3) * 8
            lo = (wa >> sh) & ((jnp.int32(1) << (32 - sh)) - 1)
            return jax.lax.select(sh == 0, wa, lo | (wb << (32 - sh)))

        def emit(dst0, length, make_load):
            sh_d = (dst0 & 3) * 8
            keep_d = (jnp.int32(1) << sh_d) - 1

            def store_u(p, v):
                wi = p >> 2
                lo = out_ref[0, 0, wi]
                out_ref[0, 0, wi] = (lo & keep_d) | (v << sh_d)
                hi = out_ref[0, 0, wi + 1]
                spill = (v >> (31 - sh_d) >> 1) & keep_d
                out_ref[0, 0, wi + 1] = (hi & ~keep_d) | spill

            g0 = make_load(jnp.int32(0))
            store_u(dst0, g0(jnp.int32(0)))

            @pl.when(length > 4)
            def _():
                store_u(dst0 + 4, g0(jnp.int32(4)))

            @pl.when(length > 8)
            def _():
                o0 = (((dst0 + 8) >> 2) << 2) - dst0
                g1 = make_load(o0)
                wi0 = (dst0 + o0) >> 2
                rem = length - o0

                def body(s):
                    k, wi = s
                    out_ref[0, 0, wi] = g1(k)
                    out_ref[0, 0, wi + 1] = g1(k + 4)
                    return k + 8, wi + 2

                jax.lax.while_loop(lambda s: s[0] < rem, body, (jnp.int32(0), wi0))

        def make_load_comp(base):
            def make(off):
                b2 = base + off
                bw = b2 >> 2
                sh = (b2 & 3) * 8
                mm = (jnp.int32(1) << (32 - sh)) - 1

                def g(o):
                    wi = bw + (o >> 2)
                    wa = comp_ref[0, 0, wi]
                    wb = comp_ref[0, 0, wi + 1]
                    return jax.lax.select(
                        sh == 0, wa, ((wa >> sh) & mm) | (wb << (32 - sh))
                    )

                return g

            return make

        def tag_step(state):
            pos, w, err = state
            b = gbyte(pos)
            e = lut_ref[b]
            em = lut_ref[256 + b]
            hdr = e & 7
            is_lit = (e & 8) != 0
            needs = (e & 16) != 0
            lenb = (e >> 5) & 127
            off_base = (e >> 12) & 0x7FF
            ext_word = gword_comp(pos + 1)
            ext_val = ext_word & em
            length = jax.lax.select(needs, ext_val + 1, lenb)
            consumed = hdr + jax.lax.select(is_lit, length, 0)
            t = b & 3
            off = jax.lax.select(
                t == 1,
                off_base | (ext_word & 255),
                jax.lax.select(t == 2, ext_word & 0xFFFF, ext_word),
            )

            if mode >= 2:
                bad = needs & (ext_val < 0)
                bad |= (pos + jnp.minimum(consumed, MAXB) > n) | (consumed < 0)
                bad |= (length > m - w)
                bad |= (~is_lit) & ((off <= 0) | (off > w))
            else:
                bad = jnp.bool_(False)

            if mode >= 3:  # branchless emit timing model (wrong output)
                src = jax.lax.select(is_lit, pos + hdr, jnp.maximum(pos - off, 0))
                ln = jax.lax.select(bad, jnp.int32(1), length)
                emit(jnp.minimum(w, 4 * 16384), ln, make_load_comp(src))

            pos2 = jax.lax.select(bad, pos, pos + consumed)
            w2 = jax.lax.select(bad, w, w + length)
            return pos2, w2, err | bad

        def cond(state):
            pos, w, err = state
            return (pos < n) & (~err)

        pos, w, err = jax.lax.while_loop(
            cond, tag_step, (jnp.int32(0), jnp.int32(0), jnp.bool_(False))
        )
        status_ref[0, 0, 0] = jax.lax.select(
            (~err) & (pos == n) & (w == m), jnp.int32(1), jnp.int32(0))
        status_ref[0, 0, 1] = w

    return _kernel


def build_lut(mode, nb):
    return pl.pallas_call(
        make_kernel_lut(mode),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((512,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, C_WORDS + 4), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, OUT_PAD_WORDS), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb, 1, OUT_PAD_WORDS), jnp.int32),
            jax.ShapeDtypeStruct((nb, 1, 2), jnp.int32),
        ),
        interpret=INTERPRET,
    )


def build(mode, nb):
    return pl.pallas_call(
        make_kernel(mode),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, C_WORDS + 4), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, OUT_PAD_WORDS), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb, 1, OUT_PAD_WORDS), jnp.int32),
            jax.ShapeDtypeStruct((nb, 1, 2), jnp.int32),
        ),
        interpret=INTERPRET,
    )


def sync(x):
    np.asarray(jax.device_get(x.reshape(-1)[:1]))


def prep(data, nb):
    blocks = [data[i * 65536:(i + 1) * 65536] for i in range((len(data) + 65535) // 65536)][:nb]
    bodies, decls = [], []
    for blk in blocks:
        e = s.encode(blk)
        _, v = varint.decode_uint32(e)
        bodies.append(e[v:])
        decls.append(len(blk))
    while len(bodies) < nb:
        bodies.append(b"")
        decls.append(0)
    meta, comp = ds.pack_chunks(bodies, decls)
    return jnp.asarray(meta), jnp.asarray(comp), blocks


def main():
    NB = 16
    for name in ("html", "urls.10K"):
        data = open('/root/reference/tests/data/' + name, 'rb').read()
        meta, comp, blocks = prep(data, NB)
        total = sum(len(b) for b in blocks)
        ntags = 0
        for blk in blocks:
            e = s.encode(blk)
            _, v = varint.decode_uint32(e)
            from experiments.e14_vector_copy import parse_segments
            ntags += len(parse_segments(e[v:], len(blk)))
        print("%s: %d chunks, %d KB, %d tags (%.1f B/tag)"
              % (name, len(blocks), total // 1024, ntags, total / ntags))
        lut = host_lut()
        prev = 0.0
        for mode, label in ((1, "parse"), (2, "+validate"), (3, "+dispatch"),
                            (4, "full"), (5, "branchless-store"),
                            (6, "one-branch-store"), (8, "branchless-emit"),
                            ("L1", "LUT-parse"), ("L2", "LUT+validate"),
                            ("L3", "LUT-branchless-emit")):
            if isinstance(mode, str):
                f0 = build_lut(int(mode[1]), NB)
                f = lambda a, b: f0(lut, a, b)
            else:
                f = build(mode, NB)
            out = f(meta, comp)
            sync(out[1])
            NIT = 2 if INTERPRET else 10
            t0 = time.time()
            for _ in range(NIT):
                out = f(meta, comp)
            sync(out[1])
            dt = (time.time() - t0) / NIT
            if mode == 4:
                st = np.asarray(out[1])
                outs = ds.unpack_output(np.asarray(out[0]), st[:, 0, 1])
                okc = all(bool(st[k, 0, 0]) and outs[k] == blocks[k] for k in range(len(blocks)))
                print("  correct=%s" % okc)
            print("  M%-3s %-18s %7.2f ms  (+%6.2f)  %5.1f ns/tag cum  %6.1f MB/s"
                  % (mode, label, dt * 1e3, (dt - prev) * 1e3, dt / ntags * 1e9, total / dt / 1e6))
            prev = dt


if __name__ == "__main__":
    sys.path.insert(0, '/root/repo/experiments')
    main()
