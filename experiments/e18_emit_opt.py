"""E18: emit-path op-count reduction for the scalar chunk decoder.

Hypotheses (vs the production v2 kernel in ops/decode_scalar.py):
  * the 8-byte head's two store_u RMW word-pair stores (~45 scalar ops)
    can be fused into 1 RMW + 3 clobber-allowed full stores (~34 ops),
    still committing v0 fully before loading v1 (off in [4,8) safety);
  * the >8-byte copy loop can hold a source-word carry so each output
    word costs ONE load instead of a two-load funnel — legal when the
    read cursor lags the write cursor by >= 8 bytes (literals and
    copies with off >= 8); plus a pure word-copy variant when the
    realigned source is word-aligned;
  * the tag byte and its extension word can come from one pair of SMEM
    word loads instead of three.

Run: python experiments/e18_emit_opt.py [interpret]
"""
import sys, time
sys.path.insert(0, '/root/repo')
INTERPRET = "interpret" in sys.argv[1:]
import functools
import jax, jax.numpy as jnp, numpy as np
if INTERPRET:
    # env-var pinning is overridden by the axon sitecustomize; the config
    # update after import is the reliable CPU pin (see tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compilation")

import snappy_tpu as s
from snappy_tpu.formats import varint
from snappy_tpu.ops import decode_scalar as ds

CW_PAD, OUT_WORDS, SCR_WORDS = ds.CW_PAD, ds.OUT_WORDS, ds.SCR_WORDS
_I32 = jnp.int32
_LUT_HDR_MASK, _LUT_LIT, _LUT_EXT = 7, 8, 16


@functools.cache
def _host_lut768():
    """Production 512-entry LUT + a third bank: copy-offset extension mask
    (0 for literals, 0xFF / 0xFFFF / -1 for copy-1/2/4)."""
    base = ds._host_lut()
    lut = np.zeros(768, np.int32)
    lut[:512] = base
    for b in range(256):
        t = b & 3
        lut[512 + b] = {0: 0, 1: 0xFF, 2: 0xFFFF, 3: -1}[t]
    return lut


def _make_kernel_opt(cw_pad: int, out_words: int, stride16: bool = True):
    out_base_b = 4 * cw_pad
    scr_b = 4 * (cw_pad + out_words + 4)
    maxb = 4 * cw_pad
    BUF_CAP = cw_pad + out_words + SCR_WORDS

    def _kernel(lut_ref, meta_ref, comp_ref, out_ref, status_ref,
                buf_ref, sem_in, sem_out):
        i = pl.program_id(0)
        n = meta_ref[0, 0, 0]
        m = meta_ref[0, 0, 1]

        copy_in = pltpu.make_async_copy(
            comp_ref.at[pl.ds(i * cw_pad, cw_pad)],
            buf_ref.at[pl.ds(0, cw_pad)], sem_in)
        copy_in.start()
        copy_in.wait()

        def gbyte_out(p):
            w = buf_ref[(out_base_b + p) >> 2]
            return (w >> ((p & 3) * 8)) & 255

        def pbyte_out(p, v):
            wi = (out_base_b + p) >> 2
            sh = (p & 3) * 8
            w = buf_ref[wi]
            buf_ref[wi] = (w & ~(255 << sh)) | ((v & 255) << sh)

        def emit_mem(dst0, length, src0, carry_ok):
            """Copy ``length`` bytes buf[src0:] -> buf[dst0:] (byte offsets).

            Same over-write contract as production emit.  ``carry_ok``
            must be False when 4 <= dst0 - src0 < 8 (self-overlap closer
            than one carry word).
            """
            sh_d = (dst0 & 3) * 8
            keep_d = (jnp.int32(1) << sh_d) - 1
            wi = dst0 >> 2
            sw = src0 >> 2
            sh_s = (src0 & 3) * 8
            mm_s = (jnp.int32(1) << (32 - sh_s)) - 1

            def gsrc(o):
                wa = buf_ref[sw + (o >> 2)]
                wb = buf_ref[sw + (o >> 2) + 1]
                return jax.lax.select(
                    sh_s == 0, wa, ((wa >> sh_s) & mm_s) | (wb << (32 - sh_s)))

            # ---- fused head: 8 bytes, one RMW + full stores ----
            v0 = gsrc(jnp.int32(0))
            lo = buf_ref[wi]
            buf_ref[wi] = (lo & keep_d) | (v0 << sh_d)
            sp0 = (v0 >> (31 - sh_d) >> 1) & keep_d
            buf_ref[wi + 1] = sp0           # commit all of v0 before loading v1
            v1 = gsrc(jnp.int32(4))
            buf_ref[wi + 1] = sp0 | (v1 << sh_d)
            buf_ref[wi + 2] = (v1 >> (31 - sh_d) >> 1) & keep_d

            @pl.when(length > 8)
            def _():
                o0 = (((dst0 + 8) >> 2) << 2) - dst0   # in [5, 8]
                rem = length - o0
                wi0 = (dst0 + o0) >> 2
                s0 = src0 + o0
                sw2 = s0 >> 2
                sh2 = (s0 & 3) * 8
                mm2 = (jnp.int32(1) << (32 - sh2)) - 1

                @pl.when(carry_ok & (sh2 == 0))
                def _():  # aligned source: plain word copy
                    if stride16:
                        def body(st):
                            k, wo, si = st
                            buf_ref[wo] = buf_ref[si]
                            buf_ref[wo + 1] = buf_ref[si + 1]
                            buf_ref[wo + 2] = buf_ref[si + 2]
                            buf_ref[wo + 3] = buf_ref[si + 3]
                            return k + 16, wo + 4, si + 4
                    else:
                        def body(st):
                            k, wo, si = st
                            buf_ref[wo] = buf_ref[si]
                            buf_ref[wo + 1] = buf_ref[si + 1]
                            return k + 8, wo + 2, si + 2
                    jax.lax.while_loop(lambda st: st[0] < rem, body,
                                       (jnp.int32(0), wi0, sw2))

                @pl.when(carry_ok & (sh2 != 0))
                def _():  # funnel with carried word: 1 load/word
                    if stride16:
                        def body(st):
                            k, wo, si, carry = st
                            wa = buf_ref[si]
                            buf_ref[wo] = ((carry >> sh2) & mm2) | (wa << (32 - sh2))
                            wb = buf_ref[si + 1]
                            buf_ref[wo + 1] = ((wa >> sh2) & mm2) | (wb << (32 - sh2))
                            wc = buf_ref[si + 2]
                            buf_ref[wo + 2] = ((wb >> sh2) & mm2) | (wc << (32 - sh2))
                            wd = buf_ref[si + 3]
                            buf_ref[wo + 3] = ((wc >> sh2) & mm2) | (wd << (32 - sh2))
                            return k + 16, wo + 4, si + 4, wd
                    else:
                        def body(st):
                            k, wo, si, carry = st
                            wa = buf_ref[si]
                            buf_ref[wo] = ((carry >> sh2) & mm2) | (wa << (32 - sh2))
                            wb = buf_ref[si + 1]
                            buf_ref[wo + 1] = ((wa >> sh2) & mm2) | (wb << (32 - sh2))
                            return k + 8, wo + 2, si + 2, wb
                    jax.lax.while_loop(lambda st: st[0] < rem, body,
                                       (jnp.int32(0), wi0, sw2 + 1,
                                        buf_ref[sw2]))

                @pl.when(~carry_ok)
                def _():  # off in [4,8): two-load funnel, reads after stores
                    def g1(o):
                        b2 = s0 + o
                        wa = buf_ref[b2 >> 2]
                        wb = buf_ref[(b2 >> 2) + 1]
                        shx = (b2 & 3) * 8
                        mmx = (jnp.int32(1) << (32 - shx)) - 1
                        return jax.lax.select(
                            shx == 0, wa, ((wa >> shx) & mmx) | (wb << (32 - shx)))
                    def body(st):
                        k, wo = st
                        buf_ref[wo] = g1(k)
                        buf_ref[wo + 1] = g1(k + 4)
                        return k + 8, wo + 2
                    jax.lax.while_loop(lambda st: st[0] < rem, body,
                                       (jnp.int32(0), wi0))

        def emit_pat(dst0, length, pa, pb):
            """Pattern emit for near copies (off 1/2): period-<=2 words."""
            sh_d = (dst0 & 3) * 8
            keep_d = (jnp.int32(1) << sh_d) - 1

            def store_u(p, v):
                wi = p >> 2
                lo = buf_ref[wi]
                buf_ref[wi] = (lo & keep_d) | (v << sh_d)
                hi = buf_ref[wi + 1]
                spill = (v >> (31 - sh_d) >> 1) & keep_d
                buf_ref[wi + 1] = (hi & ~keep_d) | spill

            # stride-4 stores preserve period-2 parity: one pattern word
            # per aligned stride (pb only when the realigned start is odd)
            store_u(dst0, pa)
            store_u(dst0 + 4, pa)

            @pl.when(length > 8)
            def _():
                o0 = (((dst0 + 8) >> 2) << 2) - dst0
                rem = length - o0
                wi0 = (dst0 + o0) >> 2
                va = jax.lax.select((o0 & 1) == 0, pa, pb)
                def body(st):
                    k, wo = st
                    buf_ref[wo] = va
                    buf_ref[wo + 1] = va
                    return k + 8, wo + 2
                jax.lax.while_loop(lambda st: st[0] < rem, body,
                                   (jnp.int32(0), wi0))

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
                emit_pat(out_base_b + w, length, pa, pb)

            @pl.when(off == 3)
            def _():
                def body(j, carry):
                    pbyte_out(w + j, gbyte_out(w - 3 + j))
                    return carry
                jax.lax.fori_loop(0, length, body, 0)

        def tag_step(state):
            pos, w, err = state
            # fused parse: tag byte + extension word from one word pair
            w0 = buf_ref[pos >> 2]
            w1 = buf_ref[(pos >> 2) + 1]
            sh = (pos & 3) * 8
            b = (w0 >> sh) & 255
            she = sh + 8
            ext_word = jax.lax.select(
                she == 32, w1,
                ((w0 >> she) & ((jnp.int32(1) << (32 - she)) - 1))
                | (w1 << (32 - she)))
            e = lut_ref[b]
            em = lut_ref[256 + b]
            hdr = e & _LUT_HDR_MASK
            is_lit = (e & _LUT_LIT) != 0
            needs = (e & _LUT_EXT) != 0
            lenb = (e >> 5) & 127
            off_base = (e >> 12) & 0x7FF

            ext_val = ext_word & em
            length = jax.lax.select(needs, ext_val + 1, lenb)
            consumed = hdr + jax.lax.select(is_lit, length, 0)
            off = off_base | (ext_word & lut_ref[512 + b])

            bad = needs & (ext_val < 0)
            # consumed > n - pos is overflow-safe (n - pos is small); the
            # consumed < 0 check catches hdr + length int32 wraparound
            bad |= (consumed > n - pos) | (consumed < 0)
            bad |= length > m - w
            bad |= (~is_lit) & ((off <= 0) | (off > w))

            near = (~is_lit) & (off < 4)
            redirect = bad | near
            src = jax.lax.select(is_lit, pos + hdr, out_base_b + w - off)
            src = jnp.clip(src, 0, jnp.int32(4 * (BUF_CAP - 4)))
            dst = jax.lax.select(redirect, jnp.int32(scr_b), out_base_b + w)
            ln_eff = jax.lax.select(bad, jnp.int32(4), length)
            carry_ok = is_lit | (off >= 8) | redirect
            emit_mem(dst, ln_eff, src, carry_ok)

            @pl.when(near & ~bad)
            def _():
                do_copy_near(w, off, length)

            pos2 = jax.lax.select(bad, pos, pos + consumed)
            w2 = jax.lax.select(bad, w, w + length)
            return pos2, w2, err | bad

        def cond(state):
            pos, w, err = state
            return (pos < n) & (~err)

        pos, w, err = jax.lax.while_loop(
            cond, tag_step, (jnp.int32(0), jnp.int32(0), jnp.bool_(False)))
        ok = (~err) & (pos == n) & (w == m)
        status_ref[0, 0, 0] = jax.lax.select(ok, jnp.int32(1), jnp.int32(0))
        status_ref[0, 0, 1] = w

        copy_out = pltpu.make_async_copy(
            buf_ref.at[pl.ds(cw_pad, out_words)],
            out_ref.at[pl.ds(i * out_words, out_words)], sem_out)
        copy_out.start()
        copy_out.wait()

    return _kernel


@functools.partial(jax.jit, static_argnums=(3, 4))
def _decode_opt(lut, meta, comp_words, nb, stride16=True):
    out_flat, status = pl.pallas_call(
        _make_kernel_opt(CW_PAD, OUT_WORDS, stride16),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((768,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb * OUT_WORDS,), jnp.int32),
            jax.ShapeDtypeStruct((nb, 1, 2), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.SMEM((CW_PAD + OUT_WORDS + SCR_WORDS,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=INTERPRET,
    )(lut, meta, comp_words)
    return out_flat.reshape(nb, 1, OUT_WORDS), status


def sync(x):
    np.asarray(jax.device_get(x.reshape(-1)[:1]))


def prep(data, nb):
    blocks = [data[i*65536:(i+1)*65536]
              for i in range((len(data)+65535)//65536)][:nb]
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
    return jnp.asarray(meta), jnp.asarray(comp.view(np.int32)), blocks


lut = jnp.asarray(_host_lut768())

if INTERPRET:
    # correctness-only: small adversarial streams through the opt kernel
    import random
    rng = random.Random(7)
    streams = []
    for off in range(1, 12):          # every near/overlap offset class
        base = bytes(rng.randrange(256) for _ in range(off + 3))
        streams.append(base * ((300 // len(base)) + 1))
    streams.append(b"")
    streams.append(b"a")
    streams.append(bytes(rng.randrange(256) for _ in range(997)))  # incompressible
    streams.append((b"abcdefgh" * 40) + bytes(rng.randrange(256) for _ in range(64)))
    txt = open('/root/reference/tests/data/alice29.txt', 'rb').read()[:2048]
    streams.append(txt)
    bodies, decls = [], []
    for blk in streams:
        e = s.encode(blk)
        _, v = varint.decode_uint32(e)
        bodies.append(e[v:])
        decls.append(len(blk))
    meta, comp = ds.pack_chunks(bodies, decls)
    out_w, st = _decode_opt(lut, jnp.asarray(meta), jnp.asarray(comp), len(streams))
    st_h = np.asarray(st)
    outs = ds.unpack_output(np.asarray(out_w), st_h[:, 0, 1])
    nbad = 0
    for k, blk in enumerate(streams):
        good = bool(st_h[k, 0, 0]) and outs[k] == blk
        if not good:
            nbad += 1
            print("MISMATCH stream %d len=%d ok=%d outlen=%d" %
                  (k, len(blk), st_h[k, 0, 0], len(outs[k])))
            for j in range(min(len(blk), len(outs[k]))):
                if blk[j] != outs[k][j]:
                    print("  first diff at %d: want %02x got %02x" %
                          (j, blk[j], outs[k][j]))
                    break
    print("interpret correctness: %d/%d ok" % (len(streams)-nbad, len(streams)))
    sys.exit(0 if nbad == 0 else 1)

FILES = ["html", "urls.10K", "alice29.txt", "fireworks.jpeg",
         "paper-100k.pdf", "plrabn12.txt"]
NB = 96
NIT = 10

for name in FILES:
    data = open('/root/reference/tests/data/'+name, 'rb').read()
    data = (data * ((NB * 65536) // len(data) + 1))[:NB * 65536]
    meta, comp, blocks = prep(data, NB)
    total = sum(len(b) for b in blocks)
    row = "%-14s %4.0f KB" % (name, total/1024)
    for label, fn in (("prod", lambda: ds.decode_chunks_words(meta, comp, NB)),
                      ("opt8", lambda: _decode_opt(lut, meta, comp, NB, False)),
                      ("opt16", lambda: _decode_opt(lut, meta, comp, NB, True))):
        out_w, st = fn()
        sync(st)
        st_h = np.asarray(st)
        out_h = np.asarray(out_w)
        outs = ds.unpack_output(out_h, st_h[:, 0, 1])
        ok = all(bool(st_h[k, 0, 0]) and outs[k] == blocks[k]
                 for k in range(len(blocks)))
        t0 = time.time()
        for _ in range(NIT):
            out_w, st = fn()
        sync(st)
        dt = (time.time()-t0)/NIT
        row += "  %s ok=%d %7.3f ms %6.1f MB/s" % (label, ok, dt*1e3,
                                                   total/dt/1e6)
    print(row)
