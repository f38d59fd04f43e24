"""E20: where do the v3 chunk-decoder's cycles go?  Strip the production
kernel into cumulative layers and difference the timings on real corpus
chunks (the e15 exercise, redone against the v3 design).

  M1 parse only      (fused tag walk + LUT, no validation, no emit)
  M2 + validation
  M3 + head emit     (emit_mem head, no >8 loop, no near branch)
  M4 full            (production kernel)

Run: python experiments/e20_v3_breakdown.py
"""
import sys, time
sys.path.insert(0, '/root/repo')
import functools
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compilation")

import snappy_tpu as s
from snappy_tpu.formats import varint
from snappy_tpu.ops import decode_scalar as ds

CW_PAD, OUT_WORDS, SCR_WORDS = ds.CW_PAD, ds.OUT_WORDS, ds.SCR_WORDS
LUT_WORDS = ds.LUT_WORDS


def make_kernel(mode):
    out_base_b = 4 * CW_PAD
    scr_b = 4 * (CW_PAD + OUT_WORDS + 4)
    BUF_CAP = CW_PAD + OUT_WORDS + SCR_WORDS

    def _kernel(lut_ref, meta_ref, comp_ref, out_ref, status_ref,
                buf_ref, sem_in, sem_out):
        i = pl.program_id(0)
        n = meta_ref[0, 0, 0]
        m = meta_ref[0, 0, 1]
        copy_in = pltpu.make_async_copy(
            comp_ref.at[pl.ds(i * CW_PAD, CW_PAD)],
            buf_ref.at[pl.ds(0, CW_PAD)], sem_in)
        copy_in.start()
        copy_in.wait()

        def emit_head(dst0, src0):
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

            v0 = gsrc(jnp.int32(0))
            lo = buf_ref[wi]
            buf_ref[wi] = (lo & keep_d) | (v0 << sh_d)
            sp0 = (v0 >> (31 - sh_d) >> 1) & keep_d
            buf_ref[wi + 1] = sp0
            v1 = gsrc(jnp.int32(4))
            buf_ref[wi + 1] = sp0 | (v1 << sh_d)
            buf_ref[wi + 2] = (v1 >> (31 - sh_d) >> 1) & keep_d

        def tag_step(state):
            pos, w, err = state
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
            hdr = e & 7
            is_lit = (e & 8) != 0
            needs = (e & 16) != 0
            lenb = (e >> 5) & 127
            off_base = (e >> 12) & 0x7FF
            ext_val = ext_word & em
            length = jax.lax.select(needs, ext_val + 1, lenb)
            consumed = hdr + jax.lax.select(is_lit, length, 0)
            off = off_base | (ext_word & lut_ref[512 + b])

            if mode >= 2:
                bad = needs & (ext_val < 0)
                bad |= (consumed > n - pos) | (consumed < 0)
                bad |= length > m - w
                bad |= (~is_lit) & ((off <= 0) | (off > w))
            else:
                bad = jnp.bool_(False)

            if mode >= 3:
                near = (~is_lit) & (off < 4)
                redirect = bad | near
                src = jax.lax.select(is_lit, pos + hdr, out_base_b + w - off)
                src = jnp.clip(src, 0, jnp.int32(4 * (BUF_CAP - 4)))
                dst = jax.lax.select(redirect, jnp.int32(scr_b),
                                     out_base_b + w)
                emit_head(dst, src)

            pos2 = jax.lax.select(bad, pos, pos + consumed)
            w2 = jax.lax.select(bad, w, w + length)
            # keep the off value live so the parse isn't dead-code-eliminated
            err2 = err | bad | (off == jnp.int32(-12345))
            return pos2, w2, err2

        def cond(state):
            pos, w, err = state
            return (pos < n) & (~err) & (w <= 4 * OUT_WORDS)

        pos, w, err = jax.lax.while_loop(
            cond, tag_step, (jnp.int32(0), jnp.int32(0), jnp.bool_(False)))
        status_ref[0, 0, 0] = jax.lax.select(err, jnp.int32(0), jnp.int32(1))
        status_ref[0, 0, 1] = w
        copy_out = pltpu.make_async_copy(
            buf_ref.at[pl.ds(CW_PAD, OUT_WORDS)],
            out_ref.at[pl.ds(i * OUT_WORDS, OUT_WORDS)], sem_out)
        copy_out.start()
        copy_out.wait()

    return _kernel


@functools.partial(jax.jit, static_argnums=(3, 4))
def run_mode(lut, meta, comp_words, nb, mode):
    return pl.pallas_call(
        make_kernel(mode),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((LUT_WORDS,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
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
        interpret=False,
    )(lut, meta, comp_words)


def sync(x):
    np.asarray(jax.device_get(x.reshape(-1)[:1]))


def prep(data, nb):
    blocks = [data[i*65536:(i+1)*65536]
              for i in range((len(data)+65535)//65536)][:nb]
    bodies, decls, ntags = [], [], 0
    for blk in blocks:
        e = s.encode(blk)
        _, v = varint.decode_uint32(e)
        bodies.append(e[v:])
        decls.append(len(blk))
        # count tags with the oracle parse
        p, body = 0, e[v:]
        while p < len(body):
            t = body[p] & 3
            if t == 0:
                lc = body[p] >> 2
                if lc < 60:
                    p += 1 + lc + 1
                else:
                    ex = lc - 59
                    ln = int.from_bytes(body[p+1:p+1+ex], 'little') + 1
                    p += 1 + ex + ln
            else:
                p += {1: 2, 2: 3, 3: 5}[t]
            ntags += 1
    meta, comp = ds.pack_chunks(bodies, decls)
    return jnp.asarray(meta), jnp.asarray(comp.view(np.int32)), blocks, ntags


NB = 96
NIT = 10
lut = jnp.asarray(ds._host_lut())
for name in ("html", "urls.10K", "alice29.txt"):
    data = open('/root/reference/tests/data/'+name, 'rb').read()
    data = (data * ((NB * 65536) // len(data) + 1))[:NB * 65536]
    meta, comp, blocks, ntags = prep(data, NB)
    total = sum(len(b) for b in blocks)
    row = "%-12s %4.1fMB %7d tags (%4.1f B/seg)" % (
        name, total/1e6, ntags, total/ntags)
    times = {}
    for mode in (1, 2, 3):
        out_w, st = run_mode(lut, meta, comp, NB, mode)
        sync(st)
        t0 = time.time()
        for _ in range(NIT):
            out_w, st = run_mode(lut, meta, comp, NB, mode)
        sync(st)
        times[mode] = (time.time()-t0)/NIT
    out_w, st = ds.decode_chunks_words(meta, comp, NB)
    sync(st)
    t0 = time.time()
    for _ in range(NIT):
        out_w, st = ds.decode_chunks_words(meta, comp, NB)
    sync(st)
    times[4] = (time.time()-t0)/NIT
    row += "  M1=%5.1f M2=%5.1f M3=%5.1f M4=%5.1f ms" % (
        1e3*times[1], 1e3*times[2], 1e3*times[3], 1e3*times[4])
    row += "  ns/tag: parse=%4.1f +val=%4.1f +head=%4.1f +loop&near=%4.1f" % (
        1e9*times[1]/ntags, 1e9*(times[2]-times[1])/ntags,
        1e9*(times[3]-times[2])/ntags, 1e9*(times[4]-times[3])/ntags)
    print(row)
