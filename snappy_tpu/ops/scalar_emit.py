"""Shared scalar-core emit/parse closures (the v3 design).

Both SMEM-unified decoders — the per-chunk kernel (decode_scalar.py) and
the grid-mode streaming kernel (decode_stream.py) — place the compressed
bytes and the output window in ONE int32 SMEM buffer and share these
closures.  All offsets are absolute BYTE offsets into ``buf_ref``.

Design notes (measured, experiments/e15+e18):

* **Fused 8-byte head**: one read-modify-write preserving bytes below the
  destination cursor, then clobber-allowed full-word stores — bytes past a
  segment end are repaired by later segments (the same trick as the
  reference's unconditional 16-byte literal bursts, encoder.nim:58-62).
* **Carried-word copy loops**: one SMEM load per output word; ``carry_ok``
  must be False for self-overlapping copies with 4 <= dst-src < 8 (the
  loop pre-reads one source word ahead).
* **Pattern near-copies**: offsets 1/2 replicate as constant pattern words
  (scalar analog of the reference's pattern-doubling, decoder.nim:130-144);
  offset 3 takes a byte loop (copy lengths are <= 64).
* **Fused LUT parse**: the tag byte and its extension word always sit in
  the same two SMEM words; a 512-entry LUT (see decode_scalar._host_lut)
  maps the tag byte to header/flags/length and offset-extension masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def make_emit_ops(buf_ref):
    """Build the emit closures over one unified SMEM buffer.

    Returns (emit_mem, emit_pat, do_copy_near, gbyte, pbyte).  None of
    the closures bounds-check: callers clamp sources themselves (or use
    make_tag_dispatch, which does).
    """

    def gbyte(p):
        w = buf_ref[p >> 2]
        return (w >> ((p & 3) * 8)) & 255

    def pbyte(p, v):
        wi = p >> 2
        sh = (p & 3) * 8
        w = buf_ref[wi]
        buf_ref[wi] = (w & ~(255 << sh)) | ((v & 255) << sh)

    def emit_mem(dst0, length, src0, carry_ok):
        """Copy ``length`` bytes buf[src0:] -> buf[dst0:] (byte offsets).

        Over-writes up to 11 bytes past the segment end at positions
        >= the cursor (repaired by later segments).  The head commits
        all of v0 before loading v1, which makes off >= 4
        self-overlapping copies correct by store/load sequencing; the
        carried-word loops additionally pre-read one word ahead, so
        ``carry_ok`` must be False for 4 <= dst0 - src0 < 8.
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
                sh_s == 0, wa, ((wa >> sh_s) & mm_s) | (wb << (32 - sh_s))
            )

        # ---- fused 8-byte head: one RMW + clobber-allowed stores ----
        # (unconditional: bytes past the end are repaired later; a
        # length test branch costs more than the stores)
        v0 = gsrc(jnp.int32(0))
        lo = buf_ref[wi]
        buf_ref[wi] = (lo & keep_d) | (v0 << sh_d)
        # (v >> 31 >> 1) avoids the undefined shift-by-32 at sh_d==0
        sp0 = (v0 >> (31 - sh_d) >> 1) & keep_d
        buf_ref[wi + 1] = sp0  # commit all of v0 before loading v1
        v1 = gsrc(jnp.int32(4))
        buf_ref[wi + 1] = sp0 | (v1 << sh_d)
        buf_ref[wi + 2] = (v1 >> (31 - sh_d) >> 1) & keep_d

        @pl.when(length > 8)
        def _():
            # Restart at the last aligned destination address <=
            # dst0+8; overlapped bytes re-write identical values.
            o0 = (((dst0 + 8) >> 2) << 2) - dst0  # in [5, 8]
            rem = length - o0
            wi0 = (dst0 + o0) >> 2
            s0 = src0 + o0
            sw2 = s0 >> 2
            sh2 = (s0 & 3) * 8
            mm2 = (jnp.int32(1) << (32 - sh2)) - 1

            @pl.when(carry_ok & (sh2 == 0))
            def _():  # aligned source: plain word copy
                def body(st):
                    k, wo, si = st
                    buf_ref[wo] = buf_ref[si]
                    buf_ref[wo + 1] = buf_ref[si + 1]
                    return k + 8, wo + 2, si + 2

                jax.lax.while_loop(
                    lambda st: st[0] < rem, body, (jnp.int32(0), wi0, sw2)
                )

            @pl.when(carry_ok & (sh2 != 0))
            def _():  # funnel with carried word: one load per word
                def body(st):
                    k, wo, si, carry = st
                    wa = buf_ref[si]
                    buf_ref[wo] = ((carry >> sh2) & mm2) | (wa << (32 - sh2))
                    wb = buf_ref[si + 1]
                    buf_ref[wo + 1] = ((wa >> sh2) & mm2) | (wb << (32 - sh2))
                    return k + 8, wo + 2, si + 2, wb

                jax.lax.while_loop(
                    lambda st: st[0] < rem,
                    body,
                    (jnp.int32(0), wi0, sw2 + 1, buf_ref[sw2]),
                )

            @pl.when(~carry_ok)
            def _():  # off in [4, 8): re-load funnel, reads after stores
                def g1(o):
                    b2 = s0 + o
                    wa = buf_ref[b2 >> 2]
                    wb = buf_ref[(b2 >> 2) + 1]
                    shx = (b2 & 3) * 8
                    mmx = (jnp.int32(1) << (32 - shx)) - 1
                    return jax.lax.select(
                        shx == 0,
                        wa,
                        ((wa >> shx) & mmx) | (wb << (32 - shx)),
                    )

                def body(st):
                    k, wo = st
                    buf_ref[wo] = g1(k)
                    buf_ref[wo + 1] = g1(k + 4)
                    return k + 8, wo + 2

                jax.lax.while_loop(
                    lambda st: st[0] < rem, body, (jnp.int32(0), wi0)
                )

    def emit_pat(dst0, length, pa, pb):
        """Pattern emit for near copies (off 1/2).  Stride-4 stores
        preserve period-2 parity: one pattern word per aligned stride
        (``pb`` only when the realigned loop start is odd)."""
        sh_d = (dst0 & 3) * 8
        keep_d = (jnp.int32(1) << sh_d) - 1

        def store_u(p, v):
            wi = p >> 2
            lo = buf_ref[wi]
            buf_ref[wi] = (lo & keep_d) | (v << sh_d)
            hi = buf_ref[wi + 1]
            spill = (v >> (31 - sh_d) >> 1) & keep_d
            buf_ref[wi + 1] = (hi & ~keep_d) | spill

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

            jax.lax.while_loop(
                lambda st: st[0] < rem, body, (jnp.int32(0), wi0)
            )

    def do_copy_near(dst0, off, length):
        """Near copy, off in {1, 2, 3}: the run is periodic.  dst0 is the
        absolute destination byte; the source is dst0 - off (valid history
        guaranteed by the caller)."""
        b0 = gbyte(dst0 - off)
        b1 = gbyte(dst0 - off + (off >> 1))  # second byte when off == 2
        pat1 = b0 * jnp.int32(0x01010101)
        pat2 = b0 | (b1 << 8) | (b0 << 16) | (b1 << 24)
        pat2s = b1 | (b0 << 8) | (b1 << 16) | (b0 << 24)

        @pl.when(off != 3)
        def _():
            pa = jax.lax.select(off == 1, pat1, pat2)
            pb = jax.lax.select(off == 1, pat1, pat2s)
            emit_pat(dst0, length, pa, pb)

        @pl.when(off == 3)
        def _():
            def body(j, carry):
                pbyte(dst0 + j, gbyte(dst0 - 3 + j))
                return carry

            jax.lax.fori_loop(0, length, body, 0)

    return emit_mem, emit_pat, do_copy_near, gbyte, pbyte


def make_parser(lut_ref, buf_ref):
    """Fused LUT tag parse: returns parse(pos) ->
    (b, hdr, is_lit, needs, ext_val, length, off).

    The tag byte and its extension word (bytes pos+1..pos+4, covering the
    literal length extension and the copy offset alike) always live in
    the same two SMEM words.  length/off are the fully decoded values;
    ext_val is exposed for the overflow checks (callers must reject
    ``needs & ((ext_val < 0) | (length < 0))``).  For literal tags
    ``off`` is garbage (== ext_val) — read it only under ``~is_lit``.
    """

    def parse(pos):
        w0 = buf_ref[pos >> 2]
        w1 = buf_ref[(pos >> 2) + 1]
        sh = (pos & 3) * 8
        b = (w0 >> sh) & 255
        she = sh + 8
        ext_word = jax.lax.select(
            she == 32,
            w1,
            ((w0 >> she) & ((jnp.int32(1) << (32 - she)) - 1))
            | (w1 << (32 - she)),
        )
        e = lut_ref[b]
        em = lut_ref[256 + b]  # unified mask: literal-ext OR copy-offset
        hdr = e & 7
        is_lit = (e & 8) != 0
        needs = (e & 16) != 0
        lenb = (e >> 5) & 127
        off_base = (e >> 12) & 0x7FF
        ext_val = ext_word & em
        length = jax.lax.select(needs, ext_val + 1, lenb)
        # for literals off is garbage (== ext_val) — callers only read it
        # under ~is_lit
        off = off_base | ext_val
        return b, hdr, is_lit, needs, ext_val, length, off

    return parse


def make_run_lookahead(buf_ref):
    """Max-length copy-run coalescer with a same-offset tail merge.

    Consecutive copy tags whose offsets are all EQUAL describe one
    contiguous source region: a copy of ``l`` bytes at output cursor
    ``w`` from ``w - off`` followed by a copy at ``w + l`` from
    ``w + l - off`` is a single copy of ``l + l2`` bytes from
    ``w - off``.  Long matches hit the wire exactly this way: a run of
    byte-identical max-length tagCopy2 ops (0xFE) ending in one SHORTER
    tag at the same offset (emit_copy's 68/64/60 splitting,
    encoder.nim:83-111).  The detection is deliberately asymmetric
    (measured, experiments/e29): entry only on a 0xFE tag (one compare
    on the hot path — a general any-copy2 entry probe measured -7..-11%
    on html/geo/RLE), a cheap byte-identical inner loop, then ONE
    general same-offset tagCopy2 tail merge.  This covers 52.6% of
    geo.protodata's, 43.4% of html's and 13.7% of paper-100k.pdf's
    output bytes (experiments/e28 runsC).

    Returns ``lookahead(pos, off, length, in_limit, out_room)`` ->
    ``(tot, extra)``:
      pos      -- byte offset of the current (already validated) 0xFE
                  tag; off/length its decoded offset/length
      in_limit -- continuation tags must END at or before this input
                  byte offset
      out_room -- the coalesced total may not exceed this many bytes
    ``tot`` is the coalesced length (>= length), ``extra`` the extra
    input bytes consumed past the current tag's 3-byte header.
    Continuations need no further validation: their offset equals the
    validated current tag's (> 0, <= written), lengths are bounded by
    ``out_room``, and their bytes lie inside ``in_limit``.
    """

    def load24(p):
        w0 = buf_ref[p >> 2]
        w1 = buf_ref[(p >> 2) + 1]
        sh = (p & 3) * 8
        return jax.lax.select(
            sh == 0, w0,
            ((w0 >> sh) & ((jnp.int32(1) << (32 - sh)) - 1))
            | (w1 << (32 - sh))) & 0xFFFFFF

    def lookahead(pos, off, length, in_limit, out_room):
        t24 = load24(pos)
        # probe cap: 16 tags per-tag, then (RLE-length runs) switch to a
        # word scan — folded into the existing output-room compare so the
        # per-tag body cost is unchanged
        cap16 = length + jnp.int32(1024)
        cap_tot = jnp.minimum(out_room, cap16)

        def tag_loop(p0, tot0, cap):
            def body(st):
                p2, tot, go = st
                same = ((p2 + 3 <= in_limit) & (tot + 64 <= cap)
                        & (load24(p2) == t24))
                return (jax.lax.select(same, p2 + 3, p2),
                        tot + jax.lax.select(same, jnp.int32(64),
                                             jnp.int32(0)),
                        same)

            p2, tot, _ = jax.lax.while_loop(
                lambda st: st[2], body, (p0, tot0, jnp.bool_(True)))
            return p2, tot

        p2, tot = tag_loop(pos + 3, length, cap_tot)

        def word_scan(a):
            """A run that survived the 16-tag probe has word period 3
            (byte period 3 divides 12): verify 4 tags per 3-word compare
            against the three carrier words of the confirmed region,
            then resume the per-tag loop at the last verified 3-byte tag
            boundary (which re-validates the tail exactly)."""
            p2, tot = a
            qs = p2 >> 2
            Wa = buf_ref[qs - 3]
            Wb = buf_ref[qs - 2]
            Wc = buf_ref[qs - 1]
            # bounds: input words below in_limit; output tags below
            # out_room (each verified tag emits 64 bytes)
            pb = p2 + 3 * ((out_room - tot) >> 6)
            jlim = jnp.minimum((in_limit >> 2) - qs - 3,
                               (pb >> 2) - qs - 3)

            def body(st):
                j, go = st
                x = ((buf_ref[qs + j] ^ Wa)
                     | (buf_ref[qs + j + 1] ^ Wb)
                     | (buf_ref[qs + j + 2] ^ Wc))
                return j + 3, (x == 0) & (j <= jlim)

            j, _ = jax.lax.while_loop(
                lambda st: st[1], body, (jnp.int32(0), jnp.bool_(True)))
            vend = 4 * (qs + jnp.maximum(j - 3, 0))  # verified below this
            ktags = jnp.maximum((vend - p2) // 3, 0)
            return tag_loop(p2 + 3 * ktags, tot + 64 * ktags, out_room)

        # tot reaches length+1024 only by coalescing all 16 probe tags
        # (and only when out_room allowed it): the run is long — scan
        p2, tot = jax.lax.cond(
            tot == cap16, word_scan, lambda a: a, (p2, tot))

        t24b = load24(p2)
        ln2 = ((t24b & 0xFF) >> 2) + 1
        tail = ((p2 + 3 <= in_limit) & ((t24b & 3) == 2)
                & ((t24b >> 8) == off) & (tot + ln2 <= out_room))
        tot = tot + jax.lax.select(tail, ln2, jnp.int32(0))
        p2 = jax.lax.select(tail, p2 + 3, p2)
        return tot, p2 - (pos + 3)

    return lookahead


def make_tag_dispatch(emit_mem, do_copy_near, out_base_b: int, scr_b: int,
                      buf_cap_words: int, emit_long=None,
                      long_t: int = 4096, emit_fill=None, gbyte=None,
                      handle_near: bool = True, emit_copy_dma=None,
                      long_copy_t: int = 16384):
    """The shared redirect-emit idiom used by every tag loop.

    One branchless ``emit_mem`` serves literals and far copies alike;
    near copies (off < 4) and suppressed tags (validation failure or a
    fast-loop 'special' exit) redirect the word-emit to the dead-store
    scratch slot at ``scr_b`` with a clamped 4-byte length, so the hot
    path has no taken branch.  The source is clamped into the buffer on
    both sides BEFORE validation masks the emit — suppressed emits still
    read from ``src`` (a malformed tagCopy4 offset is an arbitrary
    32-bit value).

    When ``emit_long`` (ops/emit_long.make_emit_long) is given, literals
    of >= ``long_t`` bytes redirect the word-emit and go through the
    DMA+rotate emitter instead (2.5-4x the word loop, measured e26e) —
    the TPU analog of the reference's length-specialized fast paths
    (decoder.nim:117-125).  Only literals can be long: every encoder
    splits copies at 64 bytes and the tag LUT caps copy lengths at 64.

    dispatch(pos, w, hdr, is_lit, off, suppress, eff):
      suppress — tag must not emit for real
      eff      — bytes to emit, >= 0, already capped by the caller

    ``handle_near=False`` builds a variant with NO near-copy arm at all
    (not even the untaken branch — ~15 ns per tag on the in-order
    pipeline, e15): callers must route near copies (off < 4) through
    ``suppress`` and resolve them in their cold path.  Near copies are
    <= 0.35% of tags on every corpus class except kppkn (3.6%) and the
    RLE class — whose runs walk keeps the near-capable dispatch for its
    coalesced pattern fills.

    When ``emit_copy_dma`` (an emit_long over the SAME unified buffer) is
    given, coalesced FAR-offset periodic runs of >= ``long_copy_t`` bytes
    redirect to a DMA self-copy: bootstrap ``D - off`` bytes with the
    word loop so a granule-aligned source distance D exists (D = 8192
    for power-of-two offsets <= 8192, D = off for page multiples), then
    granule-copy at distance D — emit_long's direct path pipelines
    granule g's read after granule g-2's write completed, so a D >= 2
    granule self-copy doubles the pattern exactly like the reference's
    scalar pattern loop (decoder.nim:130-144) at DMA rates.  Only the
    runs walks pass this (the alignment test costs ~4 ops per dispatch).
    """

    def dispatch(pos, w, hdr, is_lit, off, suppress, eff):
        if handle_near:
            near = (~is_lit) & (off < 4) & (~suppress)
        else:
            near = jnp.bool_(False)  # near copies arrive suppressed
        if emit_long is not None:
            # hot-path cost: one compare + two ands (the v>=0 guard and
            # the word-loop fallback live inside the rare branch)
            long_lit = is_lit & (eff >= long_t) & (~suppress)
        else:
            long_lit = jnp.bool_(False)
        if emit_copy_dma is not None:
            # far periodic run with a granule-expressible period:
            # divisors of 8192 are exactly the powers of two <= 8192
            d_ok = (((off & (off - 1)) == 0) & (off <= 8192)) | (
                (off & 4095) == 0)
            long_cop = ((~is_lit) & (off >= 4) & (eff >= long_copy_t)
                        & d_ok & (~suppress))
        else:
            long_cop = jnp.bool_(False)
        redirect = suppress | near | long_lit | long_cop
        src = jax.lax.select(is_lit, pos + hdr, out_base_b + w - off)
        src = jnp.clip(src, 0, jnp.int32(4 * (buf_cap_words - 4)))
        dst = jax.lax.select(redirect, jnp.int32(scr_b), out_base_b + w)
        # every redirected emit is a dead store: clamp it to 4 bytes
        # (coalesced near-copy runs make eff arbitrarily large)
        ln_eff = jax.lax.select(redirect, jnp.int32(4), eff)
        carry_ok = is_lit | (off >= 8) | redirect
        emit_mem(dst, ln_eff, src, carry_ok)

        if handle_near:

            @pl.when(near)
            def _():
                if emit_fill is not None:
                    # coalesced near-copy runs (RLE class): offsets 1/2
                    # fill with ONE word value per aligned position (the
                    # byte period divides 4) — VPU broadcast + granule
                    # DMA (ops/emit_long.make_emit_fill) instead of the
                    # 2-words-per-iteration scalar pattern loop.  Cold
                    # branch: only the low-ratio runs walk passes
                    # emit_fill.
                    dst_b = out_base_b + w
                    big = (eff >= long_t) & (off < 3)

                    @pl.when(big)
                    def _():
                        b0 = gbyte(dst_b - off)
                        b1 = gbyte(dst_b - off + (off >> 1))
                        pat1 = b0 * jnp.int32(0x01010101)
                        pat2 = b0 | (b1 << 8) | (b0 << 16) | (b1 << 24)
                        pat2s = b1 | (b0 << 8) | (b1 << 16) | (b0 << 24)
                        s_par = (dst_b - off) & 1
                        wpat = jax.lax.select(
                            off == 1, pat1,
                            jax.lax.select(s_par == 0, pat2, pat2s))
                        emit_fill(dst_b, eff, wpat)

                    @pl.when(~big)
                    def _():
                        do_copy_near(dst_b, off, eff)
                else:
                    do_copy_near(out_base_b + w, off, eff)

        if emit_long is not None:
            @pl.when(long_lit)
            def _():
                emit_long(out_base_b + w, eff, pos + hdr)

        if emit_copy_dma is not None:
            @pl.when(long_cop)
            def _():
                dst_b = out_base_b + w
                # the source at distance D must lie inside the run's own
                # already-written span or its validated original source
                # (out[q] = out[q - off*k] holds for q - D >= dst_b - off)
                D = jnp.maximum(off, jnp.int32(8192))
                pre = jnp.maximum(D - off, 0)
                # word-align the DMA start: head == 0 and phase == 0
                # guarantee emit_long's direct (self-copy-safe) path
                pre = pre + ((-(dst_b + pre)) & 4095)
                # bootstrap bytes are the run pattern too (src dst-off),
                # so the head's 11-byte overshoot writes correct values
                emit_mem(dst_b, pre, dst_b - off, off >= 8)
                emit_copy_dma(dst_b + pre, eff - pre, dst_b + pre - D)

    return dispatch
