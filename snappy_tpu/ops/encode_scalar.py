"""Snappy block encoder on the TPU scalar core (Pallas, SMEM-resident).

The greedy LZ77 matcher is a data-dependent hash-probe walk — the same
workload shape as decoding, and the same measured physics applies (see
ops/decode_scalar.py): the scalar core probes at ~tens of ns while every
vectorized formulation (argsort candidates, one-hot matmuls) loses 10-100x
to serialized gathers or narrow-matmul underutilization.  So the device
encoder runs the reference algorithm (encoder.nim:184-383 semantics,
re-derived from the algorithm spec — greedy matching with the 1/32 skip
heuristic) per chunk on the scalar core, grid-batched over chunks.

Output bytes are IDENTICAL to the reference greedy algorithm (verified
block-by-block against the oracle on the full benchmark corpus, and equal
to the host C encoder at level 1) — stronger than the reference's own
cross-implementation contract (test_snappy.nim:50-53 only requires
cross-decodability).  Achieving that required three exact-parity details:

* unwritten hash-table buckets read as position 0 (the reference's zeroed
  table makes position 0 a legal candidate, encoder.nim:237-238) — the
  table is zeroed per chunk by one VMEM->SMEM DMA (~10 us, overlapped
  with the kernel prologue) — an epoch-tagged variant avoided the
  re-zeroing but cost ~6 ops on every probe (round 4, e30);
* the probe loop checks ip+step against the limit BEFORE probing
  (encoder.nim:311-331) — the kernel suppresses the would-be hit at those
  tail positions, which is emission-equivalent;
* the hash takes the TOP log2(table_size) bits of u*0x1e35a7bd
  (shift = 32 - log2(tsize), encoder.nim:36-37), which only equals a
  fixed >>18 for the full 16 K table.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import emit_long as emit_long_mod

IN_WORDS = 16384  # 65536-byte block
# input slab width: block + slack for the long-literal DMA emitter's
# granule reads (source span rounds out to 4 KiB on both sides)
IN_PAD = 18432    # 18 * 1024
# >= ceil_4k(max_compressed_len(65536) + spill pad): the DMA emitter
# writes whole 4 KiB granules past the stream tail (repaired/ignored)
ENC_WORDS = 20480
TABLE_SIZE = 16384  # max table (2^14 entries, encoder.nim:10-12)
_K_HASH = 0x1E35A7BD
MIN_NON_LITERAL = 17
INPUT_MARGIN = 15


def _kernel(meta_ref, in_ref, enc_ref, elen_ref, table_ref, ztab_ref,
            el_vbuf, el_hbuf, el_sems, el_semh, sem_z, *, ways: int = 1):
    """``ways`` (static) selects the hash-bucket shape: 1 = reference
    greedy (byte-identical to the oracle and host C level 1); 2 = two-entry
    FIFO buckets (the host C ``level=2`` matcher: most-recent candidate
    first, displaced entry kept as a second chance — denser output,
    byte-identical to host C level 2)."""
    n = meta_ref[0, 0, 0]
    # long-literal DMA emitter over the (1, 1, N) block views; the VMEM
    # scratch shares the shape family (Mosaic rejects cross-tiling DMA)
    emit_long = emit_long_mod.make_emit_long(
        in_ref.at[0, 0], enc_ref.at[0, 0],
        el_vbuf.at[0, 0], el_hbuf.at[0, 0], el_sems, el_semh,
        same_ref=False)
    scan_eq = emit_long_mod.make_scan_eq(
        in_ref.at[0, 0], el_vbuf.at[0, 0], el_sems)

    # Per-chunk table clear by ONE VMEM->SMEM DMA from a zero buffer
    # (~10 us, started here and waited just before the probe loop).
    # A zeroed table per chunk IS the reference's semantics directly
    # (encoder.nim:237-238: unwritten bucket = position 0, a legal
    # candidate) — the previous epoch-tagged entries preserved those
    # semantics without re-zeroing but cost ~6 ops on EVERY probe
    # (tag pack/unpack + epoch compare + select on the hot path).
    @pl.when(pl.program_id(0) == 0)
    def _():
        ztab_ref[...] = jnp.zeros((TABLE_SIZE * ways,), jnp.int32)

    zero_cp = pltpu.make_async_copy(ztab_ref, table_ref, sem_z)
    zero_cp.start()

    def _funnel(wa, wb, sh):
        lo = (wa >> sh) & ((jnp.int32(1) << (32 - sh)) - 1)
        return jax.lax.select(sh == 0, wa, lo | (wb << (32 - sh)))

    def load32(p):
        wa = in_ref[0, 0, p >> 2]
        wb = in_ref[0, 0, (p >> 2) + 1]
        return _funnel(wa, wb, (p & 3) * 8)

    # ---- output writers (byte stream into packed words) -------------------
    def pbyte(p, v):
        wi = p >> 2
        sh = (p & 3) * 8
        w = enc_ref[0, 0, wi]
        enc_ref[0, 0, wi] = (w & ~(255 << sh)) | ((v & 255) << sh)

    def pword_u(p, v):
        wi = p >> 2
        sh = (p & 3) * 8
        keep = (jnp.int32(1) << sh) - 1
        lo = enc_ref[0, 0, wi]
        enc_ref[0, 0, wi] = (lo & keep) | (v << sh)
        hi = enc_ref[0, 0, wi + 1]
        spill = (v >> (31 - sh) >> 1) & keep
        enc_ref[0, 0, wi + 1] = (hi & ~keep) | spill

    def bulk_copy(dst0, src0, length):
        """input[src0 .. src0+length) -> enc[dst0 ..); fused 8-byte head
        plus carried-word loops (one source load per output word — the
        source and destination refs are disjoint, so the carry is always
        safe); spills <= 11 bytes past the end, repaired by later writes
        (the stream is written strictly left to right)."""
        sh_d = (dst0 & 3) * 8
        keep_d = (jnp.int32(1) << sh_d) - 1
        wi = dst0 >> 2
        sw = src0 >> 2
        sh_s = (src0 & 3) * 8
        mm_s = (jnp.int32(1) << (32 - sh_s)) - 1

        def gsrc(o):
            wa = in_ref[0, 0, sw + (o >> 2)]
            wb = in_ref[0, 0, sw + (o >> 2) + 1]
            return jax.lax.select(
                sh_s == 0, wa, ((wa >> sh_s) & mm_s) | (wb << (32 - sh_s))
            )

        v0 = gsrc(jnp.int32(0))
        lo = enc_ref[0, 0, wi]
        enc_ref[0, 0, wi] = (lo & keep_d) | (v0 << sh_d)
        sp0 = (v0 >> (31 - sh_d) >> 1) & keep_d
        v1 = gsrc(jnp.int32(4))
        enc_ref[0, 0, wi + 1] = sp0 | (v1 << sh_d)
        enc_ref[0, 0, wi + 2] = (v1 >> (31 - sh_d) >> 1) & keep_d

        @pl.when(length > 8)
        def _():
            # >= LONG_T payloads (whole-block literals on incompressible
            # data, pdf-style long literals) ride the DMA+rotate emitter.
            # The check lives INSIDE the >8 branch and reuses the two
            # existing pl.when arms, so short literals (<= 8, the text
            # majority) see zero extra branches — a per-literal pl.when
            # pair measured -4..-7% on text encode (branches cost ~15 ns
            # on the in-order scalar pipeline, e15).
            long = length >= emit_long_mod.LONG_T
            o0 = (((dst0 + 8) >> 2) << 2) - dst0  # aligned restart, [5, 8]
            rem = length - o0
            wi0 = (dst0 + o0) >> 2
            s0 = src0 + o0
            sw2 = s0 >> 2
            sh2 = (s0 & 3) * 8
            mm2 = (jnp.int32(1) << (32 - sh2)) - 1

            @pl.when((~long) & (sh2 == 0))
            def _():
                def body(st):
                    k, wo, si = st
                    enc_ref[0, 0, wo] = in_ref[0, 0, si]
                    enc_ref[0, 0, wo + 1] = in_ref[0, 0, si + 1]
                    return k + 8, wo + 2, si + 2

                jax.lax.while_loop(
                    lambda st: st[0] < rem, body, (jnp.int32(0), wi0, sw2)
                )

            @pl.when((~long) & (sh2 != 0))
            def _():
                def body(st):
                    k, wo, si, carry = st
                    wa = in_ref[0, 0, si]
                    enc_ref[0, 0, wo] = (
                        ((carry >> sh2) & mm2) | (wa << (32 - sh2))
                    )
                    wb = in_ref[0, 0, si + 1]
                    enc_ref[0, 0, wo + 1] = (
                        ((wa >> sh2) & mm2) | (wb << (32 - sh2))
                    )
                    return k + 8, wo + 2, si + 2, wb

                jax.lax.while_loop(
                    lambda st: st[0] < rem,
                    body,
                    (jnp.int32(0), wi0, sw2 + 1, in_ref[0, 0, sw2]),
                )

            @pl.when(long)
            def _():
                # the 8-byte head above already wrote [dst0, dst0+8);
                # the emitter rewrites the whole span (same bytes)
                emit_long(dst0, length, src0)

    def emit_literal(op, src0, length):
        """Literal tag + payload (encoder.nim:44-79).  Returns new op.

        Branchless tag: one unaligned word store covers all three tag
        sizes; garbage bytes past ntag are repaired by the payload that
        always follows at op+ntag <= op+3."""
        lm1 = length - 1
        big = lm1 >= 60
        big2 = lm1 >= 256
        ntag = 1 + jax.lax.select(big, 1, 0) + jax.lax.select(big2, 1, 0)
        tagw = jax.lax.select(
            big2,
            (61 << 2) | ((lm1 & 255) << 8) | (((lm1 >> 8) & 255) << 16),
            jax.lax.select(big, (60 << 2) | (lm1 << 8), lm1 << 2),
        )
        pword_u(op, tagw)
        bulk_copy(op + ntag, src0, length)
        return op + ntag + length

    def emit_copy(op, offset, length):
        """Copy ops with the reference's 68/64/60 splitting
        (encoder.nim:81-125).  Returns new op.

        The max-length tag run of a long match is a 3-byte pattern
        (0xFE, off_lo, off_hi) repeating: runs of >= 8 tags emit 4 tags
        per 3 aligned word stores instead of 3 read-modify-write byte
        stores per tag (round 4; the symmetric trick to the decoder's
        pattern fill).  Short matches see exactly one branch here, the
        same count as the old `while rem >= 68` loop's entry check."""

        def emit_64s(s):
            op_, rem = s
            k64 = (rem - 4) >> 6  # tag count; equals the old loop's trips
            lo = offset & 255
            hi = (offset >> 8) & 255

            def scalar_tags(a):
                op2, k = a

                def body(st):
                    o, j = st
                    pbyte(o, 0xFE)
                    pbyte(o + 1, lo)
                    pbyte(o + 2, hi)
                    return o + 3, j - 1

                o2, _ = jax.lax.while_loop(
                    lambda st: st[1] > 0, body, (op2, k))
                return o2

            def pattern_tags(a):
                op2, k = a
                nb = 3 * k
                # word with byte j = pat[(r + j) % 3], pat = (FE, lo, hi)
                t0 = jnp.int32(0xFE)

                def wrd(b0, b1, b2):
                    return b0 | (b1 << 8) | (b2 << 16) | (b0 << 24)

                W0 = wrd(t0, lo, hi)
                W1 = wrd(lo, hi, t0)
                W2 = wrd(hi, t0, lo)
                # head: two unaligned stores with the op2-phase pattern
                pword_u(op2, W0)
                pword_u(op2 + 4, W1)
                # aligned restart; (q0 - op2) in [5, 8] -> phase r0
                q0 = (((op2 + 8) >> 2) << 2)
                d = q0 - op2
                r0 = jax.lax.select(
                    d == 5, jnp.int32(2),
                    jax.lax.select(d == 6, jnp.int32(0),
                                   jax.lax.select(d == 7, jnp.int32(1),
                                                  jnp.int32(2))))
                Wa = jax.lax.select(
                    r0 == 0, W0, jax.lax.select(r0 == 1, W1, W2))
                Wb = jax.lax.select(
                    r0 == 0, W1, jax.lax.select(r0 == 1, W2, W0))
                Wc = jax.lax.select(
                    r0 == 0, W2, jax.lax.select(r0 == 1, W0, W1))
                end = op2 + nb

                def body(st):
                    q, c = st
                    wi = q >> 2
                    enc_ref[0, 0, wi] = Wa
                    enc_ref[0, 0, wi + 1] = Wb
                    enc_ref[0, 0, wi + 2] = Wc
                    return q + 12, c

                # spills <= 11 B past `end`; the next tag (which always
                # follows at `end`) rewrites them
                jax.lax.while_loop(
                    lambda st: st[0] < end, body, (q0, jnp.int32(0)))
                return op2 + nb

            op2 = jax.lax.cond(k64 >= 8, pattern_tags, scalar_tags,
                               (op_, k64))
            rem2 = rem - 64 * k64

            # 61-64 tail avoidance (encoder.nim:83-93): a 65-67 remainder
            # would encode as 3+3 bytes; emit len 60 first.  Nested here
            # so copies < 65 bytes — the overwhelming majority — pay ONE
            # branch for the whole long-copy machinery.
            def emit60(s):
                op_, rem_ = s
                pbyte(op_, (59 << 2) | 2)  # len 60
                pbyte(op_ + 1, offset & 255)
                pbyte(op_ + 2, (offset >> 8) & 255)
                return op_ + 3, rem_ - 60

            return jax.lax.cond(
                rem2 > 64, emit60, lambda s: s, (op2, rem2))

        op, rem = jax.lax.cond(
            length >= 65, emit_64s, lambda s: s, (op, length))

        use1 = (rem < 12) & (offset < 2048)
        # branchless 2-3 byte tag via one unaligned word store: later
        # writes always start at op+2 or op+3 and repair the spill (the
        # stream tail past the final op is never part of the output)
        tag1 = (
            1 | ((rem - 4) << 2) | ((offset >> 8) << 5) | ((offset & 255) << 8)
        )
        tag2 = (
            2 | ((rem - 1) << 2) | ((offset & 255) << 8)
            | ((offset & 0xFF00) << 8)
        )
        pword_u(op, jax.lax.select(use1, tag1, tag2))
        return op + jax.lax.select(use1, 2, 3)

    def table_get_put(h, pos):
        # The table is zeroed per chunk (DMA above), so an unwritten
        # bucket reads as position 0 — exactly the reference's zeroed
        # table (encoder.nim:237-238): a probe against a never-written
        # bucket legitimately compares with (and can match) the block's
        # first bytes.
        e = table_ref[h]
        table_ref[h] = pos
        return e

    def table_probe_put(h, pos, u):
        """Probe + insert; returns (match, candidate).  ways=2 keeps a
        two-entry FIFO per bucket: inserting shifts the previous entry to
        the second slot, and a double hit prefers the most-recent
        candidate — exact host C level-2 semantics (encode_block_impl)."""
        if ways == 1:
            c = table_get_put(h, pos)
            return load32(c) == u, c
        c1 = table_ref[2 * h]
        c2 = table_ref[2 * h + 1]
        table_ref[2 * h + 1] = c1
        table_ref[2 * h] = pos
        m1 = load32(c1) == u
        match = m1 | (load32(c2) == u)
        return match, jax.lax.select(m1, c1, c2)

    def table_put_shift(h, pos):
        """Insert-only (the chain loop's prev-position insert)."""
        if ways == 1:
            table_ref[h] = pos
        else:
            table_ref[2 * h + 1] = table_ref[2 * h]
            table_ref[2 * h] = pos

    def _tail_bytes(x):
        """Matching low bytes of a word-pair XOR (0..4)."""
        return (
            jax.lax.select((x & 255) == 0, 1, 0)
            + jax.lax.select((x & 0xFFFF) == 0, 1, 0)
            + jax.lax.select((x & 0xFFFFFF) == 0, 1, 0)
            + jax.lax.select(x == 0, 1, 0)
        )

    def match_len(c, s):
        """Length of the common prefix of input[c..] / input[s..] capped
        at n (findMatchLength analog).

        The generic loop: carried word loads (2 per iteration instead of
        4 — both cursors advance by 4 so each stream re-uses its previous
        high word) and a branchless byte tail counted from the XOR of the
        final word pair.  Loops may compare words straddling n (padding
        is zero-filled; the final clip caps any spurious padding match),
        so full reference match lengths survive without a byte-tail loop.

        Long matches (>= ~60 B — the RLE / periodic / structured-data
        classes; text matches average 4-16 B and never reach this) leave
        the generic 4-byte/iter funnel loop for one of two 16-byte/iter
        continuations selected by the offset (round 4, e30):
          * phase-aligned (off % 4 == 0): raw word compares, no funnels —
            byte phase cancels between the streams;
          * periodic (off in {1, 2}): the matched region repeats with a
            word period dividing 4, so every aligned word must equal ONE
            register constant (the same insight as the decoder's pattern
            fill).
        Other offsets resume the generic loop.  The mode switch costs the
        generic loop nothing: the first loop's iteration cap is folded
        into its (hoisted) bound check, and the switch sits behind a
        branch only taken when the cap was reached.
        """
        sh_c = (c & 3) * 8
        mc = (jnp.int32(1) << (32 - sh_c)) - 1
        cw = c >> 2
        sh_s = (s & 3) * 8
        ms = (jnp.int32(1) << (32 - sh_s)) - 1
        sw = s >> 2
        # hoisted generic-loop bound: continue while k <= kmax
        # (identical to the original `s + 4*k + 8 <= n + 4`)
        kmax = (n - 4 - s) >> 2
        kstop1 = jnp.minimum(kmax, jnp.int32(14))

        def gen_body(kstop):
            def body(state):
                k, cc, cs, go, x = state
                nc = in_ref[0, 0, cw + k + 1]
                ns = in_ref[0, 0, sw + k + 1]
                vc = jax.lax.select(
                    sh_c == 0, cc, ((cc >> sh_c) & mc) | (nc << (32 - sh_c))
                )
                vs = jax.lax.select(
                    sh_s == 0, cs, ((cs >> sh_s) & ms) | (ns << (32 - sh_s))
                )
                x2 = vc ^ vs
                go2 = (x2 == 0) & (k <= kstop)
                return k + 1, nc, ns, go2, x2

            return body

        k, cc, cs, _, x = jax.lax.while_loop(
            lambda state: state[3],
            gen_body(kstop1),
            (
                jnp.int32(0),
                in_ref[0, 0, cw],
                in_ref[0, 0, sw],
                jnp.bool_(True),
                jnp.int32(0),
            ),
        )
        cont = (x == 0) & (kmax > kstop1)

        def finish_short(_):
            # words 0..k-2 matched fully; word k-1 supplies the tail via x
            return 4 * (k - 1) + _tail_bytes(x)

        def go_long(_):
            """Continuation past 60 confirmed bytes (k == 15 here: the
            cap is only reachable when kmax > 14).  All three modes scan
            from word index base+15, whose start byte is <= c+60 /
            s+60 — inside the confirmed region, so there is no gap."""

            def scan32(qc, qs, use_w, W, qend=None):
                """32-byte/iter scan; compares in[qc+j]^in[qs+j] (mode A,
                use_w=False) or in[qs+j]^W (mode B).  Returns the first
                mismatch byte's absolute S-SIDE offset, or n (bound
                exit).  With ``qend`` (a word index), the scan may also
                stop once its group start reaches qend — callers using
                it must treat any return >= 4*qend as "no mismatch
                found below 4*qend" and continue by other means."""
                # hoisted bound: j <= jlim  <=>  4*(qs+j+8) < n+4
                # (LHS divisible by 4, so 4a < b+1 <=> a <= b>>2 for
                # b = n+3)
                jlim = ((n + 3) >> 2) - qs - 8
                if qend is not None:
                    jlim = jnp.minimum(jlim, qend - qs - 8)

                def xw_at(j, i):
                    if use_w:
                        return in_ref[0, 0, qs + j + i] ^ W
                    return in_ref[0, 0, qc + j + i] ^ in_ref[0, 0, qs + j + i]

                def body(st):
                    j = st[0]
                    b = [xw_at(j, i) for i in range(8)]
                    z = ((b[0] | b[1]) | (b[2] | b[3])) | (
                        (b[4] | b[5]) | (b[6] | b[7]))
                    go2 = (z == 0) & (j <= jlim)
                    return (j + 8, go2) + tuple(b)

                st = jax.lax.while_loop(
                    lambda st: st[1],
                    body,
                    (jnp.int32(0), jnp.bool_(True)) + (jnp.int32(0),) * 8,
                )
                j, a = st[0], st[2:]
                jl = j - 8  # group that ended the loop
                allz = (((a[0] | a[1]) | (a[2] | a[3]))
                        | ((a[4] | a[5]) | (a[6] | a[7]))) == 0
                idx = jnp.int32(7)
                xw = a[7]
                for i in range(6, -1, -1):
                    idx = jax.lax.select(a[i] != 0, jnp.int32(i), idx)
                    xw = jax.lax.select(a[i] != 0, a[i], xw)
                mis = 4 * (qs + jl + idx) + _tail_bytes(
                    jax.lax.select(allz, jnp.int32(1), xw))
                return jax.lax.select(allz, n, mis)

            def mode_aligned(_):
                # byte phase cancels (c % 4 == s % 4): raw words at equal
                # indices-from-base compare the same stream-relative
                # spans.  Offsets dividing 4096 (period | page: 8, 16,
                # ..., 4096 — the page/record-duplicate class) extend
                # the mode-B granule handoff: granule content repeats
                # every granule, so the VPU compares each against a
                # reference granule taken from the already-confirmed
                # region (emit_long scan_eq.tile).
                gA = ((sw + 15) >> 10) + 2
                tile1 = (4096 % off) == 0      # period divides a granule
                tile2 = (off & 4095) == 0      # offset = whole granules
                tile_ok = tile1 | tile2
                qend = jax.lax.select(tile_ok, 1024 * gA,
                                      jnp.int32(0x7FFFFFF))
                mis = scan32(cw + 15, sw + 15, False, jnp.int32(0),
                             qend=qend)

                def short(_):
                    return mis - s

                def granules(_):
                    glim = n >> 12
                    gbad = jax.lax.cond(
                        tile1,
                        lambda _: scan_eq.tile(gA, glim, gA - 1),
                        lambda _: scan_eq.pair(gA, glim, off >> 12), 0)
                    qr = jnp.maximum(1024 * gbad, sw + 15)
                    return scan32(qr - (off >> 2), qr, False,
                                  jnp.int32(0)) - s

                return jax.lax.cond(
                    tile_ok & (mis >= 4096 * gA), granules, short, 0)

            def mode_pattern(_):
                # word period divides 4: every aligned word in the run
                # equals in[sw+13] (fully inside the confirmed 60 bytes).
                # The scalar core covers the gap up to a 4 KiB granule
                # boundary plus one granule; multi-KiB runs then hand the
                # compare to DMA granules + the VPU (emit_long.
                # make_scan_eq) and the scalar core only re-scans the one
                # mismatching granule — the RLE/zero-page encode class.
                W = in_ref[0, 0, sw + 13]
                gA = ((sw + 14) >> 10) + 2   # first DMA granule
                mis = scan32(jnp.int32(0), sw + 14, True, W,
                             qend=1024 * gA)

                def short(_):
                    return mis - s

                def granules(_):
                    glim = n >> 12           # full granules below n
                    gbad = scan_eq(gA, glim, W)
                    # scalar refine inside the bad granule (or the tail
                    # past the last full granule); max() guards the
                    # degenerate glim < gA case where nothing was
                    # DMA-scanned and the refine must not start below
                    # the unconfirmed region
                    qr = jnp.maximum(1024 * gbad, sw + 14)
                    return scan32(jnp.int32(0), qr, True, W) - s

                # a mismatch found before the first DMA granule is exact;
                # qend bound-exits (mis >= 4096*gA, incl. the n-bound
                # sentinel) continue on the granule path
                return jax.lax.cond(mis < 4096 * gA, short, granules, 0)

            def mode_generic(_):
                k2, _, _, _, x2 = jax.lax.while_loop(
                    lambda state: state[3],
                    gen_body(kmax),
                    (k, cc, cs, jnp.bool_(True), jnp.int32(0)),
                )
                return 4 * (k2 - 1) + _tail_bytes(x2)

            off = s - c
            which = jax.lax.select(
                (off & 3) == 0, jnp.int32(0),
                jax.lax.select(off <= 2, jnp.int32(1), jnp.int32(2)))
            return jax.lax.switch(
                which, [mode_aligned, mode_pattern, mode_generic], 0)

        res = jax.lax.cond(cont, go_long, finish_short, 0)
        return jnp.clip(res, 0, n - s)

    # table mask per the reference's input-dependent sizing
    # (encoder.nim:27-34): smallest power of two in [256, 16384] >= n.
    # The hash takes the TOP log2(tsize) bits of u*K (reference shift =
    # 32 - log2(tsize)); the arithmetic >> plus mask extracts exactly
    # those bits.
    def ts_body(st):
        ts, sh = st
        return ts * 2, sh - 1

    tsize, shift = jax.lax.while_loop(
        lambda st: (st[0] < TABLE_SIZE) & (st[0] < n),
        ts_body,
        (jnp.int32(256), jnp.int32(24)),
    )
    mask = tsize - 1

    def hash32(u, mask):
        return ((u * jnp.int32(_K_HASH)) >> shift) & mask

    ip_limit = n - INPUT_MARGIN

    # Nested loops mirroring the reference's structure (encoder.nim:255-381)
    # — measured faster than a flattened phase-switch loop: the FAST probe
    # loop carries only 4 values and pays no phase dispatch per probe
    # (same two-tier insight as the grid decoder's fast/slow tag loop).
    def probe_body(s):
        ip, skip, cand, hit, go = s
        bbh = skip >> 5
        u = load32(ip)
        h = hash32(u, mask)
        match, c = table_probe_put(h, ip, u)
        # The reference checks ip+step BEFORE probing and bails to the
        # remainder literal without probing (encoder.nim:311-331 / the
        # oracle's next_s > s_limit return); suppressing the hit here is
        # emission-equivalent — the stray table write is never read again
        # (the block ends immediately).
        #
        # The bound check is computed ONCE and folded into both the hit
        # suppression and the carried loop predicate: on a miss the loop
        # condition would re-test exactly `ip + bbh <= ip_limit`, so
        # carrying `go = inb & ~match` drops the duplicate compare plus
        # the ~hit/& pair from the condition (round 5 A/B: e36).
        nip = ip + bbh
        inb = nip <= ip_limit
        hit2 = match & inb
        ip2 = jax.lax.select(hit2, ip, nip)
        return ip2, skip + bbh, c, hit2, inb & (~match)

    def outer_body(st):
        ip, next_emit, op, done = st
        # probe until a match or until the next probe would cross ip_limit
        # (the skip heuristic: after 32 probes without a match, step 2
        # bytes, then 3, ... — encoder.nim:256-270)
        ip, _, cand, hit, _ = jax.lax.while_loop(
            lambda p: p[4],
            probe_body,
            (ip, jnp.int32(32), jnp.int32(0), jnp.bool_(False),
             ip <= ip_limit),
        )

        def on_hit(a):
            ip, next_emit, op = a
            op = jax.lax.cond(
                ip > next_emit,
                lambda o: emit_literal(o, next_emit, ip - next_emit),
                lambda o: o,
                op,
            )

            # copy-chain loop: emit copies back to back while the position
            # right after each copy is itself a table hit
            def chain_body(cs):
                ip_, op_, cand_, go = cs
                ml = 4 + match_len(cand_ + 4, ip_ + 4)
                op2 = emit_copy(op_, ip_ - cand_, ml)
                ip2 = ip_ + ml
                over = ip2 > ip_limit

                # unconditional probe (the `over` cond cost ~15 ns per
                # copy): when over, the chunk is about to end — the two
                # stray table writes are never read again (the table is
                # re-zeroed per chunk) and the loads stay in the padded
                # slab, so only the hit needs masking
                h1 = hash32(load32(ip2 - 1), mask)
                table_put_shift(h1, ip2 - 1)
                u = load32(ip2)
                h = hash32(u, mask)
                m, c2 = table_probe_put(h, ip2, u)
                hit2 = m & (~over)
                return ip2, op2, c2, hit2

            ip2, op2, _, _ = jax.lax.while_loop(
                lambda cs: cs[3], chain_body, (ip, op, cand, jnp.bool_(True))
            )
            over = ip2 > ip_limit
            # resume probing at ip2+1 (probing at ip2 itself would
            # self-match the entry the chain probe just inserted and emit
            # an illegal offset-0 copy); next_emit = ip2
            return (
                ip2 + 1,
                ip2,
                op2,
                jax.lax.select(over, 1, 0),
            )

        return jax.lax.cond(
            hit,
            on_hit,
            lambda a: (a[0], a[1], a[2], jnp.int32(1)),
            (ip, next_emit, op),
        )

    def run_main(op0):
        st = (
            jnp.int32(1),  # ip (reference starts matching at 1)
            jnp.int32(0),  # next_emit
            op0,
            jnp.int32(0),  # done
        )
        ip, next_emit, op, done = jax.lax.while_loop(
            lambda s: s[3] == 0, outer_body, st
        )
        # remainder literal
        op = jax.lax.cond(
            next_emit < n,
            lambda o: emit_literal(o, next_emit, n - next_emit),
            lambda o: o,
            op,
        )
        return op

    zero_cp.wait()
    op_final = jax.lax.cond(
        n < MIN_NON_LITERAL,
        lambda _: jax.lax.cond(
            n > 0, lambda o: emit_literal(o, 0, n), lambda o: o, jnp.int32(0)
        ),
        run_main,
        jnp.int32(0),
    )
    elen_ref[0, 0, 0] = op_final


def _call(meta, in_words, nb: int, interpret: bool, ways: int = 1):
    return pl.pallas_call(
        functools.partial(_kernel, ways=ways),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, 1, IN_PAD), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, 1, ENC_WORDS), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb, 1, ENC_WORDS), jnp.int32),
            jax.ShapeDtypeStruct((nb, 1, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.SMEM((TABLE_SIZE * ways,), jnp.int32),
            pltpu.VMEM((TABLE_SIZE * ways,), jnp.int32),
            pltpu.VMEM((1, 1, emit_long_mod.VB_WORDS), jnp.int32),
            pltpu.VMEM((1, 1, emit_long_mod.HB_WORDS), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(meta, in_words)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _encode_blocks_words_jit(meta, in_words, nb: int, interpret: bool,
                             ways: int):
    return _call(meta, in_words, nb, interpret, ways)


def encode_blocks_words(meta, in_words, nb: int, interpret=None,
                        level: int = 1):
    """Encode ``nb`` independent <= 64 KiB blocks to raw tag streams.

    meta: int32 [nb, 1, 1] — block length per chunk
    in_words: int32 [nb, 1, IN_PAD] — packed LE bytes, zero-padded
    level: 1 = reference greedy (byte-identical to the oracle / host C
    level 1); 2 = two-way buckets (byte-identical to host C level 2).
    Returns (enc_words [nb, 1, ENC_WORDS], enc_len [nb, 1, 1]).
    """
    if interpret is None:
        from . import decode_scalar

        interpret = decode_scalar._forced_interpret()
    return _encode_blocks_words_jit(
        meta, in_words, nb, bool(interpret), 2 if level >= 2 else 1
    )


def pack_blocks(blocks):
    """Pack byte blocks into the kernel layout."""
    nb = len(blocks)
    arr = np.zeros((nb, 1, 4 * IN_PAD), dtype=np.uint8)
    meta = np.zeros((nb, 1, 1), dtype=np.int32)
    for k, b in enumerate(blocks):
        a = np.frombuffer(b, dtype=np.uint8)
        arr[k, 0, : len(a)] = a
        meta[k, 0, 0] = len(a)
    return meta, arr.view(np.int32)


def unpack_enc(enc_words: np.ndarray, enc_lens) -> list:
    view = np.ascontiguousarray(enc_words).view(np.uint8)
    return [
        view[k, 0, : int(enc_lens[k])].tobytes() for k in range(enc_words.shape[0])
    ]
