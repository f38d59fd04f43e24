"""Long-segment DMA emitter for the scalar-core kernels.

The scalar word loop moves ~0.8 GB/s (5 ns/word, measured e26).  Long
Snappy segments — whole-block literals on incompressible data
(fireworks.jpeg: one literal per 64 KiB block), the >= 8 KiB literals
that make up 81% of paper-100k.pdf — don't need the scalar core at all:
the DMA engines move 4 KiB granules at ~7.5 GB/s and the VPU fixes the
byte phase with a dynamic rotate at ~7 GB/s (measured e26/e26c/e26e).
This is the TPU answer to the reference decoder's length-specialized
fast paths (decoder.nim:117-125 does the same specialization with
scalar 8-byte copies).

Hardware facts that shape the design (experiments/e26*, on-chip v5e):

* Mosaic DMA slices of a 1D SMEM buffer must be 4 KiB-aligned in BOTH
  offset and size, and sizes must be static -> move data in fixed
  1024-word granules with a dynamic granule count (depth-2 pipelined).
* Cross-shape DMA is illegal and 2D SMEM indexing costs +4 ns per
  scalar access -> the unified buffer stays 1D; the VPU rotate runs in
  a 1D VMEM bounce buffer reshaped (B//128, 128) per static bucket.
* `pltpu.roll` accepts dynamic shifts; a flat byte-rotate of a 64 KiB
  tile costs ~9 us (7.2 GB/s) as two row/lane roll pairs + byte funnel.

Emit contract (same clobber discipline as scalar_emit.emit_mem):
bytes in [dst, dst+length) get buf[src:src+length]; bytes below dst are
preserved (head merge + one scalar boundary-word fix); bytes in
(dst+length, align4k(dst)+4096*ceil(...)) — i.e. up to 4 KiB past the
segment end — are clobbered with unspecified values and must be at
positions >= the caller's running cursor (later segments repair them).

Caller guarantees:
  * length >= 1 (profitable from ~2 KiB; decode uses LONG_T)
  * src - (dst & 4095) >= 0                      (else: word loop)
  * the read span  [align4k(src - dst%4096), +4096*gs) stays in-buffer
  * the write span [align4k(dst), +4096*gl) stays in-buffer
  * read and write spans are disjoint (literals: src in the comp
    region; far copies: offset >= span length)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_I32 = jnp.int32

G = 1024                      # DMA granule, words (4 KiB)
# Rotate tiles must have POWER-OF-TWO row counts: dynamic pltpu.roll
# miscompiles (silently wrong bytes) on non-power-of-two sublane counts
# (measured: 160 rows wrong, 16/64/128/256 right — experiments/e26e).
VB_WORDS = 32768              # VMEM bounce capacity (128 KiB, 256 rows)
HB_WORDS = G                  # head-merge buffer
ROT_BUCKETS = (2048, 8192, VB_WORDS)   # static rotate sizes (words)
LONG_T = 4096                 # decode threshold, bytes (e26e: >=1.5x above 2K)
# Write slack the caller's buffer needs past the last legal segment end.
SLACK_WORDS = G


def scratch_shapes():
    """Scratch entries to append to a kernel's scratch_shapes."""
    return [
        pltpu.VMEM((VB_WORDS,), jnp.int32),
        pltpu.VMEM((HB_WORDS,), jnp.int32),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA,
    ]


def _flat_rotate_words(T, w):
    """R.flat[i] = T.flat[(i+w) % N] for 2D T, dynamic w in [0, N)."""
    rows = w // 128
    lanes = w % 128
    a = pltpu.roll(T, -rows, axis=0)
    b = pltpu.roll(T, -(rows + 1), axis=0)
    ra = pltpu.roll(a, -lanes, axis=1)
    rb = pltpu.roll(b, -lanes, axis=1)
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, T.shape, 1)
    return jnp.where(lane_idx < 128 - lanes, ra, rb)


def _flat_rotate_one(R):
    """Rn.flat[i] = R.flat[i+1] (static shifts — cheap).  Static rolls
    must use the positive equivalent N-1 of shift -1."""
    rows = R.shape[0]
    ra = pltpu.roll(R, 127, axis=1)
    rb = pltpu.roll(pltpu.roll(R, rows - 1, axis=0), 127, axis=1)
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, R.shape, 1)
    return jnp.where(lane_idx < 127, ra, rb)


def _rotate_bytes_2d(T, byte_shift):
    """Left-rotate the flat little-endian byte stream of 2D int32 tile T
    by `byte_shift` bytes (dynamic, >= 0)."""
    w = byte_shift >> 2
    r = byte_shift & 3
    R = _flat_rotate_words(T, w)
    Rn = _flat_rotate_one(R)       # = flat rotate by w+1, derived cheaply
    Tu = pltpu.bitcast(R, jnp.uint32)
    Nu = pltpu.bitcast(Rn, jnp.uint32)
    sh = (8 * r).astype(jnp.uint32)
    out = jax.lax.select(
        r == 0, Tu, (Tu >> sh) | (Nu << (jnp.uint32(32) - sh)))
    return pltpu.bitcast(out, jnp.int32)


def make_emit_long(src_ref, dst_ref, vbuf_ref, hbuf_ref, sems, sem_h,
                   same_ref: bool = True):
    """Build emit_long(dst_b, length, src_b): copy ``length`` bytes
    src_ref[src_b:] -> dst_ref[dst_b:] (byte offsets into each ref).

    src_ref and dst_ref may be the same buffer (the decoders' unified
    SMEM buffer, same_ref=True) or two disjoint buffers (the encoder's
    input and output refs, same_ref=False — the direct path then needs
    no span-distance guard).  The refs may be 1D or ``ref.at[0, 0]``
    views of (1, 1, N) BlockSpec refs — the VMEM/head scratch must come
    from the SAME shape family or Mosaic rejects the DMA with a 1D-tile
    tiling mismatch (measured).

    ``v = src_b - (dst_b % 4096)`` may be NEGATIVE (a long literal right
    after the stream head, e.g. a whole-block literal whose payload
    starts at byte <= 4): the source window is then clamped to offset 0
    and the rotate amount wraps modulo the bucket — the wrapped bytes
    land only at positions below ``head``, which the head merge
    overwrites.  See the module docstring for the full contract."""

    def emit_long(dst_b, length, src_b):
        d0w = pl.multiple_of((dst_b >> 2) & ~1023, G)
        head = dst_b - 4 * d0w              # bytes to preserve, 0..4095
        v = src_b - head                    # virtual src byte for d0w*4
        # clamp the source window to the buffer: phase in [-4095, 4095],
        # negative only when v < 0 (handled by the modular rotate)
        s0w = pl.multiple_of(jnp.maximum((v >> 2) & ~1023, 0), G)
        phase = v - 4 * s0w                 # rotate amount, bytes
        lbytes = head + length
        gl = (lbytes + 4095) >> 12          # write granules
        gs = (phase + lbytes + 4095) >> 12  # read granules
        # The direct path's depth-2 pipelining lets granule g's read
        # overlap granule g-1's in-flight write: within one buffer the
        # spans must be at least 2 granules apart (else take the always-
        # safe rotate path, whose reads all complete before its first
        # write).
        direct = (phase == 0) & (head == 0)
        if same_ref:
            direct = direct & (d0w - s0w >= 2 * G)

        @pl.when(direct)
        def _():
            # src and dst are both 4 KiB-aligned: straight SMEM->SMEM.
            def dd(g, slot):
                return pltpu.make_async_copy(
                    src_ref.at[pl.ds(pl.multiple_of(s0w + g * G, G), G)],
                    dst_ref.at[pl.ds(pl.multiple_of(d0w + g * G, G), G)],
                    sems.at[slot])

            dd(jnp.int32(0), 0).start()

            def body(g, c):
                dd(g, g & 1).start()
                dd(g - 1, (g - 1) & 1).wait()
                return c

            jax.lax.fori_loop(1, gl, body, jnp.int32(0))
            dd(gl - 1, (gl - 1) & 1).wait()

        @pl.when(~direct)
        def _():
            # dst head region -> VMEM for the merge
            cp_h = pltpu.make_async_copy(
                dst_ref.at[pl.ds(d0w, G)], hbuf_ref.at[pl.ds(0, G)], sem_h)
            cp_h.start()
            # pre-read the boundary word the write-back will clobber
            wb_lo = dst_b >> 2
            keep_lo = (_I32(1) << ((dst_b & 3) * 8)) - 1
            old_lo = dst_ref[wb_lo]

            # inbound granules, depth-2 pipelined on the 2-sem ring
            def in_dma(g, slot):
                return pltpu.make_async_copy(
                    src_ref.at[pl.ds(pl.multiple_of(s0w + g * G, G), G)],
                    vbuf_ref.at[pl.ds(pl.multiple_of(g * G, G), G)],
                    sems.at[slot])

            in_dma(jnp.int32(0), 0).start()

            def in_body(g, c):
                in_dma(g, g & 1).start()
                in_dma(g - 1, (g - 1) & 1).wait()
                return c

            jax.lax.fori_loop(1, gs, in_body, jnp.int32(0))
            in_dma(gs - 1, (gs - 1) & 1).wait()
            cp_h.wait()

            # bucketed rotate + head merge (static shapes per bucket)
            hw = head >> 2

            def do_bucket(bwords):
                def body():
                    T = vbuf_ref[pl.ds(0, bwords)].reshape(
                        bwords // 128, 128)
                    # negative phase (v < 0) wraps modulo the bucket; the
                    # wrapped bytes all land below `head` and are merged
                    # away
                    ph = jax.lax.select(
                        phase < 0, phase + 4 * bwords, phase)
                    R = _rotate_bytes_2d(T, ph)
                    iota = (jax.lax.broadcasted_iota(
                        jnp.int32, (8, 128), 0) * 128
                        + jax.lax.broadcasted_iota(
                            jnp.int32, (8, 128), 1))
                    H = hbuf_ref[pl.ds(0, G)].reshape(8, 128)
                    merged = jnp.where(iota < hw, H, R[:8, :])
                    vbuf_ref[pl.ds(0, bwords)] = R.reshape(bwords)
                    vbuf_ref[pl.ds(0, G)] = merged.reshape(G)
                return body

            need = gs * G
            idx = jnp.int32(0)
            for b in ROT_BUCKETS[:-1]:
                idx = idx + (need > b).astype(jnp.int32)
            jax.lax.switch(idx, [do_bucket(b) for b in ROT_BUCKETS])

            # outbound granules, depth-2 pipelined
            def out_dma(g, slot):
                return pltpu.make_async_copy(
                    vbuf_ref.at[pl.ds(pl.multiple_of(g * G, G), G)],
                    dst_ref.at[pl.ds(pl.multiple_of(d0w + g * G, G), G)],
                    sems.at[slot])

            out_dma(jnp.int32(0), 0).start()

            def out_body(g, c):
                out_dma(g, g & 1).start()
                out_dma(g - 1, (g - 1) & 1).wait()
                return c

            jax.lax.fori_loop(1, gl, out_body, jnp.int32(0))
            out_dma(gl - 1, (gl - 1) & 1).wait()

            # scalar boundary fix: restore bytes below dst_b in its word
            new_lo = dst_ref[wb_lo]
            dst_ref[wb_lo] = (old_lo & keep_lo) | (new_lo & ~keep_lo)

    return emit_long


def make_scan_eq(src_ref, vbuf_ref, sems):
    """Build scan_eq(g0, glim, W) -> first granule index in [g0, glim)
    whose 1024 words are not all == W, or glim if every granule matches.

    The encoder's long-PATTERN match extension (encode_scalar.match_len
    mode B): instead of the scalar core xor-walking a multi-KiB periodic
    run, DMA 4 KiB input granules into the VMEM bounce (depth-2
    pipelined, same granule discipline as emit_long) and let the VPU
    compare each against the broadcast pattern word; the scalar core
    only re-scans the one mismatching granule.  All DMAs are drained
    before return — the scratch is shared with emit_long/emit_fill,
    which run strictly after on the serial scalar core."""

    def dma(g, slot):
        return pltpu.make_async_copy(
            src_ref.at[pl.ds(pl.multiple_of(g * G, G), G)],
            vbuf_ref.at[pl.ds(pl.multiple_of(slot * G, G), G)],
            sems.at[slot])

    def make(use_tile: bool):
        def scan(g0, glim, W, gref):
            def run(_):
                if use_tile:
                    # reference granule -> slot 2 (waited before the
                    # first compare; slot-0 sem is reused afterwards)
                    ref_cp = pltpu.make_async_copy(
                        src_ref.at[pl.ds(pl.multiple_of(gref * G, G), G)],
                        vbuf_ref.at[pl.ds(pl.multiple_of(2 * G, G), G)],
                        sems.at[0])
                    ref_cp.start()
                    ref_cp.wait()
                dma(g0, jnp.int32(0)).start()

                def body(st):
                    g, _go, _eq = st

                    @pl.when(g + 1 < glim)
                    def _():
                        dma(g + 1, (g + 1 - g0) & 1).start()

                    dma(g, (g - g0) & 1).wait()
                    slot_off = pl.multiple_of(((g - g0) & 1) * G, G)
                    T = vbuf_ref[pl.ds(slot_off, G)].reshape(8, 128)
                    if use_tile:
                        Tref = vbuf_ref[pl.ds(pl.multiple_of(2 * G, G),
                                              G)].reshape(8, 128)
                        eq = jnp.all(T == Tref)
                    else:
                        eq = jnp.all(T == W)
                    return g + 1, eq & (g + 1 < glim), eq

                gex, _, eq_last = jax.lax.while_loop(
                    lambda st: st[1], body,
                    (g0, jnp.bool_(True), jnp.bool_(True)))
                # drain the in-flight prefetch the exit iteration started
                @pl.when(gex < glim)
                def _():
                    dma(gex, (gex - g0) & 1).wait()

                return jax.lax.select(eq_last, glim, gex - 1)

            return jax.lax.cond(g0 < glim, run, lambda _: glim, 0)

        return scan

    scan_eq_w = make(False)
    scan_eq_t = make(True)

    def scan_eq(g0, glim, W):
        return scan_eq_w(g0, glim, W, jnp.int32(0))

    def scan_eq_tile(g0, glim, gref):
        """Tile variant: granules compare against reference granule
        ``gref`` (fully pattern-content, caller-guaranteed) — serves any
        period dividing 4096 (power-of-two offsets up to a page), where
        a single broadcast word cannot express the pattern."""
        return scan_eq_t(g0, glim, jnp.int32(0), gref)

    def scan_eq_pair(g0, glim, gshift):
        """Two-stream variant for offsets that are MULTIPLES of 4096
        (page-duplicate matches, where the hash table usually locks on
        at 2+ pages back): both streams are granule-aligned, so compare
        granule g against granule g - gshift directly — the sequential
        scan makes the usual induction hold (each equal pair extends
        the verified region by one granule).  Serial per-granule DMAs
        into slots 0/1 (the two copies overlap each other in flight)."""

        def run(_):
            def body(st):
                g, _go, _eq = st
                ca = dma(g, jnp.int32(0))
                cb = dma(g - gshift, jnp.int32(1))
                ca.start()
                cb.start()
                ca.wait()
                cb.wait()
                Ta = vbuf_ref[pl.ds(0, G)].reshape(8, 128)
                Tb = vbuf_ref[pl.ds(pl.multiple_of(G, G), G)].reshape(
                    8, 128)
                eq = jnp.all(Ta == Tb)
                return g + 1, eq & (g + 1 < glim), eq

            gex, _, eq_last = jax.lax.while_loop(
                lambda st: st[1], body,
                (g0, jnp.bool_(True), jnp.bool_(True)))
            return jax.lax.select(eq_last, glim, gex - 1)

        return jax.lax.cond(g0 < glim, run, lambda _: glim, 0)

    scan_eq.tile = scan_eq_tile
    scan_eq.pair = scan_eq_pair
    return scan_eq


def make_emit_fill(dst_ref, vbuf_ref, hbuf_ref, sems, sem_h):
    """Build emit_fill(dst_b, length, wpat): fill ``length`` bytes at
    dst_ref[dst_b:] with the constant word ``wpat`` via a VPU broadcast
    into the VMEM bounce + granule DMA write-back.

    This is the long-PATTERN analog of emit_long for coalesced near-copy
    runs with offset 1 or 2: the periodic fill collapses to ONE word
    value per aligned position (period divides 4), so no inbound DMA and
    no rotate are needed — ~10 us for 64 KiB vs ~80 us for the scalar
    pattern loop.  Same clobber/head-merge/boundary contract and the
    same scratch as emit_long (sequential use, no overlap)."""

    def emit_fill(dst_b, length, wpat):
        d0w = pl.multiple_of((dst_b >> 2) & ~1023, G)
        head = dst_b - 4 * d0w
        lbytes = head + length
        gl = (lbytes + 4095) >> 12

        cp_h = pltpu.make_async_copy(
            dst_ref.at[pl.ds(d0w, G)], hbuf_ref.at[pl.ds(0, G)], sem_h)
        cp_h.start()
        wb_lo = dst_b >> 2
        keep_lo = (_I32(1) << ((dst_b & 3) * 8)) - 1
        old_lo = dst_ref[wb_lo]
        cp_h.wait()

        hw = head >> 2

        def do_bucket(bwords):
            def body():
                R = jnp.full((bwords // 128, 128), 0, jnp.int32) + wpat
                iota = (jax.lax.broadcasted_iota(
                    jnp.int32, (8, 128), 0) * 128
                    + jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1))
                H = hbuf_ref[pl.ds(0, G)].reshape(8, 128)
                merged = jnp.where(iota < hw, H, R[:8, :])
                vbuf_ref[pl.ds(0, bwords)] = R.reshape(bwords)
                vbuf_ref[pl.ds(0, G)] = merged.reshape(G)
            return body

        need = gl * G
        idx = jnp.int32(0)
        for b in ROT_BUCKETS[:-1]:
            idx = idx + (need > b).astype(jnp.int32)
        jax.lax.switch(idx, [do_bucket(b) for b in ROT_BUCKETS])

        def out_dma(g, slot):
            return pltpu.make_async_copy(
                vbuf_ref.at[pl.ds(pl.multiple_of(g * G, G), G)],
                dst_ref.at[pl.ds(pl.multiple_of(d0w + g * G, G), G)],
                sems.at[slot])

        out_dma(jnp.int32(0), 0).start()

        def out_body(g, c):
            out_dma(g, g & 1).start()
            out_dma(g - 1, (g - 1) & 1).wait()
            return c

        jax.lax.fori_loop(1, gl, out_body, jnp.int32(0))
        out_dma(gl - 1, (gl - 1) & 1).wait()

        new_lo = dst_ref[wb_lo]
        dst_ref[wb_lo] = (old_lo & keep_lo) | (new_lo & ~keep_lo)

    return emit_fill
