"""Snappy tag-stream decoder on the TPU scalar core (Pallas, SMEM-resident).

Why a *scalar* kernel on a vector machine: LZ77 decode is a data-dependent
byte-pointer walk.  Measured on this part (see experiments/e1*-e3*, e14*):

* XLA lowers arbitrary gathers to a serialized scalar loop at ~90 ns per
  element, so the round-1 array-parallel decoder (speculative parse +
  pointer-doubling, ops/decode_jax.py) spends ~30 ms per 64 KiB block in
  gather rounds — 3 MB/s.
* A gather expressed as int8 one-hot matmuls does ride the MXU, but the
  (64K x 512) @ (512 x 128) shape reaches only 3.1 TMAC/s (vs 43 TMAC/s for
  square int8 matmuls), capping that route at ~65 MB/s.
* VPU vector copies (dynamic lane rotate + masked RMW stores) stream long
  runs at ~30 GB/s but pay ~160 ns of dependent-chain latency per segment
  (experiments/e14b) — a loss on real corpora where segments average
  9-16 bytes.  The scalar core walks tag streams at ~1-2 ns per operation.

So the production device decoder is the reference's sequential algorithm
(decoder.nim:20-155 semantics, re-derived) running on the scalar core, with
chunk-level data parallelism from the grid: each grid step decodes one
independent <= 64 KiB chunk.  Multi-chunk batches amortize the ~0.8 ms
per-call dispatch overhead of this environment.

v2 design (experiments/e15 breakdown: parse ~73 ns/tag, branch dispatch
~15 ns per taken/not-taken branch on the in-order scalar pipeline):

* **Tag LUT**: a 256-entry table in SMEM maps the tag byte straight to
  (header length, literal flag, needs-extension flag, base length, copy-1
  offset-base) plus a second 256-entry extension mask — replacing the
  select chains of the field decode (decoder.nim:48-109) with two loads.
* **Unified buffer**: the compressed bytes are DMA'd from HBM into the
  front of one SMEM scratch buffer whose tail is the output window, so a
  literal (source = comp) and a far copy (source = out) share a single
  address computation and ONE emit path — no literal/copy branch.
* **Branchless dispatch**: invalid tags and near copies (offset < 4)
  redirect the emit's destination to a scratch slot (a select, not a
  branch) and clamp the length; the only conditional branch left in the
  hot loop is the rare near-copy arm (pattern replication, the scalar
  analog of decoder.nim:130-144).

v3 emit path (experiments/e18 A/B: +14-18% on text corpora, +33-37% on
long-literal streams vs v2; 16-byte loop strides measured no better than
8, so strides stay at 8):

* **Fused parse loads**: the tag byte and its extension word always sit
  in the same two SMEM words — two loads and a funnel shift replace the
  separate byte and word fetches.
* **Unified mask LUT bank**: ``off = off_base | (ext & lut[256+b])``
  replaces the tag-type select chain; one mask bank serves the literal
  length extension and the copy offset alike (a tag is never both), so
  the parse is two LUT loads per tag.
* **Fused head**: the first 8 output bytes take one read-modify-write
  (preserving bytes below the cursor) plus clobber-allowed full-word
  stores — everything at or past the cursor may be overwritten and is
  repaired by later segments.
* **Carried-word copy loops**: literals and copies with offset >= 8 run
  a funnel loop that loads each source word once (or a plain word-copy
  loop when the realigned source is aligned); only offsets in [4, 8)
  pay the re-loading two-word funnel.

Layout: everything is int32 words (SMEM is word-addressed; byte access =
shift/mask).  The copy loop runs word-at-a-time with unaligned source
reads and aligned destination writes and over-writes up to 11 bytes past a
segment end (always at positions >= the running cursor, so later segments
repair them — the same trick as the reference's unconditional 16-byte
literal bursts, encoder.nim:58-62).

Validation parity (all return err -> ok=False for the chunk):
  * truncated tag headers / length extensions (decoder.nim:54-79)
  * literal length overruns input or output
  * copy offset == 0, offset > bytes written, output overrun
    (decoder.nim:111-113)
  * stream must consume exactly comp_len and produce exactly out_len
    (written == declared, snappy.nim:107-108 — checked in-kernel)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import emit_long as emit_long_mod
from . import scalar_emit

# Compressed capacity: max_compressed_len(65536) = 76490 bytes.  The HBM
# slab and SMEM comp window are padded to a 1024-word multiple (Mosaic DMA
# alignment: HBM offsets and slice shapes align to 1024 int32 words).
C_WORDS = 19200        # capacity bound used by callers (76800 bytes)
CW_PAD = 19456         # comp words per chunk (19 * 1024)
OUT_WORDS = 16384      # 65536 bytes (16 * 1024)
# dead-store scratch + spill margin; 1024 extra words absorb the long-
# literal DMA emitter's up-to-4-KiB clobber zone past the out window
SCR_WORDS = 1024 + 32
BUF_WORDS = CW_PAD + OUT_WORDS + SCR_WORDS
# Raw-stream variant: one window of up to 128 KiB output with up to
# max_compressed_len(131072) = 153146 compressed bytes, all SMEM-resident.
# (Raw streams larger than this fall back; the framed format is the
# parallel production path for large payloads.)
RAW_C_WORDS = 38400    # capacity bound (153600 bytes)
RAW_CW_PAD = 38912     # 38 * 1024
RAW_OUT_WORDS = 32768  # 131072 bytes (32 * 1024)
_I32 = jnp.int32

# LUT field packing: hdr[0:3] | is_lit[3] | needs_ext[4] | base_len[5:12]
# | copy1_offset_base[12:23]; entries 256..511 hold ONE unified extension
# mask — the literal-extension byte mask ((1 << 8*ex) - 1, or -1 for the
# 4-byte extension) for literal tags, the copy-offset extension mask
# (0xFF / 0xFFFF / -1 for copy-1/2/4) for copy tags.  A tag is never
# both, so one bank (and one SMEM load per tag) serves the length and
# the offset decode alike: ext_val is only read when needs_ext (literal)
# and off only when ~is_lit (copy).
_LUT_HDR_MASK = 7
_LUT_LIT = 8
_LUT_EXT = 16
LUT_WORDS = 512


@functools.cache
def _host_lut() -> np.ndarray:
    """256-entry tag-decode table + unified extension-mask bank (numpy —
    jnp arrays created inside a trace must not be cached)."""
    lut = np.zeros(LUT_WORDS, np.int32)
    for b in range(256):
        t = b & 3
        lc = b >> 2
        if t == 0:  # literal (decoder.nim:48-79)
            if lc < 60:
                hdr, ln, needs, ex = 1, lc + 1, 0, 0
            else:
                ex = lc - 59
                hdr, ln, needs = 1 + ex, 1, 1
            lut[b] = hdr | _LUT_LIT | (needs << 4) | (ln << 5)
            lut[256 + b] = -1 if ex == 4 else (1 << (8 * ex)) - 1
        elif t == 1:  # copy with 1-byte extra (decoder.nim:87-95)
            lut[b] = 2 | ((4 + (lc & 7)) << 5) | (((b & 0xE0) << 3) << 12)
            lut[256 + b] = 0xFF
        elif t == 2:  # copy with 2-byte offset (decoder.nim:97-102)
            lut[b] = 3 | ((1 + lc) << 5)
            lut[256 + b] = 0xFFFF
        else:  # copy with 4-byte offset (decoder.nim:104-109)
            lut[b] = 5 | ((1 + lc) << 5)
            lut[256 + b] = -1
    return lut


def _make_kernel(cw_pad: int, out_words: int):
    out_base_b = 4 * cw_pad                      # byte offset of out window
    scr_b = 4 * (cw_pad + out_words + 4)         # dead-store byte offset

    def _kernel(lut_ref, meta_ref, comp_ref, out_ref, status_ref,
                buf_ref, sem_in, sem_out, vbuf, hbuf, sems2, sem_h):
        """Decode one chunk per grid step.

        lut_ref:    SMEM [512] int32 — tag LUT + unified ext-mask bank
        meta_ref:   SMEM [1, 1, 2] int32 — (comp_len, out_len) in bytes
        comp_ref:   ANY  [nb * cw_pad] int32 — packed LE bytes per chunk
        out_ref:    ANY  [nb * out_words] int32 — packed output
        status_ref: SMEM [1, 1, 2] int32 — (ok, written)
        buf_ref:    SMEM scratch [cw_pad + out_words + SCR_WORDS] int32
        vbuf/hbuf/sems2/sem_h: long-literal DMA emitter scratch
        """
        i = pl.program_id(0)
        n = meta_ref[0, 0, 0]
        m = meta_ref[0, 0, 1]

        copy_in = pltpu.make_async_copy(
            comp_ref.at[pl.ds(i * cw_pad, cw_pad)],
            buf_ref.at[pl.ds(0, cw_pad)],
            sem_in,
        )
        copy_in.start()
        copy_in.wait()

        BUF_CAP = cw_pad + out_words + SCR_WORDS
        emit_mem, _, do_copy_near, gbyte, _ = scalar_emit.make_emit_ops(
            buf_ref)
        parse = scalar_emit.make_parser(lut_ref, buf_ref)
        emit_long = emit_long_mod.make_emit_long(
            buf_ref, buf_ref, vbuf, hbuf, sems2, sem_h)
        emit_fill = emit_long_mod.make_emit_fill(
            buf_ref, vbuf, hbuf, sems2, sem_h)

        def make_walk(with_long: bool, with_runs: bool = False):
            """One full tag walk.  The long-literal DMA dispatch and the
            copy-run coalescer each cost a few ops per tag, so they are
            instantiated as separate walks selected per CHUNK (below) —
            text chunks pay zero per-tag cost for either.

            The non-runs walks use a two-tier fast/slow structure (the
            grid kernel's design): the FAST loop has no near-copy arm at
            all — near copies (off < 4, <= 0.35% of tags outside the RLE
            class) fold into the same unsigned-wrap compare that catches
            invalid offsets and stop the loop; a cold full-validation
            round resolves that one tag and the fast loop resumes.  The
            runs walk keeps its original single loop (near pattern fills
            are its hot path)."""
            dispatch = scalar_emit.make_tag_dispatch(
                emit_mem, do_copy_near, out_base_b, scr_b, BUF_CAP,
                emit_long=emit_long if with_long else None,
                long_t=emit_long_mod.LONG_T,
                emit_fill=emit_fill if with_runs else None, gbyte=gbyte,
                handle_near=with_runs,
                emit_copy_dma=emit_long if with_runs else None,
            )
            dispatch_slow = scalar_emit.make_tag_dispatch(
                emit_mem, do_copy_near, out_base_b, scr_b, BUF_CAP,
                emit_long=emit_long if with_long else None,
                long_t=emit_long_mod.LONG_T,
            )

            lookahead = scalar_emit.make_run_lookahead(buf_ref)

            def parse_validate(pos, w):
                """Shared parse + EXACT validation (decoder.nim:54-79,
                111-113), folded with unsigned-wrap compares
                (decoder.nim:111's `offset - 1` trick, and its analog
                for `consumed`: int32 wraparound of hdr + length becomes
                a huge uint32, so one compare covers the input-overrun
                and wraparound tests together)."""
                b, hdr, is_lit, needs, ext_val, length, off = parse(pos)
                consumed = hdr + jax.lax.select(is_lit, length, 0)
                bad = needs & (ext_val < 0)
                bad |= consumed.astype(jnp.uint32) > (n - pos).astype(
                    jnp.uint32)
                bad |= length > m - w
                return b, hdr, is_lit, length, off, consumed, bad

            def tag_step_runs(state):
                pos, w, err = state
                b, hdr, is_lit, length, off, consumed, bad = \
                    parse_validate(pos, w)
                bad |= (~is_lit) & (
                    (off - 1).astype(jnp.uint32) >= w.astype(jnp.uint32))

                # Long matches hit the wire as runs of max-length copy
                # tags (0xFE) ending in one shorter tag at the SAME
                # offset (encoder.nim:83-111): coalesce run + tail into
                # ONE emit (scalar_emit.make_run_lookahead — entry/body
                # costs measured in e29).
                run = (b == jnp.int32(0xFE)) & (~bad)
                tot, extra = jax.lax.cond(
                    run,
                    lambda _: lookahead(pos, off, length, n, m - w),
                    lambda _: (length, jnp.int32(0)), 0)

                dispatch(pos, w, hdr, is_lit, off, bad, tot)
                pos2 = jax.lax.select(bad, pos, pos + consumed + extra)
                w2 = jax.lax.select(bad, w, w + tot)
                return pos2, w2, err | bad

            def fast_step(state):
                pos, w, _sp = state
                b, hdr, is_lit, length, off, consumed, spec = \
                    parse_validate(pos, w)
                # ONE wrap compare covers off <= 0, off > w AND the
                # near-copy exit (off < 4); the max() clamp is
                # conservative only for w < 3 (chunk head), where the
                # slow round re-validates exactly
                spec |= (~is_lit) & (
                    (off - 4).astype(jnp.uint32)
                    >= jnp.maximum(w - 3, 0).astype(jnp.uint32))
                dispatch(pos, w, hdr, is_lit, off, spec, length)
                pos2 = jax.lax.select(spec, pos, pos + consumed)
                w2 = jax.lax.select(spec, w, w + length)
                return pos2, w2, spec

            def slow_tag(a):
                """Full-validation resolution of the one tag the fast
                loop flagged (a near copy, a stream-head copy, or a
                malformed tag)."""
                pos, w = a
                _b, hdr, is_lit, length, off, consumed, bad = \
                    parse_validate(pos, w)
                bad |= (~is_lit) & (
                    (off - 1).astype(jnp.uint32) >= w.astype(jnp.uint32))
                dispatch_slow(pos, w, hdr, is_lit, off, bad, length)
                pos2 = jax.lax.select(bad, pos, pos + consumed)
                w2 = jax.lax.select(bad, w, w + length)
                return pos2, w2, bad

            def tag_round(state):
                pos, w, err = state
                pos, w, sp = jax.lax.while_loop(
                    lambda fs: (fs[0] < n) & (~fs[2]),
                    fast_step,
                    (pos, w, jnp.bool_(False)),
                )
                return jax.lax.cond(
                    sp, slow_tag, lambda a: (a[0], a[1], jnp.bool_(False)),
                    (pos, w))

            def walk():
                if with_runs:
                    return jax.lax.while_loop(
                        lambda st: (st[0] < n) & (~st[2]), tag_step_runs,
                        (jnp.int32(0), jnp.int32(0), jnp.bool_(False)))
                return jax.lax.while_loop(
                    lambda st: (st[0] < n) & (~st[2]), tag_round,
                    (jnp.int32(0), jnp.int32(0), jnp.bool_(False)))

            return walk

        # Pick the walk once per chunk from the n/m ratio, so text
        # chunks pay zero per-tag cost for either fast path:
        # * long literals (>= LONG_T) only exist in literal-dominated
        #   chunks = the high-ratio ones (jpeg ~1.0, pdf ~0.87 vs text
        #   <= 0.6 per 64 KiB block);
        # * max-length copy-tag runs (long matches) dominate exactly the
        #   very-low-ratio chunks (RLE ~0.05, geo.protodata ~0.20 vs
        #   text >= 0.2).  The gate must stay TIGHT: widening it to 0.3
        #   (html) or 0.5 (kppkn/urls) measured -5..-11% on chip even
        #   though those classes hold 9-43% coalescable run bytes — the
        #   runs walk's per-tag compare + near-arm branching outweighs
        #   the wins there (e29 same-session A/B, round 4).
        long_chunk = (10 * n >= 7 * m) & (m >= emit_long_mod.LONG_T)
        run_chunk = (5 * n <= m) & (~long_chunk)
        idx = (jax.lax.select(long_chunk, jnp.int32(1), jnp.int32(0))
               + jax.lax.select(run_chunk, jnp.int32(2), jnp.int32(0)))
        pos, w, err = jax.lax.switch(
            idx, [make_walk(False), make_walk(True),
                  make_walk(False, with_runs=True)])
        ok = (~err) & (pos == n) & (w == m)
        status_ref[0, 0, 0] = jax.lax.select(ok, jnp.int32(1), jnp.int32(0))
        status_ref[0, 0, 1] = w

        copy_out = pltpu.make_async_copy(
            buf_ref.at[pl.ds(cw_pad, out_words)],
            out_ref.at[pl.ds(i * out_words, out_words)],
            sem_out,
        )
        copy_out.start()
        copy_out.wait()

    return _kernel


def _call(lut, meta, comp_words, nb: int, cw_pad: int, out_words: int,
          interpret: bool):
    out_flat, status = pl.pallas_call(
        _make_kernel(cw_pad, out_words),
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
            jax.ShapeDtypeStruct((nb * out_words,), jnp.int32),
            jax.ShapeDtypeStruct((nb, 1, 2), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.SMEM((cw_pad + out_words + SCR_WORDS,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ] + emit_long_mod.scratch_shapes(),
        interpret=interpret,
    )(lut, meta, comp_words)
    return out_flat.reshape(nb, 1, out_words), status


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def _decode_chunks_words_jit(lut, meta, comp_words, nb: int, cw_pad: int,
                             out_words: int, interpret: bool):
    return _call(lut, meta, comp_words, nb, cw_pad, out_words, interpret)


def decode_chunks_words(meta, comp_words, nb: int, interpret=None):
    """Decode ``nb`` independent tag streams.

    meta:       int32 [nb, 1, 2] — (comp_len, declared_out_len) per chunk
    comp_words: int32 [nb * CW_PAD] — packed LE bytes, zero-padded
    Returns (out_words [nb, 1, OUT_WORDS], status [nb, 1, 2]) where
    status[:, 0, 0] is the ok flag and status[:, 0, 1] the written length.
    """
    if interpret is None:
        interpret = _forced_interpret()
    return _decode_chunks_words_jit(
        _host_lut(), meta, comp_words, nb, CW_PAD, OUT_WORDS, bool(interpret)
    )


def _forced_interpret() -> bool:
    import os

    return os.environ.get("SNAPPY_TPU_SCALAR_INTERPRET") == "1"


def available() -> bool:
    if _forced_interpret():
        return True  # interpreter-mode kernels run anywhere (slowly; tests)
    try:
        plat = jax.devices()[0].platform
        dev = str(jax.devices()[0])
    except Exception:  # pragma: no cover
        return False
    return plat in ("tpu", "axon") or "TPU" in dev


# ---------------------------------------------------------------------------
# numpy-boundary convenience used by the engine and tests
# ---------------------------------------------------------------------------


def pack_chunks(bodies, declared):
    """Pack byte strings into the kernel's word layout.

    bodies: list of bytes (tag streams, each <= 4*C_WORDS)
    declared: list of declared output lengths (each <= 4*OUT_WORDS)
    Returns (meta [nb,1,2] int32, comp_words [nb*CW_PAD] int32).
    """
    nb = len(bodies)
    comp = np.zeros((nb, 4 * CW_PAD), dtype=np.uint8)
    meta = np.zeros((nb, 1, 2), dtype=np.int32)
    for k, body in enumerate(bodies):
        arr = np.frombuffer(body, dtype=np.uint8)
        comp[k, : len(arr)] = arr
        meta[k, 0, 0] = len(arr)
        meta[k, 0, 1] = declared[k]
    return meta, comp.reshape(-1).view(np.int32)


def unpack_output(out_words: np.ndarray, written) -> list:
    """Slice decoded payloads back out of the packed word layout."""
    outs = []
    bytes_view = np.ascontiguousarray(out_words).view(np.uint8)
    for k in range(out_words.shape[0]):
        outs.append(bytes_view[k, 0, : int(written[k])].tobytes())
    return outs


def pack_raw(body: bytes, declared: int):
    """Pack one raw tag stream into the big-window layout
    (comp <= 4*RAW_C_WORDS, declared <= 4*RAW_OUT_WORDS)."""
    comp = np.zeros((4 * RAW_CW_PAD,), dtype=np.uint8)
    arr = np.frombuffer(body, dtype=np.uint8)
    comp[: len(arr)] = arr
    meta = np.asarray([[[len(arr), declared]]], dtype=np.int32)
    return meta, comp.view(np.int32)


def decode_raw_words(meta, comp_words, interpret=None):
    """Single raw stream, up to 128 KiB output, one SMEM window."""
    if interpret is None:
        interpret = _forced_interpret()
    return _decode_chunks_words_jit(
        _host_lut(), meta, comp_words, 1, RAW_CW_PAD, RAW_OUT_WORDS,
        bool(interpret)
    )


def pack_raw_batch(bodies, declareds):
    """Pack independent raw tag streams into the big-window layout.

    bodies: list of bytes (each <= 4*RAW_C_WORDS), declareds: list of
    declared output lengths (each <= 4*RAW_OUT_WORDS).  Returns
    (meta [nb,1,2] int32, comp_words [nb*RAW_CW_PAD] int32)."""
    nb = len(bodies)
    comp = np.zeros((nb, 4 * RAW_CW_PAD), dtype=np.uint8)
    meta = np.zeros((nb, 1, 2), dtype=np.int32)
    for k, body in enumerate(bodies):
        arr = np.frombuffer(body, dtype=np.uint8)
        comp[k, : len(arr)] = arr
        meta[k, 0, 0] = len(arr)
        meta[k, 0, 1] = declareds[k]
    return meta, comp.reshape(-1).view(np.int32)


def decode_raw_batch_words(meta, comp_words, nb: int, interpret=None):
    """Decode ``nb`` independent raw streams (each <= 128 KiB output) in
    ONE pallas call — the multi-stream entry that amortizes the per-call
    dispatch tax over back-to-back small decodes (round-5 VERDICT item 5).
    Same kernel as decode_chunks_words, big-window shapes."""
    if interpret is None:
        interpret = _forced_interpret()
    return _decode_chunks_words_jit(
        _host_lut(), meta, comp_words, nb, RAW_CW_PAD, RAW_OUT_WORDS,
        bool(interpret)
    )
