"""Snappy tag-stream decoder on the TPU scalar core (Pallas, SMEM-resident).

Why a *scalar* kernel on a vector machine: LZ77 decode is a data-dependent
byte-pointer walk.  Measured on this part (see experiments/e1*-e3*):

* XLA lowers arbitrary gathers to a serialized scalar loop at ~90 ns per
  element, so the round-1 array-parallel decoder (speculative parse +
  pointer-doubling, ops/decode_jax.py) spends ~30 ms per 64 KiB block in
  gather rounds — 3 MB/s.
* A gather expressed as int8 one-hot matmuls does ride the MXU, but the
  (64K x 512) @ (512 x 128) shape reaches only 3.1 TMAC/s (vs 43 TMAC/s for
  square int8 matmuls), capping that route at ~65 MB/s.
* The TPU's scalar core, driving SMEM directly inside a Pallas kernel,
  walks real tag streams at ~38 ns/tag and copies SMEM words at ~14
  ns/word — two orders of magnitude faster than either vector route.

So the production device decoder is the reference's sequential algorithm
(decoder.nim:20-155 semantics, re-derived) running on the scalar core, with
chunk-level data parallelism from the grid: each grid step decodes one
independent ≤64 KiB chunk, and Pallas pipelines the HBM<->SMEM transfers of
step k+1 under the compute of step k.  Multi-chunk batches amortize the
~0.8 ms per-call dispatch overhead of this environment.

Layout: compressed bytes and output both live in SMEM packed as int32
words (SMEM is word-addressed; byte access = shift/mask).  The copy loops
run word-at-a-time with unaligned source reads and aligned destination
writes; overlapping copies with offset < 4 take a byte loop (offsets 1, 2
seed a pattern word first — the scalar analog of the reference's
pattern-doubling fast path, decoder.nim:130-144).

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

# Compressed capacity: max_compressed_len(65536) = 76490 bytes -> words.
C_WORDS = 19200  # 76800 bytes
OUT_WORDS = 16384  # 65536 bytes
# The copy engine over-writes up to 7 bytes past a segment end and its
# word reads may touch one word past that — pad the SMEM output buffer.
OUT_PAD_WORDS = OUT_WORDS + 4
# Raw-stream variant: one window of up to 128 KiB output with up to
# max_compressed_len(131072) = 153146 compressed bytes, all SMEM-resident.
# (Raw streams larger than this fall back; the framed format is the
# parallel production path for large payloads.)
RAW_C_WORDS = 38400   # 153600 bytes
RAW_OUT_WORDS = 32768  # 131072 bytes
RAW_OUT_PAD_WORDS = RAW_OUT_WORDS + 4
_I32 = jnp.int32


def _kernel(meta_ref, comp_ref, out_ref, status_ref):
    """Decode one chunk per grid step.

    meta_ref:   SMEM [1, 1, 2] int32 — (comp_len, out_len) in bytes
    comp_ref:   SMEM [1, 1, C_WORDS + 4] int32 — packed LE bytes, zero-pad
    out_ref:    SMEM [1, 1, OUT_WORDS] int32 — packed output
    status_ref: SMEM [1, 1, 2] int32 — (ok, written)
    """
    n = meta_ref[0, 0, 0]
    m = meta_ref[0, 0, 1]

    # Size-agnostic: capacities come from the ref shapes, so the same body
    # serves the 64 KiB chunk decoder and the 128 KiB raw-stream variant.
    MAXB = 4 * (comp_ref.shape[2] - 4)
    out_pad_words = out_ref.shape[2]

    def gbyte(p):
        w = comp_ref[0, 0, p >> 2]
        return (w >> ((p & 3) * 8)) & 255

    def _funnel(wa, wb, sh):
        # int32 >> is arithmetic; mask off the sign-extension bits before
        # merging the high word.
        lo = (wa >> sh) & ((jnp.int32(1) << (32 - sh)) - 1)
        return jax.lax.select(sh == 0, wa, lo | (wb << (32 - sh)))

    def gword_comp(p):
        """Unaligned LE word at byte offset p of the compressed stream."""
        wa = comp_ref[0, 0, p >> 2]
        wb = comp_ref[0, 0, (p >> 2) + 1]
        return _funnel(wa, wb, (p & 3) * 8)

    def gword_out(p):
        wa = out_ref[0, 0, p >> 2]
        wb = out_ref[0, 0, jnp.minimum((p >> 2) + 1, out_pad_words - 1)]
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
        """Write ``length`` bytes at dst0.

        ``make_load(src_off)`` returns a loader ``g(o)`` yielding the LE
        word at source offset ``src_off + o`` — o advances in multiples of
        4, so the loader hoists its funnel shift/mask once per segment
        (the shift is constant along a segment; recomputing it per word
        was ~20% of decode time).

        Over-writes up to 7 bytes past the segment end (always at
        positions >= the running cursor, so later segments repair them —
        the same trick as the reference's unconditional 16-byte literal
        bursts, encoder.nim:58-62).  No loop entry for the common <= 8
        byte tags; longer segments run an aligned-destination loop (plain
        word stores, no read-merge-write).
        """
        sh_d = (dst0 & 3) * 8
        keep_d = (jnp.int32(1) << sh_d) - 1

        def store_u(p, v):
            # 4-byte store at p (p ≡ dst0 mod 4): merge masks hoisted.
            wi = p >> 2
            lo = out_ref[0, 0, wi]
            out_ref[0, 0, wi] = (lo & keep_d) | (v << sh_d)
            hi = out_ref[0, 0, wi + 1]
            # (v >> 31 >> 1) avoids the undefined shift-by-32 when sh_d==0.
            spill = (v >> (31 - sh_d) >> 1) & keep_d
            out_ref[0, 0, wi + 1] = (hi & ~keep_d) | spill

        g0 = make_load(jnp.int32(0))
        store_u(dst0, g0(jnp.int32(0)))

        @pl.when(length > 4)
        def _():
            store_u(dst0 + 4, g0(jnp.int32(4)))

        @pl.when(length > 8)
        def _():
            # Restart at the last aligned destination address <= dst0+8;
            # the overlapped bytes are re-written with identical values
            # (copy loads lag the cursor by >= 4, so re-reads see final
            # data), keeping the loop stores aligned single writes.
            o0 = (((dst0 + 8) >> 2) << 2) - dst0  # in [5, 8]
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
            m = (jnp.int32(1) << (32 - sh)) - 1

            def g(o):
                wi = bw + (o >> 2)
                wa = comp_ref[0, 0, wi]
                wb = comp_ref[0, 0, wi + 1]
                return jax.lax.select(
                    sh == 0, wa, ((wa >> sh) & m) | (wb << (32 - sh))
                )

            return g

        return make

    def make_load_out(base):
        def make(off):
            b2 = base + off
            bw = b2 >> 2
            sh = (b2 & 3) * 8
            m = (jnp.int32(1) << (32 - sh)) - 1

            def g(o):
                wi = bw + (o >> 2)
                wa = out_ref[0, 0, wi]
                wb = out_ref[0, 0, jnp.minimum(wi + 1, out_pad_words - 1)]
                return jax.lax.select(
                    sh == 0, wa, ((wa >> sh) & m) | (wb << (32 - sh))
                )

            return g

        return make

    def do_literal(pos, w, hdr, length):
        # Runs only on validated tags: base+length <= n, and speculative
        # reads stop before the padded tail ends.
        emit(w, length, make_load_comp(pos + hdr))

    def do_copy_far(w, off, length):
        # off >= 4: word reads lag the write cursor by >= 4 bytes, so
        # every load sees already-written output (the sequencing makes
        # self-overlapping copies with off >= 4 correct).
        emit(w, length, make_load_out(w - off))

    def do_copy_near(w, off, length):
        # off in {1, 2, 3}: the run is periodic.  off 1 and 2 replicate
        # as a constant pattern word (scalar analog of the reference's
        # pattern-doubling, decoder.nim:130-144); off 3 takes the byte
        # loop (copy lengths are <= 64).
        b0 = gbyte_out(w - off)
        b1 = gbyte_out(w - off + (off >> 1))  # second byte when off == 2
        pat1 = b0 * jnp.int32(0x01010101)
        pat2 = b0 | (b1 << 8) | (b0 << 16) | (b1 << 24)
        pat2s = b1 | (b0 << 8) | (b1 << 16) | (b0 << 24)  # odd-offset phase

        @pl.when(off != 3)
        def _():
            pa = jax.lax.select(off == 1, pat1, pat2)
            pb = jax.lax.select(off == 1, pat1, pat2s)

            def make(off2):
                # source-offset parity is constant along the segment
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
        # pos <= n always (guarded advance), and speculative reads reach at
        # most pos+8 < the zero-padded tail — no clamp needed.
        p = pos
        b = gbyte(p)
        t = b & 3
        lc = b >> 2
        is_lit = t == 0

        # --- literal fields (decoder.nim:48-79) ---
        ex = jnp.clip(lc - 59, 0, 4)
        ext_word = gword_comp(p + 1)
        emask = jax.lax.select(ex == 4, jnp.int32(-1), (jnp.int32(1) << (ex * 8)) - 1)
        ext_val = ext_word & emask
        # uint32 wraparound (ext_val == 0xffffffff) and lengths >= 2^31
        # cannot fit any 64 KiB output: treat sign bit as error.
        lit_wrap = is_lit & (lc >= 60) & (ext_val < 0)
        lit_len = jax.lax.select(lc < 60, lc + 1, ext_val + 1)
        # header length: literal 1+ex; copies 1+t except tagCopy4's 5 bytes
        # (t + (t>>1 & t&1) maps 1,2,3 -> 1,2,4).
        hdr = jax.lax.select(is_lit, 1 + ex, 1 + t + ((t >> 1) & t & 1))

        # --- copy fields (decoder.nim:87-109) ---
        e1 = ext_word & 255
        off = jax.lax.select(
            t == 1,
            ((b & 0xE0) << 3) | e1,
            ext_word,  # copy2: low 2 bytes; copy4: all 4 (ext_word at p+1)
        )
        off = jax.lax.select(t == 2, ext_word & 0xFFFF, off)
        cl = jax.lax.select(t == 1, 4 + (lc & 7), 1 + lc)

        length = jax.lax.select(is_lit, lit_len, cl)
        consumed = hdr + jax.lax.select(is_lit, length, 0)

        # --- validation ---
        bad = lit_wrap
        bad |= is_lit & (lit_len < 0)
        # input overrun: tag bytes + literal payload must fit comp_len
        bad |= (pos + jnp.minimum(consumed, MAXB) > n) | (consumed < 0)
        # output overrun
        bad |= (length > m - w)
        # copy offset rules: 0 < off <= w  (negative int32 = huge uint32)
        bad |= (~is_lit) & ((off <= 0) | (off > w))

        def run_copy(_):
            @pl.when(is_lit)
            def _():
                do_literal(pos, w, hdr, length)

            @pl.when((~is_lit) & (off >= 4))
            def _():
                do_copy_far(w, off, length)

            @pl.when((~is_lit) & (off < 4))
            def _():
                do_copy_near(w, off, length)

            return 0

        @pl.when(~bad)
        def _():
            run_copy(0)

        pos2 = jax.lax.select(bad, pos, pos + consumed)
        w2 = jax.lax.select(bad, w, w + length)
        return pos2, w2, err | bad

    def cond(state):
        pos, w, err = state
        return (pos < n) & (~err)

    # One tag per iteration: a 2x-unrolled variant measured marginally
    # SLOWER (175 vs 169 ms on the 12.6 MB batch) at 10x the compile time —
    # the while-loop overhead is not where the cycles go.
    pos, w, err = jax.lax.while_loop(
        cond, tag_step, (jnp.int32(0), jnp.int32(0), jnp.bool_(False))
    )
    ok = (~err) & (pos == n) & (w == m)
    status_ref[0, 0, 0] = jax.lax.select(ok, jnp.int32(1), jnp.int32(0))
    status_ref[0, 0, 1] = w


def _call(meta, comp_words, nb: int, interpret: bool):
    c_total = comp_words.shape[2]
    out_pad = OUT_PAD_WORDS if c_total == C_WORDS + 4 else RAW_OUT_PAD_WORDS
    return pl.pallas_call(
        _kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, 1, c_total), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, 1, out_pad), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb, 1, out_pad), jnp.int32),
            jax.ShapeDtypeStruct((nb, 1, 2), jnp.int32),
        ),
        interpret=interpret,
    )(meta, comp_words)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _decode_chunks_words_jit(meta, comp_words, nb: int, interpret: bool):
    return _call(meta, comp_words, nb, interpret)


def decode_chunks_words(meta, comp_words, nb: int, interpret=None):
    """Decode ``nb`` independent tag streams.

    meta:       int32 [nb, 1, 2] — (comp_len, declared_out_len) per chunk
    comp_words: int32 [nb, 1, C_WORDS + 4] — packed LE bytes, zero-padded

    Returns (out_words [nb, 1, OUT_PAD_WORDS], status [nb, 1, 2]) where
    status[:, 0, 0] is the ok flag and status[:, 0, 1] the written length.
    """
    if interpret is None:
        interpret = _forced_interpret()
    return _decode_chunks_words_jit(meta, comp_words, nb, bool(interpret))


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
    Returns (meta [nb,1,2] int32, comp_words [nb,1,C_WORDS+4] int32).
    """
    nb = len(bodies)
    comp = np.zeros((nb, 1, 4 * (C_WORDS + 4)), dtype=np.uint8)
    meta = np.zeros((nb, 1, 2), dtype=np.int32)
    for k, body in enumerate(bodies):
        arr = np.frombuffer(body, dtype=np.uint8)
        comp[k, 0, : len(arr)] = arr
        meta[k, 0, 0] = len(arr)
        meta[k, 0, 1] = declared[k]
    return meta, comp.view(np.int32)


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
    comp = np.zeros((1, 1, 4 * (RAW_C_WORDS + 4)), dtype=np.uint8)
    arr = np.frombuffer(body, dtype=np.uint8)
    comp[0, 0, : len(arr)] = arr
    meta = np.asarray([[[len(arr), declared]]], dtype=np.int32)
    return meta, comp.view(np.int32)


def decode_raw_words(meta, comp_words, interpret=None):
    """Single raw stream, up to 128 KiB output, one SMEM window."""
    if interpret is None:
        interpret = _forced_interpret()
    return _decode_chunks_words_jit(meta, comp_words, 1, bool(interpret))
