"""Snappy block encoder on the TPU scalar core (Pallas, SMEM-resident).

The greedy LZ77 matcher is a data-dependent hash-probe walk — the same
workload shape as decoding, and the same measured physics applies (see
ops/decode_scalar.py): the scalar core probes at ~tens of ns while every
vectorized formulation (argsort candidates, one-hot matmuls) loses 10-100x
to serialized gathers or narrow-matmul underutilization.  So the device
encoder runs the reference algorithm (encoder.nim:184-383 semantics,
re-derived from the algorithm spec — greedy matching with the 1/32 skip
heuristic) per chunk on the scalar core, grid-batched over chunks.

Differences from the reference implementation (allowed: the reference's own
tests accept different bytes across implementations, test_snappy.nim:50-53):

* no 4x4 unrolled probe block — probe order therefore differs slightly, so
  output bytes differ while remaining spec-valid and within ~1% of the
  reference's density;
* the hash table is epoch-tagged int32 SMEM instead of zeroed uint16 stack
  memory: entry = (chunk_epoch << 16) | position, so per-chunk zeroing
  (16 K stores) happens once per *call*, not once per chunk.

The emitted stream satisfies: decodable by every decoder in this repo and
by google/snappy; compressed size ~= the reference greedy oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

IN_WORDS = 16384  # 65536-byte block
ENC_WORDS = 19204  # 76816 bytes >= max_compressed_len(65536) + spill pad
TABLE_SIZE = 16384  # max table (2^14 entries, encoder.nim:10-12)
_K_HASH = 0x1E35A7BD
MIN_NON_LITERAL = 17
INPUT_MARGIN = 15


def _kernel(meta_ref, in_ref, enc_ref, elen_ref, table_ref):
    n = meta_ref[0, 0, 0]
    epoch = pl.program_id(0) + 1

    # One-time table clear (entries are epoch-checked afterwards).
    @pl.when(pl.program_id(0) == 0)
    def _():
        def z(i, c):
            table_ref[i] = 0
            return c

        jax.lax.fori_loop(0, TABLE_SIZE, z, 0)

    def _funnel(wa, wb, sh):
        lo = (wa >> sh) & ((jnp.int32(1) << (32 - sh)) - 1)
        return jax.lax.select(sh == 0, wa, lo | (wb << (32 - sh)))

    def load32(p):
        wa = in_ref[0, 0, p >> 2]
        wb = in_ref[0, 0, (p >> 2) + 1]
        return _funnel(wa, wb, (p & 3) * 8)

    def gbyte(p):
        return (in_ref[0, 0, p >> 2] >> ((p & 3) * 8)) & 255

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
        """input[src0 .. src0+length) -> enc[dst0 ..); spills <= 7 bytes
        past the end, repaired by later writes (the stream is written
        strictly left to right)."""
        pword_u(dst0, load32(src0))

        @pl.when(length > 4)
        def _():
            pword_u(dst0 + 4, load32(src0 + 4))

        @pl.when(length > 8)
        def _():
            o0 = (((dst0 + 8) >> 2) << 2) - dst0  # aligned restart, [5, 8]

            def body(o):
                wi = (dst0 + o) >> 2
                enc_ref[0, 0, wi] = load32(src0 + o)
                enc_ref[0, 0, wi + 1] = load32(src0 + o + 4)
                return o + 8

            jax.lax.while_loop(lambda o: o < length, body, o0)

    def emit_literal(op, src0, length):
        """Literal tag + payload (encoder.nim:44-79).  Returns new op."""
        lm1 = length - 1
        ntag = jax.lax.select(lm1 < 60, 1, jax.lax.select(lm1 < 256, 2, 3))

        @pl.when(lm1 < 60)
        def _():
            pbyte(op, lm1 << 2)

        @pl.when((lm1 >= 60) & (lm1 < 256))
        def _():
            pbyte(op, 60 << 2)
            pbyte(op + 1, lm1)

        @pl.when(lm1 >= 256)
        def _():
            pbyte(op, 61 << 2)
            pbyte(op + 1, lm1 & 255)
            pbyte(op + 2, (lm1 >> 8) & 255)

        bulk_copy(op + ntag, src0, length)
        return op + ntag + length

    def emit_copy(op, offset, length):
        """Copy ops with the reference's 68/64/60 splitting
        (encoder.nim:81-125).  Returns new op."""

        def long_body(s):
            op_, rem = s
            pbyte(op_, (63 << 2) | 2)  # tagCopy2, len 64
            pbyte(op_ + 1, offset & 255)
            pbyte(op_ + 2, (offset >> 8) & 255)
            return op_ + 3, rem - 64

        op, rem = jax.lax.while_loop(
            lambda s: s[1] >= 68, long_body, (op, length)
        )

        def emit60(s):
            op_, rem_ = s
            pbyte(op_, (59 << 2) | 2)  # len 60
            pbyte(op_ + 1, offset & 255)
            pbyte(op_ + 2, (offset >> 8) & 255)
            return op_ + 3, rem_ - 60

        op, rem = jax.lax.cond(rem > 64, emit60, lambda s: s, (op, rem))

        use1 = (rem < 12) & (offset < 2048)

        @pl.when(use1)
        def _():
            pbyte(op, 1 | ((rem - 4) << 2) | ((offset >> 8) << 5))
            pbyte(op + 1, offset & 255)

        @pl.when(~use1)
        def _():
            pbyte(op, 2 | ((rem - 1) << 2))
            pbyte(op + 1, offset & 255)
            pbyte(op + 2, (offset >> 8) & 255)

        return op + jax.lax.select(use1, 2, 3)

    def hash32(u, mask):
        return ((u * jnp.int32(_K_HASH)) >> 18) & mask

    def table_get_put(h, pos):
        e = table_ref[h]
        table_ref[h] = (epoch << 16) | pos
        cand = e & 0xFFFF
        valid = (e >> 16) == epoch
        return cand, valid

    def match_len(c, s):
        """Length of the common prefix of input[c..] / input[s..] capped at
        n (word compare then byte tail, findMatchLength analog).

        Both cursors advance by 4, so the funnel shifts are constant along
        the loop — hoisted once (same trick as the decoder's copy engine).
        """
        sh_c = (c & 3) * 8
        mc = (jnp.int32(1) << (32 - sh_c)) - 1
        cw = c >> 2
        sh_s = (s & 3) * 8
        ms = (jnp.int32(1) << (32 - sh_s)) - 1
        sw = s >> 2

        def ld(bw, k, sh, m):
            wa = in_ref[0, 0, bw + k]
            wb = in_ref[0, 0, bw + k + 1]
            return jax.lax.select(sh == 0, wa, ((wa >> sh) & m) | (wb << (32 - sh)))

        def wcond(st):
            k, _ = st
            return (s + 4 * k + 4 <= n) & (
                ld(cw, k, sh_c, mc) == ld(sw, k, sh_s, ms)
            )

        def wbody(st):
            k, ml = st
            return k + 1, ml + 4

        k, ml = jax.lax.while_loop(wcond, wbody, (jnp.int32(0), jnp.int32(0)))

        def bcond(st):
            c_, s_, _ = st
            return (s_ < n) & (gbyte(c_) == gbyte(s_))

        def bbody(st):
            c_, s_, ml = st
            return c_ + 1, s_ + 1, ml + 1

        _, _, ml = jax.lax.while_loop(bcond, bbody, (c + ml, s + ml, ml))
        return ml

    # table mask per the reference's input-dependent sizing
    # (encoder.nim:27-34): smallest power of two in [256, 16384] >= n.
    def ts_body(st):
        ts = st
        return ts * 2

    tsize = jax.lax.while_loop(
        lambda ts: (ts < TABLE_SIZE) & (ts < n), ts_body, jnp.int32(256)
    )
    mask = tsize - 1

    ip_limit = n - INPUT_MARGIN

    # Single flattened while loop replacing the reference's nested loops:
    #   phase 0: probing for a match (literal pending from next_emit)
    #   phase 1: emitting/chaining copies
    # done=1 when the probe target crosses ip_limit (remainder flushed by
    # the caller of flat_body's loop).
    # st = (ip, next_emit, op, done, cand, skip, phase)
    def flat_body(st):
        ip, next_emit, op, done, cand, skip, phase = st

        def do_probe(args):
            ip, next_emit, op, cand, skip = args
            u = load32(ip)
            h = hash32(u, mask)
            bbh = skip >> 5
            next_ip = ip + bbh
            c, valid = table_get_put(h, ip)
            hit = valid & (load32(c) == u)
            probe_done = (~hit) & (next_ip > ip_limit)

            def on_hit(a):
                ip, next_emit, op = a
                op2 = jax.lax.cond(
                    ip > next_emit,
                    lambda o: emit_literal(o, next_emit, ip - next_emit),
                    lambda o: o,
                    op,
                )
                return ip, ip, op2

            ip2, ne2, op2 = jax.lax.cond(
                hit, on_hit, lambda a: a, (ip, next_emit, op)
            )
            ip3 = jax.lax.select(hit, ip2, next_ip)
            return (
                ip3,
                ne2,
                op2,
                jax.lax.select(probe_done, 1, 0),
                c,
                skip + bbh,
                jax.lax.select(hit, 1, 0),
            )

        def do_copy(args):
            ip, next_emit, op, cand, skip = args
            ml = 4 + match_len(cand + 4, ip + 4)
            op2 = emit_copy(op, ip - cand, ml)
            ip2 = ip + ml
            over = ip2 > ip_limit

            def chain(a):
                ip2, op2 = a
                h1 = hash32(load32(ip2 - 1), mask)
                table_ref[h1] = (epoch << 16) | (ip2 - 1)
                u = load32(ip2)
                h = hash32(u, mask)
                c2, valid2 = table_get_put(h, ip2)
                hit2 = valid2 & (load32(c2) == u)
                return c2, hit2

            c2, hit2 = jax.lax.cond(
                over, lambda a: (jnp.int32(0), jnp.bool_(False)), chain, (ip2, op2)
            )
            # Stay in copy phase on a chained hit; else back to probing with
            # a fresh skip budget, with the first probe at ip2+1 (the
            # reference's outer loop does nextEmit = ip; ip += 1 — probing
            # at ip2 itself would self-match the entry just inserted and
            # emit an illegal offset-0 copy).
            return (
                jax.lax.select(hit2, ip2, ip2 + 1),
                ip2,
                op2,
                jax.lax.select(over, 1, 0),
                c2,
                jnp.int32(32),
                jax.lax.select(hit2, 1, 0),
            )

        ip, next_emit, op, done, cand, skip, phase = jax.lax.cond(
            phase == 0, do_probe, do_copy, (ip, next_emit, op, cand, skip)
        )
        return ip, next_emit, op, done, cand, skip, phase

    def run_main(op0):
        st = (
            jnp.int32(1),  # ip (reference starts matching at 1)
            jnp.int32(0),  # next_emit
            op0,
            jnp.int32(0),  # done
            jnp.int32(0),  # cand
            jnp.int32(32),  # skip
            jnp.int32(0),  # phase
        )
        ip, next_emit, op, done, cand, skip, phase = jax.lax.while_loop(
            lambda s: s[3] == 0, flat_body, st
        )
        # remainder literal
        op = jax.lax.cond(
            next_emit < n,
            lambda o: emit_literal(o, next_emit, n - next_emit),
            lambda o: o,
            op,
        )
        return op

    op_final = jax.lax.cond(
        n < MIN_NON_LITERAL,
        lambda _: jax.lax.cond(
            n > 0, lambda o: emit_literal(o, 0, n), lambda o: o, jnp.int32(0)
        ),
        run_main,
        jnp.int32(0),
    )
    elen_ref[0, 0, 0] = op_final


def _call(meta, in_words, nb: int, interpret: bool):
    return pl.pallas_call(
        _kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, 1, IN_WORDS + 4), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
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
        scratch_shapes=[pltpu.SMEM((TABLE_SIZE,), jnp.int32)],
        interpret=interpret,
    )(meta, in_words)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _encode_blocks_words_jit(meta, in_words, nb: int, interpret: bool):
    return _call(meta, in_words, nb, interpret)


def encode_blocks_words(meta, in_words, nb: int, interpret=None):
    """Encode ``nb`` independent <= 64 KiB blocks to raw tag streams.

    meta: int32 [nb, 1, 1] — block length per chunk
    in_words: int32 [nb, 1, IN_WORDS + 4] — packed LE bytes, zero-padded
    Returns (enc_words [nb, 1, ENC_WORDS], enc_len [nb, 1, 1]).
    """
    if interpret is None:
        from . import decode_scalar

        interpret = decode_scalar._forced_interpret()
    return _encode_blocks_words_jit(meta, in_words, nb, bool(interpret))


def pack_blocks(blocks):
    """Pack byte blocks into the kernel layout."""
    nb = len(blocks)
    arr = np.zeros((nb, 1, 4 * (IN_WORDS + 4)), dtype=np.uint8)
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
