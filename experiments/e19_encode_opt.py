"""E19: encoder op-count reduction (same levers as e18 on the decoder).

Variants vs production ops/encode_scalar.py:
  * bulk_copy: fused 8-byte head (1 RMW + clobber-allowed full stores,
    no length>4 branch) + carried-word copy loops — the literal source
    (in_ref) and destination (enc_ref) are disjoint refs, so the carry
    is always safe;
  * emit_literal: branchless tag write — one unaligned word store covers
    all three tag sizes, garbage bytes repaired by the payload that
    always follows at op+ntag;
  * match_len: carried word loads (2 loads/iter instead of 4) and a
    branchless byte-tail computed from the XOR of the mismatching words
    (no dependent byte loop).

Run: python experiments/e19_encode_opt.py [interpret]
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
from snappy_tpu.ops import encode_scalar as es

IN_WORDS, ENC_WORDS, TABLE_SIZE = es.IN_WORDS, es.ENC_WORDS, es.TABLE_SIZE
IN_PAD = es.IN_PAD
_K_HASH, MIN_NON_LITERAL, INPUT_MARGIN = es._K_HASH, es.MIN_NON_LITERAL, es.INPUT_MARGIN


def _kernel_opt(meta_ref, in_ref, enc_ref, elen_ref, table_ref):
    n = meta_ref[0, 0, 0]
    epoch = pl.program_id(0) + 1

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
        """input[src0 .. src0+length) -> enc[dst0 ..); fused head +
        carried-word loops (sources never alias the output ref); spills
        <= 11 bytes past the end, repaired by later left-to-right writes."""
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
                sh_s == 0, wa, ((wa >> sh_s) & mm_s) | (wb << (32 - sh_s)))

        v0 = gsrc(jnp.int32(0))
        lo = enc_ref[0, 0, wi]
        enc_ref[0, 0, wi] = (lo & keep_d) | (v0 << sh_d)
        sp0 = (v0 >> (31 - sh_d) >> 1) & keep_d
        v1 = gsrc(jnp.int32(4))
        enc_ref[0, 0, wi + 1] = sp0 | (v1 << sh_d)
        enc_ref[0, 0, wi + 2] = (v1 >> (31 - sh_d) >> 1) & keep_d

        @pl.when(length > 8)
        def _():
            o0 = (((dst0 + 8) >> 2) << 2) - dst0   # in [5, 8]
            rem = length - o0
            wi0 = (dst0 + o0) >> 2
            s0 = src0 + o0
            sw2 = s0 >> 2
            sh2 = (s0 & 3) * 8
            mm2 = (jnp.int32(1) << (32 - sh2)) - 1

            @pl.when(sh2 == 0)
            def _():
                def body(st):
                    k, wo, si = st
                    enc_ref[0, 0, wo] = in_ref[0, 0, si]
                    enc_ref[0, 0, wo + 1] = in_ref[0, 0, si + 1]
                    return k + 8, wo + 2, si + 2
                jax.lax.while_loop(lambda st: st[0] < rem, body,
                                   (jnp.int32(0), wi0, sw2))

            @pl.when(sh2 != 0)
            def _():
                def body(st):
                    k, wo, si, carry = st
                    wa = in_ref[0, 0, si]
                    enc_ref[0, 0, wo] = ((carry >> sh2) & mm2) | (wa << (32 - sh2))
                    wb = in_ref[0, 0, si + 1]
                    enc_ref[0, 0, wo + 1] = ((wa >> sh2) & mm2) | (wb << (32 - sh2))
                    return k + 8, wo + 2, si + 2, wb
                jax.lax.while_loop(lambda st: st[0] < rem, body,
                                   (jnp.int32(0), wi0, sw2 + 1,
                                    in_ref[0, 0, sw2]))

    def emit_literal(op, src0, length):
        """Literal tag + payload (encoder.nim:44-79), branchless tag:
        the payload always starts at op+ntag <= op+3, so a full word
        store of the tag bytes is repaired by bulk_copy."""
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
        def long_body(st):
            op_, rem = st
            pbyte(op_, (63 << 2) | 2)
            pbyte(op_ + 1, offset & 255)
            pbyte(op_ + 2, (offset >> 8) & 255)
            return op_ + 3, rem - 64

        op, rem = jax.lax.while_loop(lambda st: st[1] >= 68, long_body,
                                     (op, length))

        def emit60(st):
            op_, rem_ = st
            pbyte(op_, (59 << 2) | 2)
            pbyte(op_ + 1, offset & 255)
            pbyte(op_ + 2, (offset >> 8) & 255)
            return op_ + 3, rem_ - 60

        op, rem = jax.lax.cond(rem > 64, emit60, lambda st: st, (op, rem))
        use1 = (rem < 12) & (offset < 2048)
        # branchless 2-3 byte tag via one unaligned word store: later
        # writes always start at op+2 or op+3 and repair the spill.
        tag1 = 1 | ((rem - 4) << 2) | ((offset >> 8) << 5) | ((offset & 255) << 8)
        tag2 = 2 | ((rem - 1) << 2) | ((offset & 255) << 8) | ((offset & 0xFF00) << 8)
        pword_u(op, jax.lax.select(use1, tag1, tag2))
        return op + jax.lax.select(use1, 2, 3)

    def hash32(u, mask):
        return ((u * jnp.int32(_K_HASH)) >> 18) & mask

    def table_get_put(h, pos):
        e = table_ref[h]
        table_ref[h] = (epoch << 16) | pos
        cand = e & 0xFFFF
        valid = (e >> 16) == epoch
        return cand, valid

    def match_len(c, st):
        """Common-prefix length of input[c..] / input[st..] capped at n.

        Carried word loads (2/iter) + branchless byte tail from the XOR
        of the final word pair (findMatchLength analog)."""
        sh_c = (c & 3) * 8
        mc = (jnp.int32(1) << (32 - sh_c)) - 1
        cw = c >> 2
        sh_s = (st & 3) * 8
        ms = (jnp.int32(1) << (32 - sh_s)) - 1
        sw = st >> 2

        def body(state):
            k, cc, cs, go, x = state
            nc = in_ref[0, 0, cw + k + 1]
            ns = in_ref[0, 0, sw + k + 1]
            vc = jax.lax.select(
                sh_c == 0, cc, ((cc >> sh_c) & mc) | (nc << (32 - sh_c)))
            vs = jax.lax.select(
                sh_s == 0, cs, ((cs >> sh_s) & ms) | (ns << (32 - sh_s)))
            x2 = vc ^ vs
            # allow the word straddling n (padding is zero-filled; the
            # final clip caps any spurious padding match), so full
            # reference match lengths survive without a byte-tail loop
            go2 = (x2 == 0) & (st + 4 * k + 8 <= n + 4)
            return k + 1, nc, ns, go2, x2

        k, _, _, _, x = jax.lax.while_loop(
            lambda state: state[3], body,
            (jnp.int32(0), in_ref[0, 0, cw], in_ref[0, 0, sw],
             jnp.bool_(True), jnp.int32(0)))
        # words 0..k-2 matched fully; word k-1 supplies the tail via x
        full = 4 * (k - 1)
        extra = (
            jax.lax.select((x & 255) == 0, 1, 0)
            + jax.lax.select((x & 0xFFFF) == 0, 1, 0)
            + jax.lax.select((x & 0xFFFFFF) == 0, 1, 0)
            + jax.lax.select(x == 0, 1, 0)
        )
        return jnp.clip(full + extra, 0, n - st)

    def ts_body(ts):
        return ts * 2

    tsize = jax.lax.while_loop(
        lambda ts: (ts < TABLE_SIZE) & (ts < n), ts_body, jnp.int32(256))
    mask = tsize - 1
    ip_limit = n - INPUT_MARGIN

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
                    lambda o: o, op)
                return ip, ip, op2

            ip2, ne2, op2 = jax.lax.cond(hit, on_hit, lambda a: a,
                                         (ip, next_emit, op))
            ip3 = jax.lax.select(hit, ip2, next_ip)
            return (ip3, ne2, op2, jax.lax.select(probe_done, 1, 0), c,
                    skip + bbh, jax.lax.select(hit, 1, 0))

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
                over, lambda a: (jnp.int32(0), jnp.bool_(False)), chain,
                (ip2, op2))
            return (jax.lax.select(hit2, ip2, ip2 + 1), ip2, op2,
                    jax.lax.select(over, 1, 0), c2, jnp.int32(32),
                    jax.lax.select(hit2, 1, 0))

        ip, next_emit, op, done, cand, skip, phase = jax.lax.cond(
            phase == 0, do_probe, do_copy, (ip, next_emit, op, cand, skip))
        return ip, next_emit, op, done, cand, skip, phase

    def run_main(op0):
        st = (jnp.int32(1), jnp.int32(0), op0, jnp.int32(0), jnp.int32(0),
              jnp.int32(32), jnp.int32(0))
        ip, next_emit, op, done, cand, skip, phase = jax.lax.while_loop(
            lambda s_: s_[3] == 0, flat_body, st)
        op = jax.lax.cond(
            next_emit < n,
            lambda o: emit_literal(o, next_emit, n - next_emit),
            lambda o: o, op)
        return op

    op_final = jax.lax.cond(
        n < MIN_NON_LITERAL,
        lambda _: jax.lax.cond(
            n > 0, lambda o: emit_literal(o, 0, n), lambda o: o,
            jnp.int32(0)),
        run_main, jnp.int32(0))
    elen_ref[0, 0, 0] = op_final


@functools.partial(jax.jit, static_argnums=(2,))
def _encode_opt(meta, in_words, nb):
    return pl.pallas_call(
        _kernel_opt,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, IN_PAD), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, ENC_WORDS), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb, 1, ENC_WORDS), jnp.int32),
            jax.ShapeDtypeStruct((nb, 1, 1), jnp.int32),
        ),
        scratch_shapes=[pltpu.SMEM((TABLE_SIZE,), jnp.int32)],
        interpret=INTERPRET,
    )(meta, in_words)


def sync(x):
    np.asarray(jax.device_get(x.reshape(-1)[:1]))


def check(blocks, enc_words, enc_lens):
    outs = es.unpack_enc(np.asarray(enc_words), np.asarray(enc_lens)[:, 0, 0])
    ok, tot = True, 0
    for blk, e in zip(blocks, outs):
        dec = s.decode(
            __import__('snappy_tpu.formats.varint', fromlist=['x'])
            .encode_uint32(len(blk)) + e)
        if dec != blk:
            ok = False
        tot += len(e)
    return ok, tot


if INTERPRET:
    import random
    rng = random.Random(11)
    streams = [
        b"", b"x", b"ab" * 500, bytes(rng.randbytes(997)),
        (b"abcdefgh" * 100) + bytes(rng.randbytes(100)),
        open('/root/reference/tests/data/alice29.txt', 'rb').read()[:4096],
        b"a" * 3000,
    ]
    meta, in_words = es.pack_blocks(streams)
    ew, el = _encode_opt(jnp.asarray(meta), jnp.asarray(in_words), len(streams))
    ok, tot = check(streams, ew, el)
    # size parity vs production oracle
    meta2, in2 = es.pack_blocks(streams)
    ew2, el2 = es.encode_blocks_words(jnp.asarray(meta2), jnp.asarray(in2),
                                      len(streams), interpret=True)
    _, tot2 = check(streams, ew2, el2)
    print("interpret: roundtrip_ok=%s size opt=%d prod=%d" % (ok, tot, tot2))
    sys.exit(0 if ok else 1)

FILES = ["html", "urls.10K", "alice29.txt", "fireworks.jpeg",
         "paper-100k.pdf", "plrabn12.txt"]
NB = 96
NIT = 10

for name in FILES:
    data = open('/root/reference/tests/data/' + name, 'rb').read()
    data = (data * ((NB * 65536) // len(data) + 1))[:NB * 65536]
    blocks = [data[i * 65536:(i + 1) * 65536] for i in range(NB)]
    meta, in_words = es.pack_blocks(blocks)
    meta, in_words = jnp.asarray(meta), jnp.asarray(in_words)
    total = sum(len(b) for b in blocks)
    row = "%-14s %5.0f KB" % (name, total / 1024)
    for label, fn in (
        ("prod", lambda: es.encode_blocks_words(meta, in_words, NB)),
        ("opt", lambda: _encode_opt(meta, in_words, NB)),
    ):
        ew, el = fn()
        sync(el)
        ok, tot = check(blocks, ew, el)
        t0 = time.time()
        for _ in range(NIT):
            ew, el = fn()
        sync(el)
        dt = (time.time() - t0) / NIT
        row += "  %s ok=%d sz=%d %7.2f ms %6.1f MB/s" % (
            label, ok, tot, dt * 1e3, total / dt / 1e6)
    print(row)
