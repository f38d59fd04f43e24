"""On-chip far-copy placement battery: random legal streams mixing
>64 KiB-reach tagCopy4 copies (served from flushed HBM), near copies,
and literals, with copies placed to straddle window boundaries — the
grid kernel's riskiest machinery (far service + pending resume, round
5).  Oracle-checked construction, device vs host differential."""
import random
import sys
sys.path.insert(0, '/root/repo')
from snappy_tpu import engine
from snappy_tpu.formats import varint
from snappy_tpu.testing import oracle

import os
rng = random.Random(int(os.environ.get('SEED', '777002')))

def build_stream():
    out = bytearray()
    body = bytearray()

    def lit(data):
        n = len(data)
        if n - 1 < 60:
            body.append((n - 1) << 2)
        else:
            ext = ((n - 1).bit_length() + 7) // 8
            body.append((59 + ext) << 2)
            body.extend((n - 1).to_bytes(ext, "little"))
        body.extend(data)
        out.extend(data)

    def copy(off, ln):
        while ln > 0:
            c = min(ln, 64)
            if c < 4:
                # tails < 4 bytes: emit as literal of the same bytes
                start = len(out) - off
                lit(bytes(out[start:start + c]))
                ln -= c
                continue
            body.append(((c - 1) << 2) | 3)
            body.extend(off.to_bytes(4, "little"))
            start = len(out) - off
            for i in range(c):
                out.append(out[start + i])
            ln -= c

    # seed history: ~90-150 KB of mixed data
    seed = rng.randrange(90_000, 150_000)
    lit(bytes(rng.getrandbits(8) for _ in range(seed)))
    # then a few hundred ops biased to land near 64 KiB boundaries
    for _ in range(rng.randrange(40, 140)):
        r = rng.random()
        if r < 0.45:
            # far copy: offset > 64 KiB (must stay <= written)
            off = rng.randrange(65_537, len(out))
            copy(off, rng.randrange(4, 300))
        elif r < 0.7:
            off = rng.randrange(1, min(len(out), 65_536))
            copy(off, rng.randrange(4, 300))
        else:
            lit(bytes(rng.getrandbits(8)
                      for _ in range(rng.randrange(1, 4000))))
        # occasionally pad output right up to a window boundary so the
        # NEXT op straddles it
        if rng.random() < 0.3:
            to_b = (-len(out)) % 65536
            if 0 < to_b < 3000:
                lit(bytes(rng.getrandbits(8) for _ in range(to_b - rng.randrange(0, min(to_b, 70)))))
    return varint.encode_uint32(len(out)) + bytes(body), bytes(out)

N = 50
for t in range(N):
    enc, expect = build_stream()
    ref, err = oracle.uncompress(enc)
    assert err is None and ref == expect, f"oracle mismatch {t}"
    dev, dr = engine.raw_uncompress(enc, backend="device")
    assert dr == "ok" and dev == expect, f"device mismatch {t} ({dr})"
    host, hr = engine.raw_uncompress(enc, backend="host")
    assert hr == "ok" and host == expect, f"host mismatch {t}"
    if (t + 1) % 10 == 0:
        print(f"{t+1}/{N} ok", flush=True)
print(f"DONE: {N} random far-copy placement streams, all bit-exact")
