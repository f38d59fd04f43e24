"""On-chip encoder differential: random payloads through the COMPILED
scalar encoder (engine.raw_compress_batch, levels 1+2) — bytes must be
identical to the host C encoder (the cross-backend contract) and
decode back exactly."""
import random
import sys
sys.path.insert(0, '/root/repo')
import snappy_tpu as s
from snappy_tpu import engine

import os
rng = random.Random(int(os.environ.get('SEED', '40826')))

def payload(n):
    r = rng.random()
    if r < 0.25:
        return bytes([rng.randrange(256)]) * n                     # RLE
    if r < 0.5:
        word = bytes(rng.randrange(256) for _ in range(rng.randrange(2, 40)))
        return (word * (n // len(word) + 1))[:n]                   # periodic
    if r < 0.75:
        return bytes(rng.getrandbits(8) for _ in range(n))         # random
    word = bytes(rng.getrandbits(8) for _ in range(64))
    out = bytearray()
    while len(out) < n:                                            # mixed
        out += word[: rng.randrange(1, 64)]
        out += bytes(rng.getrandbits(8) for _ in range(rng.randrange(0, 20)))
    return bytes(out[:n])

N_BATCH = 12
B = 16
bad = 0
for t in range(N_BATCH):
    lvl = 1 + (t & 1)
    ps = [payload(rng.randrange(1, 180_000)) for _ in range(B)]
    dev = engine.raw_compress_batch(ps, backend="device", level=lvl)
    host = [engine.raw_compress(p, backend="host", level=lvl) for p in ps]
    for k, (d, h, p) in enumerate(zip(dev, host, ps)):
        if d != h:
            bad += 1
            print(f"BYTE DIVERGENCE batch {t} k {k} level {lvl}")
        if s.decode(d) != p:
            bad += 1
            print(f"ROUNDTRIP FAIL batch {t} k {k} level {lvl}")
    print(f"batch {t+1}/{N_BATCH} (level {lvl}) ok", flush=True)
print(f"DONE: {N_BATCH*B} payloads on hardware, {bad} failures")
assert bad == 0
