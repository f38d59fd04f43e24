"""On-chip mutation differential: random valid streams + mutants through
the COMPILED kernels (chunk slab via decode_batch, grid stream via
raw_uncompress) vs the host C decoder.  Interpret-mode fuzz covers the
kernel LOGIC; this covers the Mosaic-compiled code on real hardware,
where e.g. SMEM clamp behavior differs from the interpreter."""
import random
import sys
sys.path.insert(0, '/root/repo')
import snappy_tpu as s
from snappy_tpu import engine

import os
rng = random.Random(int(os.environ.get('SEED', '20260820')))

def payload(n):
    word = bytes(rng.randrange(256) for _ in range(rng.randrange(2, 17)))
    rep = (word * (n // len(word) + 1))[: n // 2]
    return rep + bytes(rng.getrandbits(8) for _ in range(n - len(rep)))

def mutate(b):
    b = bytearray(b)
    op = rng.randrange(4)
    if op == 0 and len(b) > 1:
        b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
    elif op == 1 and len(b) > 2:
        del b[rng.randrange(1, len(b)):]
    elif op == 2:
        p = rng.randrange(len(b) + 1)
        b[p:p] = bytes(rng.getrandbits(8) for _ in range(rng.randrange(1, 4)))
    elif len(b) > 4:
        lo = rng.randrange(len(b) - 2)
        hi = min(len(b), lo + rng.randrange(1, 8))
        b[hi:hi] = b[lo:hi]
    return bytes(b)

N_BATCHES = 25
BATCH = 24
div = 0
for t in range(N_BATCHES):
    encs = []
    for _ in range(BATCH):
        p = payload(rng.randrange(30, 200_000))
        e = s.encode(p)
        if rng.random() < 0.6:
            e = mutate(e)
        encs.append(e)
    dev = engine.raw_uncompress_batch(encs, backend="device")
    host = [engine.raw_uncompress(e, backend="host") for e in encs]
    for k, (d, h) in enumerate(zip(dev, host)):
        if (d[0] is None) != (h[0] is None) or d[0] != h[0]:
            div += 1
            print(f"DIVERGENCE batch {t} stream {k}: dev={d[1]} host={h[1]}")
    print(f"batch {t+1}/{N_BATCHES} ok", flush=True)
print(f"DONE: {N_BATCHES*BATCH} mutants on hardware, {div} divergences")
assert div == 0
