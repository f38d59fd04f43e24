"""E11: streaming raw decoder on the chip — correctness + 47MB throughput."""
import sys, time
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compilation")
import random
import snappy_tpu as s
from snappy_tpu.formats import varint
from snappy_tpu.ops import decode_stream as dst

rng = random.Random(3)
cases = [
    ("rle-a", b"a" * 200_000),
    ("rle-ab", b"ab" * 100_000),
    ("text", (b"the quick brown fox jumps over the lazy dog. " * 5000)[:180_000]),
    ("random", bytes(rng.randbytes(150_000))),
    ("64k+1", b"y" * 65537),
    ("mixed", (b"z" * 70000) + bytes(rng.randbytes(80_000)) + (b"qw" * 30000)),
    ("html", open('/root/reference/tests/data/html','rb').read()),
    ("urls", open('/root/reference/tests/data/urls.10K','rb').read()),
]
nfail = 0
for name, payload in cases:
    enc = s.encode(payload)
    _, v = varint.decode_uint32(enc)
    t0 = time.time()
    out, reason = dst.decode_raw_stream_bytes(enc[v:], len(payload))
    ok = reason == "ok" and out == payload
    if not ok: nfail += 1
    print("%-8s len=%8d %s (%.1fs)" % (name, len(payload), "OK" if ok else "FAIL "+reason, time.time()-t0))
print("failures:", nfail)

# 47MB raw stream timing (device-resident input, one scan dispatch)
data47 = (b"".join(open('/root/reference/tests/data/'+n,'rb').read() for n in
    ("html","urls.10K","alice29.txt","lcet10.txt","plrabn12.txt")) * 25)[:47_000_000]
enc = s.encode(data47)
_, v = varint.decode_uint32(enc)
body = enc[v:]
comp_len = len(body)
w_needed = -(-comp_len // 4) + dst.SC_WORDS + 8
buf = np.zeros((w_needed * 4,), dtype=np.uint8)
buf[:comp_len] = np.frombuffer(body, np.uint8)
full_words = jax.device_put(jnp.asarray(buf.view(np.int32)))
steps = dst._n_steps(comp_len, len(data47))
print("steps:", steps, "comp:", comp_len)
def sync(x): np.asarray(jax.device_get(x.reshape(-1)[:1]))
t0 = time.time()
windows, writtens, status = dst.decode_raw_stream(full_words, jnp.int32(comp_len), jnp.int32(len(data47)), steps, False)
sync(status)
print("compile+first: %.1fs  status:" % (time.time()-t0), np.asarray(status))
for _ in range(2):
    t0 = time.time()
    windows, writtens, status = dst.decode_raw_stream(full_words, jnp.int32(comp_len), jnp.int32(len(data47)), steps, False)
    sync(status)
    dt = time.time()-t0
    print("47MB raw stream decode: %.0f ms (%.1f MB/s)" % (dt*1e3, len(data47)/dt/1e6))
# verify bytes
writtens_h = np.asarray(writtens)
win_b = np.ascontiguousarray(np.asarray(windows)).view(np.uint8)
parts = [win_b[k, :int(writtens_h[k])].tobytes() for k in range(steps) if writtens_h[k]]
print("bytes correct:", b"".join(parts) == data47)
