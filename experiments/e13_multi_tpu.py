"""E13: multi-window streaming decoder on the chip."""
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
    ("text", (b"the quick brown fox jumps over the lazy dog. " * 9000)[:400_000]),
    ("random", bytes(rng.randbytes(150_000))),
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

data47 = (b"".join(open('/root/reference/tests/data/'+n,'rb').read() for n in
    ("html","urls.10K","alice29.txt","lcet10.txt","plrabn12.txt")) * 25)
enc = s.encode(data47)
_, v = varint.decode_uint32(enc)
body = enc[v:]
comp_len = len(body)
w_needed = -(-comp_len // 4) + dst.CALL_WORDS + dst.ALIGN_W + 8
buf = np.zeros((w_needed * 4,), dtype=np.uint8)
buf[:comp_len] = np.frombuffer(body, np.uint8)
full_words = jax.device_put(jnp.asarray(buf.view(np.int32)))
n_calls = dst._n_calls(len(data47))
print("n_calls:", n_calls)
def sync(x): np.asarray(jax.device_get(x.reshape(-1)[:1]))
t0 = time.time()
windows, writtens, status = dst.decode_raw_stream_multi(full_words, jnp.int32(comp_len), jnp.int32(len(data47)), n_calls, False)
sync(status)
print("compile+first: %.1fs status:" % (time.time()-t0), np.asarray(status))
for _ in range(2):
    t0 = time.time()
    windows, writtens, status = dst.decode_raw_stream_multi(full_words, jnp.int32(comp_len), jnp.int32(len(data47)), n_calls, False)
    sync(status)
    dt = time.time()-t0
    print("47MB raw (multi-window): %.0f ms (%.1f MB/s)" % (dt*1e3, len(data47)/dt/1e6))
wr = np.asarray(writtens).reshape(-1)
wb = np.ascontiguousarray(np.asarray(windows)).view(np.uint8).reshape(n_calls*dst.G_WINDOWS, -1)
parts = [wb[k, :int(wr[k])].tobytes() for k in range(len(wr)) if wr[k]]
print("bytes correct:", b"".join(parts) == data47)
