"""E23: scalar-core int32 multiply cost (is the encoder's hash multiply a
lever?).

The VPU's int32 multiply is microcoded (~30% slower than shift tricks in
tight loops, see crc32c work).  The scalar core handles address math all
day, but its multiply latency is unmeasured.  Two kernels run N dependent
iterations of the encoder's hash step: (a) `(u * 0x1E35A7BD) >> 18`,
(b) a shift-add CSD decomposition of the same constant.  If (b) wins, the
encoder probe loop gets a cheaper hash; if (a) wins or ties, record the
negative result.

MEASURED (TPU v5 lite0, 2026-08-17): mult 24.1-24.8 ns/iter, shifts
26.8-29.7 ns/iter over a ~4-op dependent chain — the scalar core's int32
multiply costs about the same as one shift-add pair.  NEGATIVE: the hash
multiply is not a lever; do not retry CSD decompositions.
"""
import sys, time
sys.path.insert(0, '/root/repo')
import functools
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compilation")

N = 200_000

def mk(kind):
    def kernel(x_ref, o_ref):
        def body(i, u):
            if kind == "mult":
                h = (u * jnp.int32(0x1E35A7BD)) >> 18
            else:
                # 0x1E35A7BD = 0b0001_1110_0011_0101_1010_0111_1011_1101
                # CSD-ish: (1<<29)-(1<<25)+(1<<21)+... too many terms to
                # win unless mult is very slow; use a coarse 6-term
                # approximation JUST FOR TIMING (not a valid hash):
                h = ((u << 29) - (u << 25) + (u << 21) + (u << 13)
                     - (u << 6) + u) >> 18
            return (u ^ h) + i  # dependent chain

        o_ref[0, 0, 0] = jax.lax.fori_loop(0, N, body, x_ref[0, 0, 0])
    return kernel

@functools.partial(jax.jit, static_argnums=(1,))
def run(x, kind):
    return pl.pallas_call(
        mk(kind),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1, 1), jnp.int32),
    )(x)

def sync(r): np.asarray(jax.device_get(r.reshape(-1)[:1]))

x = jax.device_put(jnp.ones((1, 1, 1), jnp.int32))
for kind in ("mult", "shifts", "mult", "shifts"):
    r = run(x, kind); sync(r)
    t0 = time.time(); NIT = 8
    for _ in range(NIT):
        r = run(x, kind)
    sync(r)
    dt = (time.time() - t0) / NIT
    print("%-7s %5.2f ms for %d iters -> %5.2f ns/iter"
          % (kind, dt*1e3, N, dt/N*1e9))
