"""E27: can precomputed unaligned-word banks speed the encoder probe loop?

The probe loop pays two funnel load32s per probe (u at ip, candidate
check at c) — each 2 SMEM loads + ~4 shift/select ops.  A bank
W[k][i] = LE word at byte 4i+k (k = p & 3), precomputed on the VPU from
a VMEM copy of the input and DMA'd to SMEM (4 x 16384 words = 256 KiB),
turns each load32 into 1 load + ~3 address ops.

Measured here, on-chip:
  0. SMEM capacity probe: does +256 KiB of scratch even compile?
  1. VPU bank precompute + VMEM->SMEM DMA cost per 64 KiB block
  2. probe-walk ns/probe: funnel variant vs bank variant (same walk,
     synthetic data, the table/hash/skip shape of the real loop)

Decision rule: implement in encode_scalar if the walk saves >= 20% and
the precompute costs <= ~8% of a block's encode time (~70 us).

python experiments/e27_probe_banks.py
"""
import sys, time
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compilation")

IN_W = 16384
BANK_W = 16384          # words per bank
_K = 0x1E35A7BD


def sync(x):
    np.asarray(jax.device_get(x.reshape(-1)[:1]))


def bench(fn, *args, nit=10):
    r = fn(*args)
    sync(r)
    t0 = time.time()
    for _ in range(nit):
        r = fn(*args)
    sync(r)
    return (time.time() - t0) / nit, r


# ---------------------------------------------------- 1: VPU bank precompute
def make_precompute():
    def k(inv_ref, out_ref, banks_smem, sem):
        # 1D unaligned vector loads give the next-word stream directly
        # (2D reshapes of non-tile-aligned slices fail to lower)
        T = inv_ref[0, 0, pl.ds(0, IN_W)]
        N = inv_ref[0, 0, pl.ds(1, IN_W)]
        for kk in range(4):
            if kk == 0:
                w = T
            else:
                sh = 8 * kk
                mask = jnp.int32((1 << (32 - sh)) - 1)
                w = ((T >> sh) & mask) | (N << (32 - sh))
            out_ref[0, kk, pl.ds(0, IN_W)] = w

        # DMA all four banks VMEM -> SMEM
        d = pltpu.make_async_copy(out_ref.at[0], banks_smem.at[0], sem)
        d.start(); d.wait()

    @jax.jit
    def call(x):
        return pl.pallas_call(
            k,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 4, BANK_W), jnp.int32),
            scratch_shapes=[pltpu.SMEM((1, 4, BANK_W), jnp.int32),
                            pltpu.SemaphoreType.DMA],
        )(x)
    return call


# --------------------------------------------------------- 2: probe walks
def make_walk(variant, n_probes):
    """variant: 'funnel' or 'bank'.  Walks p += 1 + tiny data-dependent
    step doing the real probe work: u, h, table rmw, candidate load."""
    def k(inv_ref, banks_ref, out_ref, table_ref):
        smem_in = inv_ref

        def z(i, c):
            table_ref[i] = 0
            return c
        jax.lax.fori_loop(0, 16384, z, 0)

        def load32_funnel(p):
            wa = smem_in[0, 0, p >> 2]
            wb = smem_in[0, 0, (p >> 2) + 1]
            sh = (p & 3) * 8
            lo = (wa >> sh) & ((jnp.int32(1) << (32 - sh)) - 1)
            return jax.lax.select(sh == 0, wa, lo | (wb << (32 - sh)))

        def load32_bank(p):
            return banks_ref[0, p & 3, p >> 2]

        ld = load32_funnel if variant == "funnel" else load32_bank

        def body(st):
            p, cnt, acc = st
            u = ld(p)
            h = ((u * jnp.int32(_K)) >> 18) & 16383
            c = table_ref[h]
            table_ref[h] = p
            hit = ld(c) == u
            p2 = p + 1 + (jax.lax.select(hit, acc, p) & 3)
            return p2 & 32767, cnt + 1, acc ^ u

        p, cnt, acc = jax.lax.while_loop(
            lambda st: st[1] < n_probes, body,
            (jnp.int32(0), jnp.int32(0), jnp.int32(0)))
        out_ref[0, 0] = acc + p

    @jax.jit
    def call(x, banks):
        return pl.pallas_call(
            k,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            scratch_shapes=[pltpu.SMEM((16384,), jnp.int32)],
        )(x, banks)
    return call


rng = np.random.default_rng(0)
inw = jnp.asarray(rng.integers(0, 2**31, size=(1, 1, IN_W + 128),
                               dtype=np.int32))

print("== 1: VPU bank precompute + DMA (per 64 KiB block) ==")
try:
    f = make_precompute()
    dt, banks = bench(f, inw)
    print("  %.1f us  (budget ~70 us)" % (dt * 1e6))
    bh = np.asarray(banks)
    flat = np.asarray(inw).reshape(-1).view(np.uint8)
    ok = True
    for kk in range(4):
        want = flat[kk:kk + 4 * BANK_W].view(np.int32) if kk == 0 else \
            np.frombuffer(flat[kk:kk + 4 * BANK_W].tobytes(), np.int32)
        if not np.array_equal(bh[0, kk, :len(want)], want[:BANK_W]):
            ok = False
            print("  bank %d WRONG" % kk)
    print("  banks byte-correct:", ok)
except Exception as e:
    import re
    msg = str(e)
    for ln in msg.splitlines():
        if "Mosaic" in ln or "implement" in ln or "aligned" in ln or "Expected" in ln or "error" in ln.lower():
            print("   ", ln.strip()[:220])
    sys.exit(1)

NP = 1 << 20
print("== 2: probe walk ns/probe ==")
banks3 = banks  # (1,4,BANK_W) int32 as SMEM input
for variant in ("funnel", "bank"):
    f = make_walk(variant, NP)
    dt, _ = bench(f, inw, banks3, nit=5)
    print("  %-6s: %6.2f ns/probe" % (variant, dt / NP * 1e9))
