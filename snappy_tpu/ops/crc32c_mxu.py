"""CRC32C as GF(2) linear algebra on the MXU.

CRC is linear over GF(2): the (zero-initialized) CRC register of a message
is a fixed bit-matrix applied to the message bits, where each bit's column
depends only on its distance from the end.  That turns the whole per-chunk
CRC into two dense int8 matmuls with PRECOMPUTED matrices — exactly the
workload a TPU's systolic array is built for, replacing the bit-serial VPU
LFSR (crc32c_jax, ~1.2-1.6 GB/s measured) with MXU contractions:

  stage 1: per 512-byte super-lane s,
           R_s = A · bits(superlane_s)         A: [4096, 32] fixed
  stage 2: R   = B · concat_bits(R_0..R_127)   B: [4096, 32] fixed

Both A and B are assembled on the host from the byte-shift matrices the
lane-fold path already computes (crc32c_jax._shift_matrices).  Intermediate
sums are exact in int32 (<= 4096 per dot), reduced mod 2 with a mask.
Everything else (zero-tail cancellation for ragged lengths, the init term,
snappy masking) reuses the existing machinery.

Works under plain XLA — no Pallas, runs identically on CPU for tests.

STATUS — measured on the tunneled v5e (2026-08-17):

* plain-XLA path below: 0.70 GB/s (bit-plane materialization round-trips
  33 MB per 4 MiB through HBM);
* Pallas-fused variant (`masked_crc32c_chunks_fused`, bit-planes unpacked
  in VMEM, 32 per-bit-plane int8 matmuls): **1.68 GB/s**, on par with the
  best bit-serial VPU path (1.63 GB/s) — the (1024,128)@(128,128) plane
  matmuls hit the same narrow-shape MXU ceiling (~3 TMAC/s) measured in
  experiments/e2b.

Three independent formulations (VPU bit-serial, VMEM Pallas, MXU GF(2))
converge at ~1.6-1.7 GB/s on this part; crc32c_jax remains the default
(no Pallas compile cost).  This module stays as the validated alternative
— on parts with healthier narrow-matmul throughput the same matrices
should scale well past it.

Fixed geometry: chunks of padded_len = 65536 bytes (the framed pipeline's
shape); other padded sizes fall back to crc32c_jax.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import crc32c_jax

_PADDED = 65536
_SUPER_BYTES = 512  # super-lane: 512 bytes = 4096 bits
_N_SUPER = _PADDED // _SUPER_BYTES  # 128
_SBITS = _SUPER_BYTES * 8  # 4096


@functools.cache
def _matrices():
    """(A, B): stage-1 and stage-2 GF(2) matrices as int8 [4096, 32].

    Column layout: A[b, r] = bit r of the final-register contribution of
    message bit b of a super-lane (bits in stream order, LSB-first per
    byte).  B likewise for the 32-bit stage-1 registers of the 128
    super-lanes in order.
    """
    # Contribution of one message BYTE at distance d bytes from the chunk
    # end: the byte enters the register (reflected: its 8 bits occupy the
    # low byte) and is then advanced d bytes.  Equivalently bit j of the
    # byte contributes shift_matrix_bytes(d + 1)... — derive directly from
    # the one-byte step operator instead: processing byte x updates
    # c' = (c >> 8) ^ T0[(c ^ x) & 0xff]; for c = 0 the contribution of
    # bit j is T0[1 << j] advanced by the remaining bytes.
    t0 = crc32c_jax._tables()[0]
    fwd, _ = crc32c_jax._shift_matrices()

    def shift_cols(k: int) -> np.ndarray:
        return crc32c_jax._shift_matrix_bytes(k)

    A = np.zeros((_SBITS, 32), dtype=np.int8)
    for byte_idx in range(_SUPER_BYTES):
        remaining = _SUPER_BYTES - 1 - byte_idx  # bytes after this one
        adv = shift_cols(remaining)
        for j in range(8):
            contrib = crc32c_jax._mat_apply_np(adv, int(t0[1 << j]))
            for r in range(32):
                A[byte_idx * 8 + j, r] = (contrib >> r) & 1

    B = np.zeros((_SBITS, 32), dtype=np.int8)
    for s in range(_N_SUPER):
        remaining = (_N_SUPER - 1 - s) * _SUPER_BYTES
        adv = shift_cols(remaining)
        for r_in in range(32):
            contrib = crc32c_jax._mat_apply_np(adv, 1 << r_in)
            for r in range(32):
                B[s * 32 + r_in, r] = (contrib >> r) & 1
    # Cache PLAIN numpy: this can first be called inside a jit trace, and
    # caching trace-scoped constants would poison later traces.
    return A, B


def _registers(chunks: jnp.ndarray) -> jnp.ndarray:
    """Zero-init CRC registers for [N, 65536] int32 byte-value chunks."""
    A, B = (jnp.asarray(m) for m in _matrices())
    n = chunks.shape[0]
    shifts = jnp.arange(8, dtype=jnp.int32)
    bits = ((chunks[..., None] >> shifts) & 1).astype(jnp.int8)  # [N, P, 8]
    bits = bits.reshape(n * _N_SUPER, _SBITS)
    r1 = jnp.dot(bits, A, preferred_element_type=jnp.int32) & 1  # [N*128, 32]
    r1 = r1.astype(jnp.int8).reshape(n, _N_SUPER * 32)
    r2 = jnp.dot(r1, B, preferred_element_type=jnp.int32) & 1  # [N, 32]
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, :]
    return jnp.sum(r2.astype(jnp.uint32) * weights, axis=1).astype(jnp.uint32)


@functools.partial(jax.jit, static_argnums=(2,))
def masked_crc32c_chunks(chunks: jnp.ndarray, lengths: jnp.ndarray, padded_len: int):
    """Drop-in for crc32c_jax.masked_crc32c_chunks at padded_len=65536."""
    if padded_len != _PADDED:
        return crc32c_jax.masked_crc32c_chunks(chunks, lengths, padded_len)
    reg = _registers(chunks)
    reg = reg ^ jnp.uint32(crc32c_jax._init_term(_PADDED))
    _, inv = crc32c_jax._shift_matrices()
    pad = (jnp.int32(_PADDED) - lengths).astype(jnp.uint32)
    for j in range(17):
        cols = jnp.asarray(inv[j])
        bit = (pad >> jnp.uint32(j)) & jnp.uint32(1)
        reg = jnp.where(
            bit == 1, crc32c_jax._mat_apply_jnp(cols, reg), reg
        )
    return crc32c_jax.mask_crc(reg ^ jnp.uint32(0xFFFFFFFF))


# ---------------------------------------------------------------------------
# Pallas-fused variant: unpack bits in VMEM, contract on the MXU
# ---------------------------------------------------------------------------
#
# The plain-XLA path above loses to HBM traffic: the int8 bit-planes
# (8 bytes per message byte) round-trip through main memory.  Fused in a
# Pallas kernel the bit-planes live and die in VMEM; only the chunk words
# stream in.

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

_ROWS = 8  # chunks per grid step


@functools.cache
def _a_planes():
    """Stage-1 matrix regrouped as 32 bit-plane matrices.

    Plane j is [128 words, 128 cols] int8 with rows A[w*32 + j, :32] zero-
    padded to 128 columns, stacked into one [32*128, 128] array so the
    kernel slices planes statically.
    """
    A, _ = _matrices()
    planes = np.zeros((32 * 128, 128), dtype=np.int8)
    for j in range(32):
        for w in range(128):
            planes[j * 128 + w, :32] = A[w * 32 + j, :]
    return planes


def _fused_kernel(a_ref, words_ref, out_ref):
    # words_ref: [1024, 128] int32 — 8 chunks x 128 superlanes, 128 LE
    # words per superlane.  Stage 1 only; no reshapes (Mosaic-safe):
    # R = sum_j plane_j(bits) @ A_j, contracted per bit position j.
    x = words_ref[:]
    acc = jnp.zeros((x.shape[0], 128), dtype=jnp.int32)
    for j in range(32):
        p = ((x >> j) & 1).astype(jnp.int8)
        acc = acc + jax.lax.dot_general(
            p,
            a_ref[j * 128 : (j + 1) * 128, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    bits = acc & 1  # [1024, 128]; columns >= 32 are zero
    weights = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    w32 = jnp.where(weights < 32, jnp.int32(1) << (weights & 31), 0)
    reg = jnp.sum(bits * w32, axis=1, keepdims=True)  # [1024, 1]
    out_ref[:] = jnp.broadcast_to(reg, out_ref.shape)


@functools.partial(jax.jit, static_argnums=(1,))
def _fused_registers(words: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """words: [N, 16384] int32 LE words -> zero-init CRC registers [N].

    The Pallas kernel produces per-SUPERLANE registers (stage 1); the 128
    superlane registers per chunk are folded with the existing GF(2)
    combine tree in XLA (7 levels over tiny arrays).
    """
    n = words.shape[0]
    A = jnp.asarray(_a_planes())
    rows = words.reshape(n * _N_SUPER, _SBITS // 32)
    out = pl.pallas_call(
        _fused_kernel,
        grid=((n * _N_SUPER) // (_ROWS * _N_SUPER),),
        in_specs=[
            pl.BlockSpec((32 * 128, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (_ROWS * _N_SUPER, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (_ROWS * _N_SUPER, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n * _N_SUPER, 128), jnp.int32),
        interpret=interpret,
    )(A, rows)
    regs = out[:, 0].astype(jnp.uint32).reshape(n, _N_SUPER)

    # Fold the 128 per-superlane (512-byte) registers per chunk: level j
    # combines halves spanning 512 * 2^j bytes.
    fwd, _ = crc32c_jax._shift_matrices()
    base = 9  # 512 = 2^9 bytes
    level = 0
    regs = regs.T  # [128, n]
    while regs.shape[0] > 1:
        cols = jnp.asarray(fwd[base + level])
        left, right = regs[0::2], regs[1::2]
        regs = crc32c_jax._mat_apply_jnp(cols, left) ^ right
        level += 1
    return regs[0]


def fused_available() -> bool:
    try:
        plat = jax.devices()[0].platform
        dev = str(jax.devices()[0])
    except Exception:  # pragma: no cover
        return False
    return plat in ("tpu", "axon") or "TPU" in dev


@functools.partial(jax.jit, static_argnums=(2, 3))
def masked_crc32c_chunks_fused(
    chunks: jnp.ndarray, lengths: jnp.ndarray, padded_len: int, interpret: bool = False
):
    """Pallas-fused MXU CRC; chunks [N, 65536] int32 bytes, N % 8 == 0."""
    if padded_len != _PADDED:
        return crc32c_jax.masked_crc32c_chunks(chunks, lengths, padded_len)
    n = chunks.shape[0]
    b = chunks.reshape(n, _PADDED // 4, 4)
    words = b[:, :, 0] | (b[:, :, 1] << 8) | (b[:, :, 2] << 16) | (b[:, :, 3] << 24)
    reg = _fused_registers(words, interpret)
    reg = reg ^ jnp.uint32(crc32c_jax._init_term(_PADDED))
    _, inv = crc32c_jax._shift_matrices()
    pad = (jnp.int32(_PADDED) - lengths).astype(jnp.uint32)
    for j in range(17):
        cols = jnp.asarray(inv[j])
        bit = (pad >> jnp.uint32(j)) & jnp.uint32(1)
        reg = jnp.where(bit == 1, crc32c_jax._mat_apply_jnp(cols, reg), reg)
    return crc32c_jax.mask_crc(reg ^ jnp.uint32(0xFFFFFFFF))
