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

STATUS — measured on the tunneled v5e (2026-08-17): 0.70 GB/s, LOSING to
the bit-serial VPU path (1.3-1.6 GB/s with the multiply-free feedback).
The MXU contraction itself is cheap (~1 GMAC per 4 MiB); the cost is the
bit-unpack materialization (33 MB of int8 bit-planes per 4 MiB round-
tripping through HBM) plus deep-K/narrow-N matmul underutilization.  A
Pallas-fused variant (unpack in VMEM, per-step matmul) is the plausible
rescue; until then this module is a validated ALTERNATIVE, not the default
— crc32c_jax remains the production path.  Kept because the construction
is exact everywhere (CPU-tested) and may win on parts with faster narrow
matmuls.

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
    return jnp.asarray(A), jnp.asarray(B)


def _registers(chunks: jnp.ndarray) -> jnp.ndarray:
    """Zero-init CRC registers for [N, 65536] int32 byte-value chunks."""
    A, B = _matrices()
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
