"""Pallas TPU kernel: fused CRC32C over 64 KiB chunks, fully VMEM-resident.

The XLA bit-serial implementation (crc32c_jax) round-trips its loop
carriers through HBM (~3 ms per 4 MiB batch).  This kernel keeps the whole
computation on-chip: 32 unrolled LFSR clocks turn each 4-byte word into its
zero-init CRC register, then a contiguous-halves binary fold combines lane
registers with precomputed GF(2) "advance by 2^j bytes" matrices — halves
(not even/odd pairs) keep every slice contiguous, which Mosaic handles
natively.  No gathers, no strided lane ops.

Only the zero-pad cancellation and snappy masking stay outside (scalar per
chunk, negligible).  Falls back transparently off-TPU.

Standalone op, not wired into the engine pipelines: fusing this kernel into
the decode_chunks jit graph made the remote Mosaic compile pathological
(20+ minutes), while standalone it compiles in ~1 minute and runs at parity
with the XLA bit-serial path (~1 GB/s on a tunneled v5e; per-iteration loop
overhead dominates both).  Callers who want the VMEM-resident kernel use
this module directly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import crc32c_jax

_ROWS = 8  # chunks per grid step ([8, lanes] compiles fast; bigger blocks choke Mosaic)
_POLY = 0x82F63B78


def _fold_matrices(lanes: int):
    """Shift matrices for the halves fold: level k combines halves of
    (lanes >> (k+1)) lanes = that many *4 bytes."""
    fwd, _ = crc32c_jax._shift_matrices()
    mats = []
    half = lanes // 2
    while half >= 1:
        byte_shift = half * 4
        j = byte_shift.bit_length() - 1  # byte_shift = 2^j
        mats.append(np.asarray(fwd[j]))
        half //= 2
    return mats


def _kernel_factory(lanes: int, n_levels: int):
    # Loops use fori_loop — inside Pallas the carriers live in VMEM/
    # registers, so loop form costs nothing at run time but keeps the graph
    # (and the minutes-per-op remote compile) small.  The per-level fold
    # matrices arrive as an SMEM input (Pallas forbids captured constants).
    def kernel(mats_ref, words_ref, out_ref):
        x = words_ref[:]  # [R, lanes] uint32: LE words, zero-padded

        # Feedback via (0 - m) & poly: integer multiply is microcoded on
        # the VPU — the mask form measured 1.63 vs 1.22 GB/s (e8).
        def clock(_, x):
            m = x & jnp.uint32(1)
            return (x >> 1) ^ ((jnp.uint32(0) - m) & jnp.uint32(_POLY))

        x = jax.lax.fori_loop(0, 32, clock, x)

        half = lanes // 2
        for level in range(n_levels):  # shapes shrink: stays unrolled
            left = x[:, :half]
            right = x[:, half : 2 * half]

            def mat_bit(i, acc):
                bit = (left >> jnp.uint32(i)) & jnp.uint32(1)
                return acc ^ (mats_ref[level, i] & (jnp.uint32(0) - bit))

            x = jax.lax.fori_loop(0, 32, mat_bit, jnp.zeros_like(left)) ^ right
            half //= 2
        out_ref[:] = jnp.broadcast_to(x[:, :1], out_ref.shape)

    return kernel


@functools.partial(jax.jit, static_argnums=(1, 2))
def _lane_fold_pallas(
    words: jnp.ndarray, lanes: int, interpret: bool = False
) -> jnp.ndarray:
    """words: [N, lanes] uint32 -> folded zero-init register per chunk [N].

    ``interpret=True`` runs the kernel body through the Pallas interpreter —
    how the CPU test suite pins the kernel's semantics without TPU hardware.
    """
    n = words.shape[0]
    mats = np.stack([m.astype(np.uint32) for m in _fold_matrices(lanes)])
    out = pl.pallas_call(
        _kernel_factory(lanes, mats.shape[0]),
        grid=(n // _ROWS,),
        in_specs=[
            pl.BlockSpec(
                (mats.shape[0], 32), lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((_ROWS, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, 128), jnp.uint32),
        interpret=interpret,
    )(jnp.asarray(mats), words)
    return out[:, 0]


def available() -> bool:
    try:
        plat = jax.devices()[0].platform
        dev = str(jax.devices()[0])
    except Exception:
        return False
    return plat in ("tpu", "axon") or "TPU" in dev


@functools.partial(jax.jit, static_argnums=(2, 3))
def _pallas_path(chunks, lengths, padded_len: int, interpret: bool = False):
    n = chunks.shape[0]
    lanes = padded_len // 4
    b = chunks.astype(jnp.uint32).reshape(n, lanes, 4)
    words = b[:, :, 0] | (b[:, :, 1] << 8) | (b[:, :, 2] << 16) | (b[:, :, 3] << 24)
    reg = _lane_fold_pallas(words, lanes, interpret)
    reg = reg ^ jnp.uint32(crc32c_jax._init_term(padded_len))
    # Cancel the zero tail, invert, mask (same as the XLA path).
    _, inv = crc32c_jax._shift_matrices()
    pad = (jnp.int32(padded_len) - lengths).astype(jnp.uint32)
    for j in range(17):
        cols = jnp.asarray(inv[j])
        bit = (pad >> jnp.uint32(j)) & jnp.uint32(1)
        reg = jnp.where(bit == 1, crc32c_jax._mat_apply_jnp(cols, reg), reg)
    return crc32c_jax.mask_crc(reg ^ jnp.uint32(0xFFFFFFFF))


def masked_crc32c_chunks(
    chunks: jnp.ndarray, lengths: jnp.ndarray, padded_len: int
) -> jnp.ndarray:
    """Drop-in for crc32c_jax.masked_crc32c_chunks on TPU-friendly shapes."""
    n = chunks.shape[0]
    lanes = padded_len // 4
    if (
        not available()
        or padded_len % 4
        or lanes & (lanes - 1)
        or lanes < 256
        or n % _ROWS
    ):
        return crc32c_jax.masked_crc32c_chunks(chunks, lengths, padded_len)
    return _pallas_path(chunks, lengths, padded_len)
