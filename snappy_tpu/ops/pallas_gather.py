"""Pallas TPU kernel: arbitrary per-row gather over wide rows.

Mosaic's ``tpu.dynamic_gather`` handles tables up to one vreg wide (128
lanes).  This kernel builds a full-width gather (row length up to 64 Ki)
out of that primitive with a table sweep: for each 128-wide slice r of the
table row, lane-shuffle it by the low 7 index bits and merge where the high
bits equal r.  All VMEM-resident: ~C/128 vectorized steps instead of the
per-element serialization XLA lowers arbitrary gathers to (~13 ns/element
measured — see DESIGN.md).

Falls back to ``jnp.take_along_axis`` off-TPU (tests run on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _sweep_kernel(tab_ref, idx_ref, out_ref):
    # Refs are [1, C/128, 128]: one row per grid step, folded into the
    # (sublane, lane) tile shape Mosaic's dynamic_gather supports.
    rows = tab_ref.shape[1]
    idx = idx_ref[0]  # [C/128, 128] of global indices into this row
    lo = idx & 127
    hi = idx >> 7

    def body(r, acc):
        sl = tab_ref[0, pl.ds(r, 1), :]  # [1, 128] slice r of the table row
        bc = jnp.broadcast_to(sl, (rows, 128))
        g = jnp.take_along_axis(bc, lo, axis=1)
        return jnp.where(hi == r, g, acc)

    out_ref[0] = jax.lax.fori_loop(0, rows, body, jnp.zeros_like(idx))


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon") or "TPU" in str(
            jax.devices()[0]
        )
    except Exception:
        return False


@functools.cache
def _use_pallas() -> bool:
    # Experimental: the sweep compiles and is correct, but Mosaic lowers the
    # per-step dynamically-indexed sublane slice + broadcast so poorly that
    # it loses to XLA's (already serialized) gather.  Enable only to
    # experiment; see DESIGN.md "known gaps".
    import os

    return os.environ.get("SNAPPY_TPU_PALLAS_GATHER") == "1" and _on_tpu()


def take_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """out[b, j] = table[b, idx[b, j]] — batched per-row gather.

    table, idx: int32 [B, C] with C a multiple of 128 and B a multiple of 8
    (callers pad).  Indices must be in [0, C).
    """
    assert table.shape == idx.shape and table.ndim == 2
    b, c = table.shape
    if not _use_pallas() or c % 1024 or c < 1024:
        return jnp.take_along_axis(table, idx, axis=1)
    rows = c // 128
    tab3 = table.reshape(b, rows, 128)
    idx3 = idx.reshape(b, rows, 128)
    spec = pl.BlockSpec((1, rows, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _sweep_kernel,
        grid=(b,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, rows, 128), idx.dtype),
    )(tab3, idx3)
    return out.reshape(b, c)
