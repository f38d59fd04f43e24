"""Array-parallel Snappy block encoder (XLA).

The reference encoder is a sequential greedy matcher over a lossy 16 KiB
hash table with a skip heuristic (/root/reference/snappy/encoder.nim:184-383).
Hash-probe-advance loops don't vectorize, so this encoder re-derives the
greedy parse as array passes over the whole 64 KiB block at once:

  1. **Candidate generation** — instead of a lossy, order-dependent hash
     table, a stable sort groups positions by their 4-byte value; each
     position's candidate is the nearest previous position with an
     identical 4-gram (a strict superset of the matches the reference's
     clobbered table can find — no hash collisions, no skip losses).
  2. **Match extension** — the candidate LCP is measured with 17 vectorized
     4-byte word compares (one shifted slice + one gather each) plus an
     XOR/count-trailing-zeros refinement, capped at 68 bytes.  A cap of 68
     mirrors the reference's own long-copy emission split ("while len >= 68
     emit a 64-byte copy", encoder.nim:96-111): a capped match emits
     copy2(64) and the parse re-matches at +64, which chains through long
     matches with identical output cost.
  3. **Greedy parse** — the decision "copy if lcp >= 4 else literal byte"
     defines a jump function (advance by match length or by 1); the tag
     positions the sequential greedy scan would choose are exactly the set
     reachable from 0, computed by pointer doubling in O(log n) rounds —
     the same primitive the decoder uses.
  4. **Emission** — literal runs are maximal chosen-literal intervals;
     per-unit encoded byte lengths feed an exclusive prefix sum giving
     exact output offsets; one scatter + segment-broadcast then
     materializes every output byte (tag headers computed in-place from
     unit attributes, literal bytes gathered from the input).

Output-size contract: per-tag emission follows the reference's rules
exactly (copy1 iff len < 12 and offset < 2048, the 68/64/60 split,
1/2/3-byte literal headers), and the candidate set dominates the
reference's, so compressed size tracks the reference closely (validated
against the scalar oracle in tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_U32 = jnp.uint32
_I32 = jnp.int32

_LCP_CAP = 68  # reference long-copy split threshold (encoder.nim:96-111)
_NWORDS = _LCP_CAP // 4


def _iota(n: int) -> jnp.ndarray:
    return jax.lax.broadcasted_iota(_I32, (n, 1), 0).squeeze(-1)


def _nearest_prev_candidate(v4: jnp.ndarray, b: int) -> jnp.ndarray:
    """cand[i] = nearest j < i with v4[j] == v4[i], else -1."""
    perm = jnp.argsort(v4, stable=True)  # groups equal v4, ascending i inside
    sorted_v4 = v4[perm]
    prev_i = jnp.concatenate([jnp.full((1,), -1, _I32), perm[:-1].astype(_I32)])
    same = jnp.concatenate(
        [jnp.zeros((1,), jnp.bool_), sorted_v4[1:] == sorted_v4[:-1]]
    )
    cand_sorted = jnp.where(same, prev_i, -1)
    return jnp.zeros((b,), _I32).at[perm].set(cand_sorted)


def _lcp(block_ext: jnp.ndarray, v4_ext: jnp.ndarray, cand: jnp.ndarray, b: int):
    """Capped LCP between each position i and cand[i] (both < b).

    block_ext: int32 [b + pad] bytes; v4_ext: uint32 [b + pad] LE 4-gram
    values.  Returns uint32 [b] lcp in [0, _LCP_CAP].
    """
    j = jnp.maximum(cand, 0)
    full_words = jnp.zeros((b,), _U32)
    alive = cand >= 0
    xor_acc = jnp.zeros((b,), _U32)
    have_neq = jnp.zeros((b,), jnp.bool_)
    for t in range(_NWORDS):
        a_t = jax.lax.dynamic_slice_in_dim(v4_ext, 4 * t, b)
        b_t = v4_ext[j + 4 * t]
        eq = a_t == b_t
        adv = alive & eq
        full_words = full_words + adv.astype(_U32)
        first_neq = alive & (~eq) & (~have_neq)
        xor_acc = jnp.where(first_neq, a_t ^ b_t, xor_acc)
        have_neq = have_neq | first_neq
        alive = adv
    # Bytes matching inside the first mismatching word: count trailing zero
    # bytes of the XOR (little-endian loads -> lowest differing byte first).
    low = xor_acc & (~xor_acc + jnp.uint32(1))
    tz_bits = jax.lax.population_count(low - jnp.uint32(1))
    extra = jnp.where(have_neq, tz_bits >> 3, 0).astype(_U32)
    return jnp.minimum(full_words * 4 + extra, jnp.uint32(_LCP_CAP))


def _reach_from_zero(jump: jnp.ndarray, size: int) -> jnp.ndarray:
    """Positions reachable from 0 under strictly-increasing jump (absorbing
    at index size-1).  Same doubling primitive as the decoder."""
    max_iters = max(1, int(np.ceil(np.log2(size)))) + 1
    reach0 = jnp.zeros((size,), jnp.int32).at[0].set(1)

    def cond(state):
        it, changed, _, _ = state
        return changed & (it < max_iters)

    def body(state):
        it, _, reach, jmp = state
        new_reach = reach.at[jmp].max(reach)
        return it + 1, jnp.any(new_reach != reach), new_reach, jmp[jmp]

    _, _, reach, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.bool_(True), reach0, jump)
    )
    return reach > 0


def _encode_block_padded(block: jnp.ndarray, blen: jnp.ndarray, max_comp: int):
    """Encode one block (<= 64 KiB) into a raw snappy tag stream.

    block: int32 [b] byte values, zero-padded beyond blen (int32 scalar).
    Returns (out: uint8 [max_comp], total: int32).
    """
    b = block.shape[0]
    pad = _LCP_CAP + 4
    block_ext = jnp.concatenate([block, jnp.zeros((pad,), block.dtype)])
    e0 = block_ext[0:b].astype(_U32)
    e1 = block_ext[1 : b + 1].astype(_U32)
    e2 = block_ext[2 : b + 2].astype(_U32)
    e3 = block_ext[3 : b + 3].astype(_U32)
    v4 = e0 | (e1 << 8) | (e2 << 16) | (e3 << 24)
    v4_ext = jnp.concatenate([v4, jnp.zeros((pad,), _U32)])

    idx = _iota(b)
    cand = _nearest_prev_candidate(v4, b)
    # A match may only start where a full 4-gram is inside the valid data.
    cand = jnp.where(idx + 4 <= blen, cand, -1)
    lcp = _lcp(block_ext, v4_ext, cand, b)

    # Continuation candidate: a capped (>= 68-byte) match emits 64 bytes and
    # re-matches at +64; the nearest 4-gram occurrence there may be a short
    # unrelated repeat, which would shred one long copy into many short
    # ones.  "Whatever distance position i-64 matched at also matches at i"
    # recovers the original offset, keeping long-copy chains intact.
    cand_prev = jnp.concatenate([jnp.full((64,), -1, _I32), cand[:-64]])
    cand2 = jnp.where(cand_prev >= 0, cand_prev + 64, -1)
    cand2 = jnp.where(
        (idx + 4 <= blen) & (cand2 >= 0) & (v4_ext[jnp.maximum(cand2, 0)] == v4),
        cand2,
        -1,
    )
    lcp2 = _lcp(block_ext, v4_ext, cand2, b)
    better = (lcp2 > lcp) | ((lcp2 == lcp) & (cand2 > cand) & (cand2 >= 0))
    cand = jnp.where(better, cand2, cand)
    lcp = jnp.where(better, lcp2, lcp)

    # Matches must not extend past the valid data.
    lcp = jnp.minimum(lcp, jnp.maximum(blen - idx, 0).astype(_U32))
    # A length-4 match emitted as copy2 (3 bytes) replaces 4 literal bytes
    # but usually splits a literal run (adding a fresh 1-byte header): zero
    # or negative net gain, so only take length-4 matches when they fit the
    # 2-byte copy1 form.  Longer matches always win.  (The reference's
    # sequential greedy takes all length-4 matches but *finds* far fewer of
    # them through its lossy table — this keeps our output no larger on
    # low-redundancy data.)
    is_match = (lcp >= 4) & (cand >= 0) & ((lcp > 4) | (idx - cand < 2048))
    offset = jnp.where(is_match, idx - cand, 0).astype(_U32)

    # Greedy parse: advance 64 for capped matches (re-match continues the
    # long copy), lcp for normal matches, 1 for literal bytes.
    adv = jnp.where(
        is_match, jnp.where(lcp == _LCP_CAP, 64, lcp), 1
    ).astype(_I32)
    jump = jnp.minimum(idx + adv, b)
    jump = jnp.where(idx < blen, jump, b)
    chosen = _reach_from_zero(
        jnp.concatenate([jump, jnp.array([b], _I32)]), b + 1
    )[:b] & (idx < blen)

    copy_sel = chosen & is_match
    lit_sel = chosen & ~is_match

    # Literal runs are contiguous index ranges (literal tags advance by 1).
    prev_lit = jnp.concatenate([jnp.zeros((1,), jnp.bool_), lit_sel[:-1]])
    run_start = lit_sel & ~prev_lit
    # Next chosen-copy position at or after i (else blen) via reverse cummin.
    arr = jnp.where(copy_sel, idx, b)
    ncp = jnp.flip(jax.lax.cummin(jnp.flip(arr)))
    run_end = jnp.minimum(ncp, blen)
    run_len = jnp.where(run_start, run_end - idx, 0).astype(_U32)

    # Per-unit encoded sizes.
    n_lit = run_len - 1  # valid at run starts
    lit_hdr = jnp.where(n_lit < 60, 1, jnp.where(n_lit < 256, 2, 3)).astype(_U32)
    lit_bytes = lit_hdr + run_len

    is_cap = lcp == _LCP_CAP
    is_dbl = (lcp > 64) & (lcp < _LCP_CAP)  # 65..67: copy2(60) + short tag
    short_len = jnp.where(is_dbl, lcp - 60, lcp)
    short_is_c1 = (short_len < 12) & (offset < 2048)
    copy_bytes = jnp.where(
        is_cap,
        3,
        jnp.where(is_dbl, 3, 0) + jnp.where(short_is_c1, 2, 3),
    ).astype(_U32)

    unit_mask = run_start | copy_sel
    unit_bytes = jnp.where(
        run_start, lit_bytes, jnp.where(copy_sel, copy_bytes, 0)
    )
    incl = jnp.cumsum(unit_bytes, dtype=_U32)
    out_off = (incl - unit_bytes).astype(_I32)
    total = jnp.where(b > 0, incl[-1], 0).astype(_I32)

    # ---- Materialize output bytes ---------------------------------------
    # Forward-fill each output position with its owning unit's comp index.
    scat = jnp.where(unit_mask, out_off, max_comp)
    seg_comp = (
        jnp.full((max_comp,), 0, dtype=_I32)
        .at[scat]
        .max(jnp.where(unit_mask, idx, 0), mode="drop")
    )
    seg_comp = jax.lax.cummax(seg_comp)

    u_off = out_off[seg_comp]
    p = _iota(max_comp)
    rel = p - u_off

    u_is_copy = copy_sel[seg_comp]
    u_lcp = lcp[seg_comp]
    u_offv = offset[seg_comp]
    u_cap = is_cap[seg_comp]
    u_dbl = is_dbl[seg_comp]
    u_c1 = short_is_c1[seg_comp]
    u_slen = short_len[seg_comp]
    u_rl = run_len[seg_comp]
    u_nlit = u_rl - 1
    u_lhdr = lit_hdr[seg_comp].astype(_I32)

    off_lo = u_offv & 0xFF
    off_hi = (u_offv >> 8) & 0xFF

    def copy2_tag(length):
        return ((length - 1) << 2) | 2

    def copy1_tag(length):
        return ((u_offv >> 8) << 5) | ((length - 4) << 2) | 1

    # Single-tag copy bytes (copy1 or copy2 of short_len); used either as
    # the whole unit (not dbl/cap) or as the second tag of a double unit.
    single0 = jnp.where(u_c1, copy1_tag(u_slen), copy2_tag(u_slen))
    single1 = jnp.where(u_c1, u_offv & 0xFF, off_lo)
    single2 = off_hi  # only used in copy2 form

    # Copy unit byte at rel:
    #  cap:  [copy2(64), lo, hi]
    #  dbl:  [copy2(60), lo, hi, single0, single1, (single2)]
    #  else: [single0, single1, (single2)]
    first0 = jnp.where(u_cap, copy2_tag(jnp.uint32(64)), copy2_tag(jnp.uint32(60)))
    head_is_c2 = u_cap | u_dbl
    rel2 = jnp.where(u_dbl, rel - 3, rel)  # position within the single tag
    copy_byte = jnp.where(
        head_is_c2 & (rel == 0),
        first0,
        jnp.where(
            head_is_c2 & (rel == 1),
            off_lo,
            jnp.where(
                head_is_c2 & (rel == 2),
                off_hi,
                jnp.where(
                    rel2 == 0,
                    single0,
                    jnp.where(rel2 == 1, single1, single2),
                ),
            ),
        ),
    )
    # cap units are only 3 bytes; rel>=3 never addressed for them (rel is
    # bounded by the unit's byte budget via out_off of the next unit).

    # Literal unit byte at rel: header then data.
    lit_b0 = jnp.where(
        u_lhdr == 1,
        (u_nlit << 2),
        jnp.where(u_lhdr == 2, jnp.uint32(60 << 2), jnp.uint32(61 << 2)),
    )
    lit_byte_hdr = jnp.where(
        rel == 0,
        lit_b0,
        jnp.where(
            rel == 1,
            u_nlit & 0xFF,
            (u_nlit >> 8) & 0xFF,
        ),
    )
    lit_src = jnp.clip(seg_comp + (rel - u_lhdr), 0, b - 1)
    lit_data = block[lit_src].astype(_U32)
    lit_byte = jnp.where(rel < u_lhdr, lit_byte_hdr, lit_data)

    out_byte = jnp.where(u_is_copy, copy_byte, lit_byte).astype(jnp.uint8)
    out_byte = jnp.where(p < total, out_byte, 0)
    return out_byte, total


@functools.partial(jax.jit, static_argnums=(2,))
def encode_blocks(blocks, blens, max_comp: int):
    """Batched block encode.

    blocks: int32 [N, B] zero-padded byte values; blens: int32 [N].
    Returns (out uint8 [N, max_comp], totals int32 [N]).
    """
    return jax.vmap(lambda blk, bl: _encode_block_padded(blk, bl, max_comp))(
        blocks, blens
    )
