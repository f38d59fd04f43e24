"""Host <-> device orchestration: batching, shape bucketing, assembly.

The reference's L3 layer does buffer management and block/frame assembly
around the scalar kernels (/root/reference/snappy.nim:27-290).  Here the
same role means: pad variable-length payloads into static jit shapes
(bucketed to powers of two to bound recompiles), batch independent 64 KiB
blocks/frames into one device call, and assemble ragged outputs on the host.

All functions take/return numpy; nothing here raises on malformed input —
callers get (value, ok) style results, converted by the API layer.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .formats import constants as C
from .formats import framing, varint
from .ops import crc32c_jax, decode_jax, encode_jax

_BLOCK = C.MAX_BLOCK_LEN  # 65536
# Per-block compressed budget: worst case max_compressed_len(65536)=76490,
# rounded to a multiple of 128.
_MAX_COMP_BLOCK = -(-C.max_compressed_len(_BLOCK) // 128) * 128


def _bucket(n: int, lo: int = 4096) -> int:
    """Next power of two >= max(n, lo) — bounds distinct compile shapes."""
    n = max(n, lo)
    return 1 << (n - 1).bit_length()


def _use_scalar_kernels() -> bool:
    """Production device path: the scalar-core Pallas kernels (see
    ops/decode_scalar.py for the measured rationale).  SNAPPY_TPU_DEVICE_KERNEL
    =xla falls back to the array-parallel XLA kernels (also the fallback off
    real TPU hardware, where Mosaic cannot compile)."""
    import os

    if os.environ.get("SNAPPY_TPU_DEVICE_KERNEL", "scalar") != "scalar":
        return False
    from .ops import decode_scalar

    return decode_scalar.available()


def _nb_slab(n: int) -> int:
    """Grid-size bucket for the scalar kernels: few distinct compile shapes,
    512-chunk slabs for large batches."""
    for b in (8, 32, 128, 512):
        if n <= b:
            return b
    return 512


# ---------------------------------------------------------------------------
# Scalar-kernel jitted pipelines (packed-word layout at the device boundary)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(2,))
def _decode_chunks_scalar(meta, comp_words, nb: int):
    """Decode chunks on the scalar core + masked CRC32C of outputs (VPU)."""
    from .ops import decode_scalar

    # trace-time guard: a slab/shape mismatch would index the grid past
    # the operand and raise a device INTERNAL error (which can wedge the
    # tunnel pool for ~20 min) instead of a Python error
    assert meta.shape[0] == nb, (meta.shape, nb)
    out_words, status = decode_scalar.decode_chunks_words(meta, comp_words, nb)
    w = out_words[:, 0, : decode_scalar.OUT_WORDS]
    byts = jnp.stack(
        [w & 255, (w >> 8) & 255, (w >> 16) & 255, (w >> 24) & 255], axis=-1
    ).reshape(nb, -1)
    out_lens = meta[:, 0, 1]
    # The copy engine spills garbage past the written length; zero it for CRC.
    j = jax.lax.broadcasted_iota(jnp.int32, byts.shape, 1)
    byts = jnp.where(j < out_lens[:, None], byts, 0)
    crcs = crc32c_jax.masked_crc32c_chunks(byts, out_lens, _BLOCK)
    return out_words, status, crcs


@functools.partial(jax.jit, static_argnums=(2,))
def _decode_scalar_nocrc(meta, comp_words, nb: int):
    from .ops import decode_scalar

    assert meta.shape[0] == nb, (meta.shape, nb)  # see _decode_chunks_scalar
    return decode_scalar.decode_chunks_words(meta, comp_words, nb)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _encode_frames_scalar(frames_u8, flens, nb: int, level: int = 1):
    """Per-frame masked CRC32C (VPU) + scalar-core block encode."""
    from .ops import encode_scalar

    assert frames_u8.shape[0] == nb, (frames_u8.shape, nb)
    frames_i32 = frames_u8.astype(jnp.int32)
    crcs = crc32c_jax.masked_crc32c_chunks(frames_i32, flens, _BLOCK)
    b = frames_i32.reshape(nb, -1, 4)
    words = b[:, :, 0] | (b[:, :, 1] << 8) | (b[:, :, 2] << 16) | (b[:, :, 3] << 24)
    words = jnp.pad(words, ((0, 0), (0, 4))).reshape(nb, 1, -1)
    meta = flens.astype(jnp.int32).reshape(nb, 1, 1)
    enc_w, elen = encode_scalar.encode_blocks_words(
        meta, words, nb, level=level
    )
    return crcs, enc_w, elen[:, 0, 0]


@functools.partial(jax.jit, static_argnums=(2, 3))
def _encode_blocks_scalar(frames_u8, flens, nb: int, level: int = 1):
    """Scalar-core block encode without CRC (raw format)."""
    from .ops import encode_scalar

    assert frames_u8.shape[0] == nb, (frames_u8.shape, nb)
    frames_i32 = frames_u8.astype(jnp.int32)
    b = frames_i32.reshape(nb, -1, 4)
    words = b[:, :, 0] | (b[:, :, 1] << 8) | (b[:, :, 2] << 16) | (b[:, :, 3] << 24)
    words = jnp.pad(words, ((0, 0), (0, 4))).reshape(nb, 1, -1)
    meta = flens.astype(jnp.int32).reshape(nb, 1, 1)
    enc_w, elen = encode_scalar.encode_blocks_words(
        meta, words, nb, level=level
    )
    return enc_w, elen[:, 0, 0]


# ---------------------------------------------------------------------------
# Jitted pipelines (uint8 in/out at the device boundary)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(2,))
def _encode_blocks_u8(blocks_u8, blens, max_comp: int):
    return encode_jax.encode_blocks(blocks_u8.astype(jnp.int32), blens, max_comp)


@functools.partial(jax.jit, static_argnums=(3,))
def _decode_raw_u8(comp_u8, comp_len, out_len, u_pad: int):
    return decode_jax.decode_raw(comp_u8.astype(jnp.int32), comp_len, out_len, u_pad)


@functools.partial(jax.jit, static_argnums=(3,))
def _decode_chunks_u8(comp_u8, comp_lens, out_lens, u_pad: int):
    """Decode framed chunks and compute masked CRC32C of the outputs on-chip."""
    out, ok, written = decode_jax.decode_chunks(
        comp_u8.astype(jnp.int32), comp_lens, out_lens, u_pad
    )
    crcs = crc32c_jax.masked_crc32c_chunks(out.astype(jnp.int32), out_lens, u_pad)
    return out, ok, written, crcs


@functools.partial(jax.jit, static_argnums=(2,))
def _encode_frames_u8(frames_u8, flens, max_comp: int):
    """Framed-pipeline device step: per-frame masked CRC32C of the payload
    plus an attempted block compression (encoder.nim:385-426)."""
    frames_i32 = frames_u8.astype(jnp.int32)
    crcs = crc32c_jax.masked_crc32c_chunks(frames_i32, flens, frames_u8.shape[1])
    enc, totals = encode_jax.encode_blocks(frames_i32, flens, max_comp)
    return crcs, enc, totals


# ---------------------------------------------------------------------------
# Raw format
# ---------------------------------------------------------------------------


def _split_blocks(data: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    n = len(data)
    nb = max(1, -(-n // _BLOCK))
    blocks = np.zeros((nb, _BLOCK), dtype=np.uint8)
    blens = np.zeros((nb,), dtype=np.int32)
    for k in range(nb):
        chunk = data[k * _BLOCK : (k + 1) * _BLOCK]
        blocks[k, : len(chunk)] = chunk
        blens[k] = len(chunk)
    return blocks, blens


def raw_compress(
    data: bytes, backend: Optional[str] = None, level: int = 1
) -> Optional[bytes]:
    """Raw-format compress: varint header + concatenated block tag streams
    (contract parity: snappy.nim:27-64).

    ``backend``: "device" | "host" | None (= resolve the configured default).
    Both backends produce valid, cross-decodable streams; exact bytes differ
    (the reference's own tests accept the same across implementations,
    test_snappy.nim:50-53).
    """
    from . import config
    from .ops import host_codec

    if (backend or config.resolve_backend()) == "host" and host_codec.available():
        return host_codec.raw_compress(data, level)
    n = len(data)
    if n > C.MAX_UNCOMPRESSED_LEN:
        return None
    header = varint.encode_uint32(n)
    if n == 0:
        return header  # empty input encodes to exactly [0x00]
    arr = np.frombuffer(data, dtype=np.uint8)
    blocks, blens = _split_blocks(arr)
    nb = blocks.shape[0]

    if _use_scalar_kernels():
        from .ops import encode_scalar

        parts = [header]
        for lo in range(0, nb, 512):
            hi = min(nb, lo + 512)
            slab = _nb_slab(hi - lo)
            fr = blocks[lo:hi]
            fl = blens[lo:hi]
            if slab != hi - lo:
                fr = np.vstack([fr, np.zeros((slab - (hi - lo), _BLOCK), np.uint8)])
                fl = np.concatenate([fl, np.zeros((slab - (hi - lo),), np.int32)])
            enc_w, elens = _encode_blocks_scalar(
                jnp.asarray(fr), jnp.asarray(fl), slab, 2 if level >= 2 else 1
            )
            enc_b = np.ascontiguousarray(np.asarray(enc_w)).view(np.uint8)
            elens = np.asarray(elens)
            for k in range(hi - lo):
                parts.append(enc_b[k, 0, : int(elens[k])].tobytes())
        return b"".join(parts)

    nb_pad = _bucket(nb, lo=1)
    if nb_pad != nb:
        blocks = np.vstack([blocks, np.zeros((nb_pad - nb, _BLOCK), np.uint8)])
        blens = np.concatenate([blens, np.zeros((nb_pad - nb,), np.int32)])
    out, totals = _encode_blocks_u8(
        jnp.asarray(blocks), jnp.asarray(blens), _MAX_COMP_BLOCK
    )
    out = np.asarray(out)
    totals = np.asarray(totals)
    parts = [header]
    for k in range(nb):
        parts.append(out[k, : totals[k]].tobytes())
    return b"".join(parts)


def raw_compress_batch(
    datas: List[bytes], backend: Optional[str] = None, level: int = 1
) -> List[Optional[bytes]]:
    """Compress many independent payloads with ONE device dispatch per
    512-block slab (the encode twin of :func:`raw_uncompress_batch` —
    the serving shape; blocks of ALL payloads share the slabs, so many
    small payloads amortize the dispatch exactly like one large one).

    Returns one stream (or None for oversized input) per payload, each
    byte-identical to :func:`raw_compress` of that payload alone (the
    block split is per payload, so batching cannot change the bytes)."""
    from . import config
    from .ops import host_codec

    bk = backend or config.resolve_backend()
    if bk == "host" and host_codec.available():
        return [host_codec.raw_compress(d, level) for d in datas]

    datas_b = [bytes(d) for d in datas]
    results: List[Optional[bytes]] = [None] * len(datas)
    jobs: List[Tuple[int, int, np.ndarray, int]] = []  # (i, k, block, blen)
    plan = {}  # i -> number of blocks
    for i, data in enumerate(datas_b):
        n = len(data)
        if n > C.MAX_UNCOMPRESSED_LEN:
            continue  # None: oversized (raw_compress contract)
        if n == 0:
            results[i] = varint.encode_uint32(0)
            continue
        arr = np.frombuffer(data, dtype=np.uint8)
        blocks, blens = _split_blocks(arr)
        for k in range(blocks.shape[0]):
            jobs.append((i, k, blocks[k], int(blens[k])))
        plan[i] = blocks.shape[0]

    if not jobs:
        return results
    if not _use_scalar_kernels():
        # XLA-fallback backends keep the per-payload path (its own shape
        # bucketing); batching only pays on the scalar kernels.
        for i in plan:
            results[i] = raw_compress(datas_b[i], backend=bk, level=level)
        return results

    enc_out = {}
    for lo in range(0, len(jobs), 512):
        sub = jobs[lo : lo + 512]
        slab = _nb_slab(len(sub))
        fr = np.stack([b for _, _, b, _ in sub])
        fl = np.array([ln for _, _, _, ln in sub], np.int32)
        if slab != len(sub):
            fr = np.vstack([fr, np.zeros((slab - len(sub), _BLOCK), np.uint8)])
            fl = np.concatenate([fl, np.zeros((slab - len(sub),), np.int32)])
        enc_w, elens = _encode_blocks_scalar(
            jnp.asarray(fr), jnp.asarray(fl), slab, 2 if level >= 2 else 1
        )
        enc_b = np.ascontiguousarray(np.asarray(enc_w)).view(np.uint8)
        elens = np.asarray(elens)
        for j, (i, k, _, _) in enumerate(sub):
            enc_out[(i, k)] = enc_b[j, 0, : int(elens[j])].tobytes()
    for i, nb in plan.items():
        results[i] = varint.encode_uint32(len(datas_b[i])) + b"".join(
            enc_out[(i, k)] for k in range(nb)
        )
    return results


def raw_uncompress(
    data: bytes,
    max_size: int = C.MAX_UNCOMPRESSED_LEN,
    backend: Optional[str] = None,
) -> Tuple[Optional[bytes], str]:
    """Raw-format uncompress.  Returns (payload, "ok") or (None, reason);
    reason in {"invalid", "too_large"} (parity: snappy.nim:84-128)."""
    from . import config
    from .ops import host_codec

    if (backend or config.resolve_backend()) == "host" and host_codec.available():
        return host_codec.raw_uncompress(data, max_size)
    # Sizing scan accepts uint64 varints (codec.nim:129-138); the decode
    # itself enforces the stricter 5-byte uint32 rule (snappy.nim:92).
    declared64, _ = varint.decode_uint64(data)
    if declared64 is None or declared64 > C.MAX_UNCOMPRESSED_LEN:
        return None, "invalid"
    if declared64 > max_size:
        return None, "too_large"
    declared, read = varint.decode_uint32(data)
    if declared is None:
        return None, "invalid"
    body = np.frombuffer(data, dtype=np.uint8)[read:]
    if declared == 0:
        return (b"", "ok") if len(body) == 0 else (None, "invalid")
    if len(body) == 0:
        return None, "invalid"

    from .ops import decode_scalar

    if _use_scalar_kernels():
        if (
            declared <= 4 * decode_scalar.RAW_OUT_WORDS
            and len(body) <= 4 * decode_scalar.RAW_C_WORDS
        ):
            meta, comp = decode_scalar.pack_raw(bytes(body), int(declared))
            out_words, status = decode_scalar.decode_raw_words(
                jnp.asarray(meta), jnp.asarray(comp)
            )
            status = np.asarray(status)
            if not status[0, 0, 0]:
                return None, "invalid"
            out_b = np.ascontiguousarray(np.asarray(out_words)).view(np.uint8)
            return out_b[0, 0, : int(declared)].tobytes(), "ok"

        # Any larger raw stream: the windowed streaming decoder (one
        # dispatch, device-resident).  Grid mode serves every legal
        # tagCopy4 offset (>64 KiB reaches come from the flushed HBM
        # output, round 5); "unsupported" only remains reachable from the
        # scan-mode cross-check — fall through to the XLA kernels then.
        # The kernels track positions in int32: stay clear of 2^31.
        if declared < (1 << 31) - (1 << 21) and len(body) < (1 << 31) - (1 << 21):
            from .ops import decode_stream

            out, reason = decode_stream.decode_raw_stream_bytes(
                bytes(body), int(declared)
            )
            if reason == "ok":
                return out, "ok"
            if reason == "invalid":
                return None, "invalid"

    c_pad = _bucket(len(body))
    comp = np.zeros((c_pad,), dtype=np.uint8)
    comp[: len(body)] = body
    u_pad = _bucket(int(declared))
    out, ok, _written = _decode_raw_u8(
        jnp.asarray(comp),
        jnp.int32(len(body)),
        jnp.int32(declared),
        u_pad,
    )
    if not bool(ok):
        return None, "invalid"
    return np.asarray(out)[: int(declared)].tobytes(), "ok"


def _nb_slab_raw(n: int) -> int:
    """Grid-size bucket for the big-window raw batch kernel.  Finer
    buckets than the chunk path: idle pad steps are 128 KiB-window sized
    here, so a 10-stream batch in a 32-slab measured ~40% idle-step
    overhead (round 5)."""
    for b in (8, 16, 32, 64, 128):
        if n <= b:
            return b
    return 128


def raw_uncompress_batch(
    datas: List[bytes],
    max_size: int = C.MAX_UNCOMPRESSED_LEN,
    backend: Optional[str] = None,
) -> List[Tuple[Optional[bytes], str]]:
    """Decode many independent raw streams with ONE device dispatch per
    512-lane chunk slab (round-5 VERDICT item 5: back-to-back small
    decodes previously paid the full per-call dispatch tax each).

    Streams of ANY size ride the chunk slab: one-block streams directly,
    larger ones split at their 64 KiB output-block boundaries by the
    native tag scan (see the routing comment below).  Unsplittable
    streams take the big-window kernel (<= 128 KiB) or fall back to
    :func:`raw_uncompress`.  Returns one (payload|None, reason) pair per
    input, same contracts as :func:`raw_uncompress`."""
    from . import config
    from .ops import host_codec

    bk = backend or config.resolve_backend()
    if bk == "host" and host_codec.available():
        return [host_codec.raw_uncompress(d, max_size) for d in datas]

    from .ops import decode_scalar

    results: List[Optional[Tuple[Optional[bytes], str]]] = [None] * len(datas)
    datas_b: List[bytes] = [bytes(d) for d in datas]
    # (result_index, seg_index, seg_body, seg_declared): every stream the
    # chunk-shaped 512-lane slab serves — one-block streams directly, and
    # larger streams split at their 64 KiB output-block boundaries by the
    # native tag scan (stpu_raw_scan_blocks proves no op straddles a
    # boundary; the per-chunk offset>written check proves no copy reaches
    # across one — the same split the host block-parallel decoder uses).
    chunk_jobs: List[Tuple[int, int, bytes, int]] = []
    seg_plan = {}     # result_index -> number of segments
    batch_big = []    # unsplittable, 64 KiB < out <= 128 KiB: big window
    C_CAP = 4 * decode_scalar.C_WORDS
    for i, data in enumerate(datas_b):
        declared64, _ = varint.decode_uint64(data)
        if declared64 is None or declared64 > C.MAX_UNCOMPRESSED_LEN:
            results[i] = (None, "invalid")
            continue
        if declared64 > max_size:
            results[i] = (None, "too_large")
            continue
        declared, read = varint.decode_uint32(data)
        if declared is None:
            results[i] = (None, "invalid")
            continue
        body = data[read:]
        if declared == 0:
            results[i] = (b"", "ok") if len(body) == 0 else (None, "invalid")
            continue
        if not (_use_scalar_kernels() and len(body) > 0):
            results[i] = raw_uncompress(data, max_size, backend=bk)
            continue
        if declared <= 4 * decode_scalar.OUT_WORDS and len(body) <= C_CAP:
            # One-block streams ride the chunk-shaped kernel: same on-chip
            # rate as the big window (e37: 115.8 vs 115.0 MB/s on a mixed
            # 40-50 KB batch) but half the padded transfer per lane and a
            # 4x larger slab, which is what the tunnel-bound end-to-end
            # path pays for (round 5).
            chunk_jobs.append((i, 0, body, int(declared)))
            seg_plan[i] = 1
            continue
        offs = host_codec.scan_raw_blocks(body, int(declared))
        segs = None
        if offs is not None:
            segs = []
            for k in range(len(offs) - 1):
                sb = body[offs[k] : offs[k + 1]]
                dk = min(C.MAX_BLOCK_LEN, int(declared) - k * C.MAX_BLOCK_LEN)
                if len(sb) > C_CAP or dk <= 0:
                    segs = None  # pathological segment: not chunk-shaped
                    break
                segs.append((sb, dk))
        if segs:
            for k, (sb, dk) in enumerate(segs):
                chunk_jobs.append((i, k, sb, dk))
            seg_plan[i] = len(segs)
        elif (
            declared <= 4 * decode_scalar.RAW_OUT_WORDS
            and len(body) <= 4 * decode_scalar.RAW_C_WORDS
        ):
            batch_big.append((i, body, int(declared)))
        else:
            results[i] = raw_uncompress(data, max_size, backend=bk)

    seg_out = {}  # (result_index, seg_index) -> payload bytes or None
    for lo in range(0, len(chunk_jobs), 512):
        sub = chunk_jobs[lo : lo + 512]
        slab = _nb_slab(len(sub))
        bodies = [b for _, _, b, _ in sub]
        decls = [d for _, _, _, d in sub]
        while len(bodies) < slab:
            bodies.append(b"")
            decls.append(0)
        meta, comp = decode_scalar.pack_chunks(bodies, decls)
        out_words, status = _decode_scalar_nocrc(
            jnp.asarray(meta), jnp.asarray(comp), slab
        )
        status = np.asarray(status)
        out_b = np.ascontiguousarray(np.asarray(out_words)).view(np.uint8)
        for k, (i, seg, _, dk) in enumerate(sub):
            if status[k, 0, 0] and status[k, 0, 1] == dk:
                seg_out[(i, seg)] = out_b[k, 0, :dk].tobytes()
            else:
                seg_out[(i, seg)] = None
    for i, nseg in seg_plan.items():
        parts = [seg_out[(i, k)] for k in range(nseg)]
        if all(p is not None for p in parts):
            results[i] = (b"".join(parts), "ok")  # type: ignore[arg-type]
        elif nseg == 1:
            results[i] = (None, "invalid")
        else:
            # A segment failed its in-chunk validation (e.g. a legal copy
            # reaching across a block boundary — an encoder this split
            # does not model).  The whole-stream decoder is authoritative
            # for both bytes and the error verdict.
            results[i] = raw_uncompress(datas_b[i], max_size, backend=bk)

    for lo in range(0, len(batch_big), 128):
        sub = batch_big[lo : lo + 128]
        slab = _nb_slab_raw(len(sub))
        bodies = [b for _, b, _ in sub]
        decls = [d for _, _, d in sub]
        while len(bodies) < slab:
            bodies.append(b"")
            decls.append(0)
        meta, comp = decode_scalar.pack_raw_batch(bodies, decls)
        out_words, status = decode_scalar.decode_raw_batch_words(
            jnp.asarray(meta), jnp.asarray(comp), slab
        )
        status = np.asarray(status)
        out_b = np.ascontiguousarray(np.asarray(out_words)).view(np.uint8)
        for k, (i, _, declared) in enumerate(sub):
            if status[k, 0, 0] and status[k, 0, 1] == declared:
                results[i] = (out_b[k, 0, :declared].tobytes(), "ok")
            else:
                results[i] = (None, "invalid")
    return results  # type: ignore[return-value]


# ---------------------------------------------------------------------------
# Framed format
# ---------------------------------------------------------------------------


def framed_compress(
    data: bytes,
    with_header: bool = True,
    backend: Optional[str] = None,
    level: int = 1,
) -> Optional[bytes]:
    """Framed-format compress (contract parity: snappy.nim:130-155 and
    encoder.nim:385-426): per-64 KiB frame, masked CRC + compressed payload
    if it saves >= 1/8 of the frame, else the verbatim payload."""
    from . import config
    from .ops import host_codec

    if (backend or config.resolve_backend()) == "host" and host_codec.available():
        return host_codec.framed_compress(data, with_header, level)
    n = len(data)
    parts: List[bytes] = [C.FRAMING_HEADER] if with_header else []
    if n == 0:
        return b"".join(parts)
    arr = np.frombuffer(data, dtype=np.uint8)
    frames, flens = _split_blocks(arr)
    nf = frames.shape[0]

    if _use_scalar_kernels():
        crcs_l, enc_l, totals_l = [], [], []
        for lo in range(0, nf, 512):
            hi = min(nf, lo + 512)
            slab = _nb_slab(hi - lo)
            fr = frames[lo:hi]
            fl = flens[lo:hi]
            if slab != hi - lo:
                fr = np.vstack([fr, np.zeros((slab - (hi - lo), _BLOCK), np.uint8)])
                fl = np.concatenate([fl, np.zeros((slab - (hi - lo),), np.int32)])
            crc_s, enc_w, elens = _encode_frames_scalar(
                jnp.asarray(fr), jnp.asarray(fl), slab, 2 if level >= 2 else 1
            )
            enc_b = np.ascontiguousarray(np.asarray(enc_w)).view(np.uint8)
            crcs_l.append(np.asarray(crc_s)[: hi - lo])
            totals_l.append(np.asarray(elens)[: hi - lo])
            enc_l.append(enc_b[: hi - lo, 0, :])
        crcs = np.concatenate(crcs_l)
        totals = np.concatenate(totals_l)
        enc = np.concatenate(enc_l)
    else:
        nf_pad = _bucket(nf, lo=1)
        if nf_pad != nf:
            frames = np.vstack(
                [frames, np.zeros((nf_pad - nf, _BLOCK), np.uint8)]
            )
            flens = np.concatenate([flens, np.zeros((nf_pad - nf,), np.int32)])
        crcs, enc, totals = _encode_frames_u8(
            jnp.asarray(frames), jnp.asarray(flens), _MAX_COMP_BLOCK
        )
        crcs = np.asarray(crcs)
        enc = np.asarray(enc)
        totals = np.asarray(totals)
    for k in range(nf):
        flen = int(flens[k])
        crc_bytes = int(crcs[k]).to_bytes(4, "little")
        blob = varint.encode_uint32(flen) + enc[k, : totals[k]].tobytes()
        # Keep the compressed form only if the encoded block alone (the
        # varint header excluded, exactly as the reference compares
        # blockLen at encoder.nim:408) saves >= 1/8 of the frame, and the
        # frame was big enough to try (encoder.nim:401-426).
        if flen >= C.MIN_NON_LITERAL_BLOCK_SIZE and int(totals[k]) <= flen - flen // 8:
            parts.append(
                framing.encode_frame_header(C.CHUNK_COMPRESSED, 4 + len(blob))
            )
            parts.append(crc_bytes)
            parts.append(blob)
        else:
            parts.append(
                framing.encode_frame_header(C.CHUNK_UNCOMPRESSED, 4 + flen)
            )
            parts.append(crc_bytes)
            parts.append(arr[k * _BLOCK : k * _BLOCK + flen].tobytes())
    return b"".join(parts)


class FramedError(Exception):
    """Internal marker carrying a FrameError reason string."""

    def __init__(self, reason: str):
        super().__init__(reason)
        self.reason = reason


def framed_uncompress_chunks(
    data: bytes,
    chunks: List[framing.ChunkInfo],
    check_integrity: bool = True,
    backend: Optional[str] = None,
) -> Tuple[Optional[List[bytes]], str]:
    """Decode a list of scanned chunks; returns (payload_per_chunk, "ok")
    or (None, reason) with reason in {"invalid", "crc", "unknown_chunk"}.

    Returns a list of byte segments whose in-order concatenation is the
    decoded payload (one entry per chunk on the device path; the host path
    may return a single pre-assembled segment)."""
    from . import config
    from .ops import host_codec

    if (backend or config.resolve_backend()) == "host" and host_codec.available():
        blob, reason = host_codec.framed_uncompress_scanned(
            data, chunks, check_integrity
        )
        if blob is None:
            return None, reason
        return [blob], "ok"
    total = sum(ch.uncompressed_len for ch in chunks)
    out_arr = np.empty((total,), dtype=np.uint8)
    written, reason = _framed_uncompress_device(
        data, chunks, check_integrity, out_arr
    )
    if written is None:
        return None, reason
    # One segment: per-chunk tobytes() + host join would copy every
    # decoded byte twice more (round-2 VERDICT item 8).
    return [out_arr[:written].tobytes()], "ok"


def framed_uncompress_chunks_into(
    data: bytes,
    chunks: List[framing.ChunkInfo],
    out_arr: np.ndarray,
    check_integrity: bool = True,
    backend: Optional[str] = None,
) -> Tuple[Optional[int], str]:
    """Decode scanned chunks directly into ``out_arr`` at their final
    offsets (zero extra copies on either backend).  Returns
    (written, "ok") or (None, reason)."""
    from . import config
    from .ops import host_codec

    if (backend or config.resolve_backend()) == "host" and host_codec.available():
        blob, reason = host_codec.framed_uncompress_scanned(
            data, chunks, check_integrity, out=out_arr
        )
        if blob is None:
            return None, reason
        return sum(ch.uncompressed_len for ch in chunks), "ok"
    return _framed_uncompress_device(data, chunks, check_integrity, out_arr)


@functools.partial(jax.jit, static_argnums=(2,))
def _crc_chunks_device(chunks_u8, lens, width: int):
    """Masked CRC32C of byte chunks on-device (crc32c_jax)."""
    return crc32c_jax.masked_crc32c_chunks(chunks_u8.astype(jnp.int32), lens, width)


def masked_crc32c(payload: bytes, backend: Optional[str] = None) -> int:
    """Masked CRC32C of one buffer on the configured backend: the device
    backend uses the on-chip kernel (crc32c_jax) so the device path never
    round-trips through the native host CRC; the host backend (or a
    missing native lib) uses crc32c_native's own fallback chain."""
    from . import config
    from .ops import crc32c_native

    if (backend or config.resolve_backend()) == "device":
        width = _bucket(max(len(payload), 1), lo=256)
        buf = np.zeros((1, width), dtype=np.uint8)
        buf[0, : len(payload)] = np.frombuffer(payload, dtype=np.uint8)
        lens = np.array([len(payload)], dtype=np.int32)
        return int(
            np.asarray(
                _crc_chunks_device(jnp.asarray(buf), jnp.asarray(lens), width)
            )[0]
        )
    return crc32c_native.masked_crc32c(payload)


def _framed_uncompress_device(
    data: bytes,
    chunks: List[framing.ChunkInfo],
    check_integrity: bool,
    out_arr: np.ndarray,
) -> Tuple[Optional[int], str]:
    """Device-backend chunk decode writing payloads at their final offsets
    in ``out_arr``.  Compressed chunks are batched and decoded on-device
    with on-chip CRC of the decoded output; uncompressed chunks are
    batched through the on-chip CRC kernel too (crc32c_jax) — the device
    backend's success path never calls the native host CRC (round-5
    VERDICT item 3; reference contract snappy.nim:231-233).  Semantics
    parity: snappy.nim:199-265.  Returns (written, "ok") or (None, reason).
    """
    arr = np.frombuffer(data, dtype=np.uint8)

    # Error ORDER parity: the reference processes chunks strictly one at a
    # time (snappy.nim:199-265), so the error reported must belong to the
    # EARLIEST bad chunk.  The scan below stops at the first failure it
    # can see host-side; decode and CRC failures are found batched, so
    # every candidate error carries its chunk INDEX and the smallest one
    # wins at the end.
    deferred: Tuple[int, str] = (len(chunks), "")  # (chunk index, reason)
    comp_jobs = []  # (chunk_idx, out_offset, payload_slice, declared, crc)
    ucrc_jobs = []  # (chunk_idx, payload_slice, stored_crc)
    pos = 0
    for idx, ch in enumerate(chunks):
        if ch.id == C.CHUNK_COMPRESSED:
            if ch.data_len < 4:
                deferred = (idx, "invalid")
                break
            stored = int.from_bytes(
                data[ch.data_pos : ch.data_pos + 4], "little"
            )
            payload = arr[ch.data_pos + 4 : ch.data_pos + ch.data_len]
            declared, read = varint.decode_uint32(payload)
            if declared is None or declared > C.MAX_UNCOMPRESSED_FRAME_DATA_LEN:
                deferred = (idx, "invalid")
                break
            comp_jobs.append((idx, pos, payload[read:], int(declared), stored))
            pos += int(declared)
        elif ch.id == C.CHUNK_UNCOMPRESSED:
            if ch.data_len < 4:
                deferred = (idx, "invalid")
                break
            stored = int.from_bytes(
                data[ch.data_pos : ch.data_pos + 4], "little"
            )
            payload = arr[ch.data_pos + 4 : ch.data_pos + ch.data_len]
            if len(payload) > C.MAX_UNCOMPRESSED_FRAME_DATA_LEN:
                deferred = (idx, "invalid")
                break
            if check_integrity:
                ucrc_jobs.append((idx, payload, stored))
            out_arr[pos : pos + len(payload)] = payload
            pos += len(payload)
        elif ch.id == C.CHUNK_STREAM_HEADER:
            pass
        elif ch.id < C.CHUNK_RESERVED_SKIPPABLE_LO:
            deferred = (idx, "unknown_chunk")
            break
        # reserved skippable: ignore payload

    err = deferred

    def consider(idx: int, reason: str):
        nonlocal err
        if idx < err[0]:
            err = (idx, reason)

    if comp_jobs:
        from .ops import decode_scalar

        n = len(comp_jobs)
        if _use_scalar_kernels() and all(
            len(j[2]) <= 4 * decode_scalar.C_WORDS for j in comp_jobs
        ):
            for lo in range(0, n, 512):
                hi = min(n, lo + 512)
                slab = _nb_slab(hi - lo)
                bodies = [bytes(j[2]) for j in comp_jobs[lo:hi]]
                decls = [j[3] for j in comp_jobs[lo:hi]]
                while len(bodies) < slab:
                    bodies.append(b"")
                    decls.append(0)
                meta, comp = decode_scalar.pack_chunks(bodies, decls)
                out_words, status, crcs = _decode_chunks_scalar(
                    jnp.asarray(meta), jnp.asarray(comp), slab
                )
                status = np.asarray(status)
                crcs = np.asarray(crcs)
                out_b = np.ascontiguousarray(np.asarray(out_words)).view(np.uint8)
                bad = False
                for k in range(hi - lo):
                    idx, off, _, declared, stored = comp_jobs[lo + k]
                    if not status[k, 0, 0]:
                        consider(idx, "invalid")
                        bad = True
                        break
                    if check_integrity and int(crcs[k]) != stored:
                        consider(idx, "crc")
                        bad = True
                        break
                    out_arr[off : off + declared] = out_b[k, 0, :declared]
                if bad:
                    break
        else:
            max_body = max(len(j[2]) for j in comp_jobs)
            c_pad = _bucket(max_body, lo=1024)
            n_pad = _bucket(n, lo=1)
            comp = np.zeros((n_pad, c_pad), dtype=np.uint8)
            comp_lens = np.zeros((n_pad,), dtype=np.int32)
            out_lens = np.zeros((n_pad,), dtype=np.int32)
            for k, (_, _, body, declared, _) in enumerate(comp_jobs):
                comp[k, : len(body)] = body
                comp_lens[k] = len(body)
                out_lens[k] = declared
            out, ok, _written, crcs = _decode_chunks_u8(
                jnp.asarray(comp),
                jnp.asarray(comp_lens),
                jnp.asarray(out_lens),
                _BLOCK,
            )
            out = np.asarray(out)
            ok = np.asarray(ok)
            crcs = np.asarray(crcs)
            for k, (idx, off, _, declared, stored) in enumerate(comp_jobs):
                if not ok[k]:
                    consider(idx, "invalid")
                    break
                if check_integrity and int(crcs[k]) != stored:
                    consider(idx, "crc")
                    break
                out_arr[off : off + declared] = out[k, :declared]

    # Uncompressed-chunk CRCs, batched on-device.  Only chunks EARLIER
    # than the current earliest error can still matter.
    ucrc_jobs = [j for j in ucrc_jobs if j[0] < err[0]]
    for lo in range(0, len(ucrc_jobs), 512):
        sub = ucrc_jobs[lo : lo + 512]
        slab = _nb_slab(len(sub))
        payloads = np.zeros((slab, _BLOCK), dtype=np.uint8)
        lens = np.zeros((slab,), dtype=np.int32)
        for k, (_, payload, _) in enumerate(sub):
            payloads[k, : len(payload)] = payload
            lens[k] = len(payload)
        got = np.asarray(
            _crc_chunks_device(jnp.asarray(payloads), jnp.asarray(lens), _BLOCK)
        )
        stop = False
        for k, (idx, _, stored) in enumerate(sub):
            if int(got[k]) != stored:
                consider(idx, "crc")
                stop = True
                break
        if stop:
            break

    if err[0] < len(chunks):
        return None, err[1]
    return pos, "ok"


def framed_uncompress(
    data: bytes,
    max_size: int = C.MAX_UNCOMPRESSED_LEN,
    check_integrity: bool = True,
    require_header: bool = True,
    backend: Optional[str] = None,
) -> Tuple[Optional[bytes], str]:
    """Whole-stream framed decode.  Returns (payload, "ok") or (None,
    reason); reason in {"invalid", "crc", "unknown_chunk", "too_large"}."""
    start = 0
    if require_header:
        if not framing.is_snappy_framed_stream(data):
            return None, "invalid"
        start = len(C.FRAMING_HEADER)
    chunks = framing.scan_frames(data, start)
    if chunks is None:
        # Distinguish the unskippable-reserved case for error parity.
        return None, _scan_failure_reason(data, start)
    total = sum(c.uncompressed_len for c in chunks)
    if total > max_size:
        return None, "too_large"

    from . import config
    from .ops import host_codec

    if (backend or config.resolve_backend()) == "host" and host_codec.available():
        return host_codec.framed_uncompress_scanned(data, chunks, check_integrity)

    out_arr = np.empty((total,), dtype=np.uint8)
    written, reason = _framed_uncompress_device(
        data, chunks, check_integrity, out_arr
    )
    if written is None:
        return None, reason
    return out_arr[:written].tobytes(), "ok"


def _scan_failure_reason(data: bytes, start: int) -> str:
    """Re-walk headers to classify a scan failure (invalid vs unknown chunk)."""
    n = len(data)
    read = start
    while n - read >= 4:
        cid, data_len = framing.decode_frame_header(data[read : read + 4])
        if n - read < data_len + 4:
            return "invalid"
        if (
            C.CHUNK_RESERVED_UNSKIPPABLE_LO
            <= cid
            <= C.CHUNK_RESERVED_UNSKIPPABLE_HI
        ):
            return "unknown_chunk"
        read += 4 + data_len
    return "invalid"
