/* Native host Snappy codec — the framework's CPU runtime path.
 *
 * Role parity: the reference keeps its hot loops in native code compiled
 * into the host library (encoder.nim/decoder.nim compile to C; crc32c.c is
 * C).  This file is the equivalent for snappy_tpu: a scalar block encoder
 * (greedy matcher with a positional hash table and skip heuristic, the same
 * algorithm family as /root/reference/snappy/encoder.nim:184-383) and a
 * validating raw-stream decoder (tag-dispatch loop with the same rejection
 * rules as /root/reference/snappy/decoder.nim:20-155), written from the
 * format specification.
 *
 * The Python engine fans block spans out over threads (ctypes releases the
 * GIL), so throughput scales with host cores; the TPU kernels remain the
 * device-resident path.  Little-endian hosts only (the reference has the
 * same restriction, encoder.nim:127-128).
 */

#include <stddef.h>
#include <stdint.h>
#include <string.h>

#define MAX_BLOCK 65536u
#define INPUT_MARGIN 15u
#define MIN_NON_LITERAL 17u
/* 14 bits = 32 KiB of table: fits L1 on typical hosts (the 15-bit variant
 * compresses ~0.5% better but costs up to 60% throughput on cache-limited
 * cores); matches the reference's maxTableSize (encoder.nim:10-12). */
#define TABLE_BITS 14
#define TABLE_SIZE (1u << TABLE_BITS)

static inline uint32_t load32(const uint8_t* p) {
  uint32_t v;
  memcpy(&v, p, 4);
  return v;
}
static inline uint64_t load64(const uint8_t* p) {
  uint64_t v;
  memcpy(&v, p, 8);
  return v;
}
static inline uint32_t hash32(uint32_t u, int shift) {
  return (u * 0x1E35A7BDu) >> shift;
}

/* ---------------- encoder ---------------- */

static inline uint8_t* emit_literal(uint8_t* op, const uint8_t* lit, uint32_t len,
                                    const uint8_t* in_end) {
  uint32_t n = len - 1;
  if (n < 60) {
    *op++ = (uint8_t)(n << 2);
    /* Blind 16-byte burst for the common short literal; the output buffer
     * has max_compressed_len slack and the read stays inside the caller's
     * input array (checked against in_end). */
    if (len <= 16 && lit + 16 <= in_end) {
      memcpy(op, lit, 16);
      return op + len;
    }
  } else if (n < 256) {
    *op++ = 60 << 2;
    *op++ = (uint8_t)n;
  } else {
    *op++ = 61 << 2;
    *op++ = (uint8_t)(n & 0xFF);
    *op++ = (uint8_t)(n >> 8);
  }
  memcpy(op, lit, len);
  return op + len;
}

static inline uint8_t* emit_copy2(uint8_t* op, uint32_t offset, uint32_t len) {
  *op++ = (uint8_t)(((len - 1) << 2) | 2);
  *op++ = (uint8_t)(offset & 0xFF);
  *op++ = (uint8_t)(offset >> 8);
  return op;
}

static inline uint8_t* emit_copy(uint8_t* op, uint32_t offset, uint32_t len) {
  /* 68/64/60 long-copy split + copy1 for short near copies
   * (contract parity: encoder.nim:81-125). */
  while (len >= 68) {
    op = emit_copy2(op, offset, 64);
    len -= 64;
  }
  if (len > 64) {
    op = emit_copy2(op, offset, 60);
    len -= 60;
  }
  if (len >= 12 || offset >= 2048) {
    op = emit_copy2(op, offset, len);
  } else {
    *op++ = (uint8_t)(((offset >> 8) << 5) | (((len - 4) & 7) << 2) | 1);
    *op++ = (uint8_t)(offset & 0xFF);
  }
  return op;
}

static inline uint32_t match_length(const uint8_t* s1, const uint8_t* s2,
                                    const uint8_t* limit) {
  const uint8_t* start = s2;
  while (s2 + 8 <= limit) {
    uint64_t x = load64(s1) ^ load64(s2);
    if (x) return (uint32_t)(s2 - start) + (uint32_t)(__builtin_ctzll(x) >> 3);
    s1 += 8;
    s2 += 8;
  }
  while (s2 < limit && *s1 == *s2) {
    s1++;
    s2++;
  }
  return (uint32_t)(s2 - start);
}

/* Encode one block (<= 64 KiB) into out; returns encoded length.
 * out must have room for max_compressed_len(n) bytes.
 *
 * `ways` (compile-time-specialized) selects the candidate table shape:
 * 1 = single entry per hash bucket (the reference's table, fastest);
 * 2 = two-entry LRU buckets (~0.5-2% denser output, ~10-15% slower) —
 * a level knob the reference does not offer. */
static inline uint32_t encode_block_impl(const uint8_t* in, uint32_t n,
                                         uint8_t* out, uint16_t* table,
                                         const int ways) {
  uint8_t* op = out;
  if (n < MIN_NON_LITERAL) {
    if (n) op = emit_literal(op, in, n, in + n);
    return (uint32_t)(op - out);
  }

  uint32_t table_size = 256;
  while (table_size < TABLE_SIZE && table_size < n) table_size <<= 1;
  int shift = 32 - __builtin_ctz(table_size);
  memset(table, 0, (size_t)ways * table_size * sizeof(uint16_t));

  const uint8_t* base = in;
  const uint8_t* ip = in + 1;
  const uint8_t* ip_limit = in + n - INPUT_MARGIN;
  const uint8_t* next_emit = in;
  const uint8_t* in_end = in + n;

  for (;;) {
    uint32_t skip = 32;
    const uint8_t* next_ip = ip;
    const uint8_t* candidate;

    /* probe loop with 1/32 skip heuristic (encoder.nim:256-331); the
     * reference's unrolled 4x4 dense phase was tried and measured slower
     * on this host's cores, so probes stay uniform */
    for (;;) {
      ip = next_ip;
      uint32_t step = skip >> 5;
      skip += step;
      next_ip = ip + step;
      if (next_ip > ip_limit) {
        if (next_emit < in_end)
          op = emit_literal(op, next_emit, (uint32_t)(in_end - next_emit), in_end);
        return (uint32_t)(op - out);
      }
      uint32_t cur = load32(ip);
      uint32_t h = hash32(cur, shift);
      if (ways == 1) {
        candidate = base + table[h];
        table[h] = (uint16_t)(ip - base);
        if (cur == load32(candidate)) break;
      } else {
        const uint8_t* c1 = base + table[2 * h];
        const uint8_t* c2 = base + table[2 * h + 1];
        table[2 * h + 1] = table[2 * h];
        table[2 * h] = (uint16_t)(ip - base);
        if (cur == load32(c1)) { candidate = c1; break; }
        if (cur == load32(c2)) { candidate = c2; break; }
      }
    }


    if (next_emit < ip)
      op = emit_literal(op, next_emit, (uint32_t)(ip - next_emit), in_end);

    /* match extension loop (encoder.nim:340-381) */
    for (;;) {
      const uint8_t* match_base = ip;
      uint32_t matched = 4 + match_length(candidate + 4, ip + 4, in_end);
      ip += matched;
      op = emit_copy(op, (uint32_t)(match_base - candidate), matched);
      next_emit = ip;
      if (ip > ip_limit) {
        if (next_emit < in_end)
          op = emit_literal(op, next_emit, (uint32_t)(in_end - next_emit), in_end);
        return (uint32_t)(op - out);
      }
      uint32_t prev = load32(ip - 1);
      uint32_t hp = hash32(prev, shift);
      uint32_t cur = load32(ip);
      uint32_t h = hash32(cur, shift);
      if (ways == 1) {
        table[hp] = (uint16_t)(ip - 1 - base);
        candidate = base + table[h];
        table[h] = (uint16_t)(ip - base);
        if (cur != load32(candidate)) {
          ip++;
          break;
        }
      } else {
        table[2 * hp + 1] = table[2 * hp];
        table[2 * hp] = (uint16_t)(ip - 1 - base);
        const uint8_t* c1 = base + table[2 * h];
        const uint8_t* c2 = base + table[2 * h + 1];
        table[2 * h + 1] = table[2 * h];
        table[2 * h] = (uint16_t)(ip - base);
        if (cur == load32(c1)) { candidate = c1; }
        else if (cur == load32(c2)) { candidate = c2; }
        else { ip++; break; }
      }
    }
  }
}

uint32_t stpu_encode_block(const uint8_t* in, uint32_t n, uint8_t* out,
                           uint16_t* table /* TABLE_SIZE entries, scratch */) {
  return encode_block_impl(in, n, out, table, 1);
}

uint32_t stpu_encode_block_l2(const uint8_t* in, uint32_t n, uint8_t* out,
                              uint16_t* table /* 2*TABLE_SIZE entries */) {
  return encode_block_impl(in, n, out, table, 2);
}

/* Encode a span of full blocks: writes concatenated block streams (no
 * varint header).  Returns total bytes written. */
size_t stpu_encode_span_level(const uint8_t* in, size_t n, uint8_t* out,
                              int level) {
  uint16_t table[2 * TABLE_SIZE];
  size_t written = 0;
  size_t pos = 0;
  while (pos < n) {
    uint32_t blen = (uint32_t)((n - pos < MAX_BLOCK) ? (n - pos) : MAX_BLOCK);
    written += (level >= 2)
                   ? stpu_encode_block_l2(in + pos, blen, out + written, table)
                   : stpu_encode_block(in + pos, blen, out + written, table);
    pos += blen;
  }
  return written;
}

size_t stpu_encode_span(const uint8_t* in, size_t n, uint8_t* out) {
  return stpu_encode_span_level(in, n, out, 1);
}

/* ---------------- decoder ---------------- */

/* Decode a raw tag stream (no varint header) into out[0..out_len).
 * Returns 0 on success (and *written == produced bytes), -1 on malformed
 * input.  Validation parity: decoder.nim:39-153.  Technique parity with
 * the reference's fast paths: unconditional 16-byte literal copies when
 * both sides have slack (decoder.nim:48-52), two-8-byte-word copy
 * expansion (decoder.nim:117-125), pattern-doubling for overlapping
 * copies with slack (decoder.nim:130-144), bytewise near the end. */
#define LIKELY(x) __builtin_expect(!!(x), 1)
#define UNLIKELY(x) __builtin_expect(!!(x), 0)

int stpu_decode_tags(const uint8_t* in, size_t n, uint8_t* out, size_t out_len,
                     size_t* written) {
  size_t i = 0;
  size_t o = 0;

  /* Fast region: enough input slack to read tags+16B blindly and enough
   * output slack that any single op (<=64B copy, <=16B literal burst plus
   * a 16B blind stamp) stays in bounds without per-op checks. */
  const size_t in_fast = n > 20 ? n - 20 : 0;
  const size_t out_fast = out_len > 96 ? out_len - 96 : 0;

  while (i < in_fast && o < out_fast) {
    uint32_t b = in[i];
    uint32_t t = b & 3;
    if (t == 0) {
      uint32_t lc = b >> 2;
      if (LIKELY(lc < 60)) {
        size_t len = lc + 1;
        if (UNLIKELY(len > n - i - 1)) return -1;
        memcpy(out + o, in + i + 1, 16); /* blind burst covers len <= 16 */
        if (UNLIKELY(len > 16)) memcpy(out + o, in + i + 1, len);
        i += 1 + len;
        o += len;
        continue;
      }
      /* length-extended literal (1-4 extra LE length bytes, blind-readable
       * inside the fast region); exact checks since len is unbounded */
      {
        uint32_t extra = lc - 59;
        uint32_t v = 0;
        for (uint32_t k = 0; k < extra; k++)
          v |= (uint32_t)in[i + 1 + k] << (8 * k);
        if (UNLIKELY(v >= 0xFFFFFFFFu)) return -1;
        size_t len = (size_t)v + 1;
        i += 1 + extra;
        if (UNLIKELY(len > n - i)) return -1;
        if (UNLIKELY(len > out_len - o)) return -1;
        memcpy(out + o, in + i, len);
        i += len;
        o += len;
        continue;
      }
    }
    uint32_t len, offset;
    if (t == 1) {
      len = 4 + ((b >> 2) & 7);
      offset = ((b & 0xE0) << 3) | in[i + 1];
      i += 2;
    } else if (t == 2) {
      len = 1 + (b >> 2);
      offset = (uint32_t)in[i + 1] | ((uint32_t)in[i + 2] << 8);
      i += 3;
    } else {
      len = 1 + (b >> 2);
      uint32_t v;
      memcpy(&v, in + i + 1, 4);
      offset = v;
      i += 5;
    }
    if (UNLIKELY(offset == 0 || (size_t)offset > o)) return -1;
    const uint8_t* src = out + o - offset;
    uint8_t* dst = out + o;
    o += len;
    if (LIKELY(offset >= 8)) {
      memcpy(dst, src, 8); /* blind 16B stamp covers len <= 16 */
      memcpy(dst + 8, src + 8, 8);
      if (UNLIKELY(len > 16)) {
        if (LIKELY(offset >= len)) {
          memcpy(dst, src, len);
        } else {
          size_t remaining = len, avail = offset;
          uint8_t* d = dst;
          while (remaining > 0) {
            size_t take = avail < remaining ? avail : remaining;
            memcpy(d, src, take);
            d += take;
            remaining -= take;
            avail += take;
          }
        }
      }
      continue;
    }
    if (offset == 1) {
      memset(dst, src[0], len);
      continue;
    }
    {
      size_t remaining = len, avail = offset;
      uint8_t* d = dst;
      while (remaining > 0) {
        size_t take = avail < remaining ? avail : remaining;
        memcpy(d, src, take);
        d += take;
        remaining -= take;
        avail += take;
      }
    }
  }

  /* Careful loop: exact bounds checks for the stream tail (and for
   * length-extended literals, which re-enter here). */
  while (i < n) {
    uint32_t b = in[i];
    uint32_t tag = b & 3;
    if (tag == 0) { /* literal */
      uint32_t lc = b >> 2;
      uint64_t len;
      if (lc < 60) {
        len = lc + 1;
        i += 1;
        /* fast path: 16-byte blind copy when both sides have 16B slack */
        if (len <= 16 && i + 16 <= n && o + 16 <= out_len) {
          memcpy(out + o, in + i, 16);
          o += len;
          i += len;
          continue;
        }
      } else {
        uint32_t extra = lc - 59; /* 1..4 */
        if (i + 1 + extra > n) return -1;
        uint32_t v = 0;
        for (uint32_t k = 0; k < extra; k++) v |= (uint32_t)in[i + 1 + k] << (8 * k);
        if (v >= 0xFFFFFFFFu) return -1; /* +1 would wrap uint32 */
        len = (uint64_t)v + 1;
        i += 1 + extra;
      }
      if (len > n - i) return -1;
      if (len > out_len - o) return -1;
      memcpy(out + o, in + i, len);
      o += len;
      i += len;
      continue;
    }
    uint32_t len, offset;
    if (tag == 1) {
      if (i + 2 > n) return -1;
      len = 4 + ((b >> 2) & 7);
      offset = ((b & 0xE0) << 3) | in[i + 1];
      i += 2;
    } else if (tag == 2) {
      if (i + 3 > n) return -1;
      len = 1 + (b >> 2);
      offset = (uint32_t)in[i + 1] | ((uint32_t)in[i + 2] << 8);
      i += 3;
    } else {
      if (i + 5 > n) return -1;
      len = 1 + (b >> 2);
      offset = (uint32_t)in[i + 1] | ((uint32_t)in[i + 2] << 8) |
               ((uint32_t)in[i + 3] << 16) | ((uint32_t)in[i + 4] << 24);
      i += 5;
    }
    if (offset == 0 || (size_t)offset > o) return -1;
    if ((size_t)len > out_len - o) return -1;
    const uint8_t* src = out + o - offset;
    uint8_t* dst = out + o;
    o += len;
    if (len <= 16 && offset >= 8 && o + 16 <= out_len) {
      /* two blind 8-byte word copies (decoder.nim:117-125) */
      memcpy(dst, src, 8);
      memcpy(dst + 8, src + 8, 8);
      continue;
    }
    if (offset >= len) {
      memcpy(dst, src, len); /* fully non-overlapping */
      continue;
    }
    if (offset == 1) {
      memset(dst, src[0], len);
      continue;
    }
    /* Overlapping: window doubling — each round copies the valid pattern
       window behind the cursor, which then doubles (decoder.nim:130-144). */
    {
      uint8_t* d = dst;
      size_t remaining = len;
      size_t avail = offset;
      while (remaining > 0) {
        size_t take = avail < remaining ? avail : remaining;
        memcpy(d, src, take); /* src + take <= d: disjoint */
        d += take;
        remaining -= take;
        avail += take;
      }
    }
  }
  *written = o;
  return 0;
}

/* ---------------- framed slab pipelines ---------------- */

/* From crc32c.c (compiled into the same shared object). */
extern uint32_t snappy_tpu_masked_crc32c(const uint8_t* buf, size_t len);

static inline uint8_t* put_varint(uint8_t* p, uint32_t v) {
  while (v >= 0x80) {
    *p++ = (uint8_t)(v | 0x80);
    v >>= 7;
  }
  *p++ = (uint8_t)v;
  return p;
}

#define CHUNK_COMPRESSED 0x00
#define CHUNK_UNCOMPRESSED 0x01
#define MIN_NON_LITERAL_FRAME 17u

/* Compress frames covering in[lo, hi) (lo must be 64 KiB aligned within the
 * logical stream) into framed chunks at outbuf.  Implements the reference's
 * per-frame contract: masked CRC of the payload, compressed form kept only
 * when it saves >= 1/8 (encoder.nim:385-426).  Returns bytes written. */
size_t stpu_encode_framed_slab_level(const uint8_t* in, size_t lo, size_t hi,
                                     uint8_t* outbuf, int level) {
  uint16_t table[2 * TABLE_SIZE];
  uint8_t scratch[MAX_BLOCK + MAX_BLOCK / 6 + 64];
  uint8_t* op = outbuf;
  for (size_t fs = lo; fs < hi; fs += MAX_BLOCK) {
    uint32_t flen = (uint32_t)((hi - fs < MAX_BLOCK) ? (hi - fs) : MAX_BLOCK);
    uint32_t crc = snappy_tpu_masked_crc32c(in + fs, flen);
    uint8_t* blob = scratch;
    uint8_t* bp = put_varint(blob, flen);
    uint32_t blob_len = 0;
    int tried = 0;
    uint32_t enc_len = 0;
    if (flen >= MIN_NON_LITERAL_FRAME) {
      enc_len = (level >= 2) ? stpu_encode_block_l2(in + fs, flen, bp, table)
                             : stpu_encode_block(in + fs, flen, bp, table);
      blob_len = (uint32_t)(bp - blob) + enc_len;
      tried = 1;
    }
    /* Keep-compressed threshold on the encoded block alone, the varint
     * header excluded — the reference compares blockLen (encoder.nim:408). */
    if (tried && enc_len <= flen - flen / 8) {
      uint32_t data_len = 4 + blob_len;
      *op++ = CHUNK_COMPRESSED;
      *op++ = (uint8_t)(data_len & 0xFF);
      *op++ = (uint8_t)((data_len >> 8) & 0xFF);
      *op++ = (uint8_t)((data_len >> 16) & 0xFF);
      memcpy(op, &crc, 4);
      op += 4;
      memcpy(op, blob, blob_len);
      op += blob_len;
    } else {
      uint32_t data_len = 4 + flen;
      *op++ = CHUNK_UNCOMPRESSED;
      *op++ = (uint8_t)(data_len & 0xFF);
      *op++ = (uint8_t)((data_len >> 8) & 0xFF);
      *op++ = (uint8_t)((data_len >> 16) & 0xFF);
      memcpy(op, &crc, 4);
      op += 4;
      memcpy(op, in + fs, flen);
      op += flen;
    }
  }
  return (size_t)(op - outbuf);
}

size_t stpu_encode_framed_slab(const uint8_t* in, size_t lo, size_t hi,
                               uint8_t* outbuf) {
  return stpu_encode_framed_slab_level(in, lo, hi, outbuf, 1);
}

/* Decode a slab of framed chunks directly into their output offsets.
 * Arrays describe n chunks: kinds (0 compressed / 1 verbatim), source
 * offset/length of the tag stream or payload within `stream`, declared
 * output length, absolute output offset, stored masked CRC.
 * Returns 0 on success, 1 on malformed data, 2 on CRC mismatch. */
int stpu_decode_framed_slab(const uint8_t* stream, const uint8_t* kinds,
                            const int64_t* src_off, const int64_t* src_len,
                            const int64_t* declared, const int64_t* out_off,
                            const uint32_t* stored_crc, int n, uint8_t* out,
                            int check_crc) {
  for (int k = 0; k < n; k++) {
    uint8_t* dst = out + out_off[k];
    size_t want = (size_t)declared[k];
    if (kinds[k] == 0) {
      size_t written = 0;
      if (stpu_decode_tags(stream + src_off[k], (size_t)src_len[k], dst, want,
                           &written) != 0 ||
          written != want)
        return 1;
    } else {
      memcpy(dst, stream + src_off[k], want);
    }
    if (check_crc && snappy_tpu_masked_crc32c(dst, want) != stored_crc[k])
      return 2;
  }
  return 0;
}

int stpu_using_native(void) { return 1; }
