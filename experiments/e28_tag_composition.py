"""E28: tag-stream composition of the corpus — what does the per-tag cost
actually pay for on each class, and what is coalescable beyond the round-3
max-length-copy runs?

Pure host analysis: encode each corpus file with the production encoder,
walk the tag stream, and bucket output bytes by tag kind / length / run
structure.  Run categories measured:
  A. runs of byte-identical tags (round-3 coalescer catches the max-len
     copy2 case, 0xFE..; this counts ALL identical-tag runs)
  B. runs of copies sharing one offset, lengths varying
  C. literal runs (consecutive literal tags -- shouldn't exist: encoder
     merges, but framed chunk boundaries can split)
  D. alternation cells: literal<=16 followed by copy (the classic text cell)
"""
import sys, os, collections
sys.path.insert(0, '/root/repo')
import snappy_tpu as s
from snappy_tpu.formats import varint

ddir = '/root/reference/tests/data/'


def parse_tags(body):
    """Yield (kind, tag_bytes, out_len, offset) per tag. kind: 0=lit 1/2/4=copy."""
    i, n = 0, len(body)
    while i < n:
        t = body[i]
        k = t & 3
        if k == 0:
            l = (t >> 2) + 1
            if l > 60:
                nb = l - 60
                l = int.from_bytes(body[i + 1:i + 1 + nb], 'little') + 1
                i += 1 + nb
            else:
                i += 1
            yield (0, 0, l, 0)
            i += l
        elif k == 1:
            l = 4 + ((t >> 2) & 7)
            off = ((t & 0xE0) << 3) | body[i + 1]
            yield (1, (t, body[i + 1]), l, off)
            i += 2
        elif k == 2:
            l = 1 + (t >> 2)
            off = body[i + 1] | (body[i + 2] << 8)
            yield (2, (t, body[i + 1], body[i + 2]), l, off)
            i += 3
        else:
            l = 1 + (t >> 2)
            off = int.from_bytes(body[i + 1:i + 5], 'little')
            yield (4, None, l, off)
            i += 5


def analyze(name, payload):
    enc = s.encode(payload)
    _, v = varint.decode_uint32(enc)
    tags = list(parse_tags(enc[v:]))
    total = sum(t[2] for t in tags)
    n_tags = len(tags)
    by_kind = collections.Counter()
    bytes_by_kind = collections.Counter()
    for k, _, l, _ in tags:
        by_kind[k] += 1
        bytes_by_kind[k] += l

    # A: identical-tag runs (>=3 long to be worth a lookahead)
    a_bytes = 0
    i = 0
    while i < n_tags:
        j = i
        if tags[i][0] != 0:
            while j + 1 < n_tags and tags[j + 1][:2] == tags[i][:2] and tags[i][1] is not None:
                j += 1
        if j - i + 1 >= 3:
            a_bytes += sum(t[2] for t in tags[i:j + 1])
        i = j + 1

    # B: same-offset copy runs (lengths vary), >=3
    b_bytes = 0
    i = 0
    while i < n_tags:
        j = i
        if tags[i][0] != 0:
            while j + 1 < n_tags and tags[j + 1][0] != 0 and tags[j + 1][3] == tags[i][3]:
                j += 1
        if j - i + 1 >= 3:
            b_bytes += sum(t[2] for t in tags[i:j + 1])
        i = j + 1

    # D: lit(<=16)+copy cells
    d_bytes = 0
    d_cells = 0
    for p in range(n_tags - 1):
        if tags[p][0] == 0 and tags[p][2] <= 16 and tags[p + 1][0] != 0:
            d_bytes += tags[p][2] + tags[p + 1][2]
            d_cells += 1

    # copy length histogram buckets
    cl = collections.Counter()
    for k, _, l, _ in tags:
        if k != 0:
            cl['4-8' if l <= 8 else '9-16' if l <= 16 else '17-32' if l <= 32 else '33-63' if l <= 63 else '64'] += 1
    lit = collections.Counter()
    for k, _, l, _ in tags:
        if k == 0:
            lit['1-8' if l <= 8 else '9-16' if l <= 16 else '17-60' if l <= 60 else '61-2k' if l <= 2048 else '>2k'] += 1

    print(f"{name:28s} out={total/1e3:8.1f}kB tags={n_tags:7d} B/tag={total/max(n_tags,1):6.1f} "
          f"lit%={100*bytes_by_kind[0]/total:5.1f} c1%={100*bytes_by_kind[1]/total:5.1f} "
          f"c2%={100*bytes_by_kind[2]/total:5.1f}")
    print(f"   runsA(id-tag)={100*a_bytes/total:5.1f}%  runsB(same-off)={100*b_bytes/total:5.1f}%  "
          f"litcopy-cells={100*d_bytes/total:5.1f}% ({d_cells} cells)")
    print(f"   copy-len: {dict(cl)}")
    print(f"   lit-len:  {dict(lit)}")


for name in sorted(os.listdir(ddir)):
    if name.endswith(('.rawsnappy', '.snappy')) or name == 'COPYING':
        continue
    payload = open(ddir + name, 'rb').read()
    analyze(name, payload)


# --- second pass: coverage of "0xFE-led runs with same-offset tail merge"
# (runsC) vs the general same-offset form (runsB), and tag-count savings ---
def analyze2(name, payload):
    enc = s.encode(payload)
    _, v = varint.decode_uint32(enc)
    tags = list(parse_tags(enc[v:]))
    total = sum(t[2] for t in tags)
    n_tags = len(tags)
    c_bytes = 0
    c_tags_saved = 0
    i = 0
    while i < n_tags:
        k, tb, l, off = tags[i]
        if k == 2 and l == 64:  # 0xFE-led
            j = i
            # identical continuation
            while (j + 1 < n_tags and tags[j + 1][:2] == tags[i][:2]):
                j += 1
            # one same-offset c2 tail merge
            if (j + 1 < n_tags and tags[j + 1][0] == 2
                    and tags[j + 1][3] == off):
                j += 1
            if j > i:
                c_bytes += sum(t[2] for t in tags[i:j + 1])
                c_tags_saved += j - i
            i = j + 1
        else:
            i += 1
    print(f"{name:28s} runsC={100*c_bytes/total:5.1f}% of bytes, "
          f"tags saved {c_tags_saved}/{n_tags} = {100*c_tags_saved/n_tags:4.1f}%")


print("\n--- runsC (0xFE-led + same-off tail) ---")
for name in sorted(os.listdir(ddir)):
    if name.endswith(('.rawsnappy', '.snappy')) or name == 'COPYING':
        continue
    analyze2(name, open(ddir + name, 'rb').read())
