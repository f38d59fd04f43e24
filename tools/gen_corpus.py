#!/usr/bin/env python
"""Generate a small deterministic test corpus for fuzz/sanitizer legs.

CI runners don't have the reference benchmark corpus checked out
(/root/reference/tests/data), so the sanitizer and fuzz harnesses need
self-contained inputs.  This writes a handful of files spanning the
compression-relevant regimes — wordy text (copy-rich), markup (mixed
literal/copy), RLE runs (overlapping copies), incompressible bytes, and
a couple of hand-made malformed snappy streams — all from a fixed seed,
so every run produces byte-identical files.

Usage: python tools/gen_corpus.py OUTDIR
"""

import os
import random
import sys


def _words(rng, n_vocab=800):
    vocab = []
    for _ in range(n_vocab):
        ln = rng.randint(2, 11)
        vocab.append(
            "".join(rng.choice("etaoinshrdlucmfwypvbgkjqxz") for _ in range(ln))
        )
    return vocab


def gen_text(rng, size):
    """English-like text: zipfy word reuse gives snappy real matches."""
    vocab = _words(rng)
    out = []
    total = 0
    while total < size:
        # zipf-ish: low indexes picked far more often
        w = vocab[min(int(rng.expovariate(1 / 80.0)), len(vocab) - 1)]
        out.append(w)
        total += len(w) + 1
    blob = " ".join(out).encode()
    return blob[:size]


def gen_markup(rng, size):
    """HTML-ish markup: long repeated tags + varying attribute text."""
    tags = ["<div class='r%d'>", "<span id='x%d'>", "<a href='/p/%d'>", "<td>%d</td>"]
    out = []
    total = 0
    while total < size:
        t = rng.choice(tags) % rng.randint(0, 999)
        out.append(t)
        total += len(t)
    return "".join(out).encode()[:size]


def gen_rle(rng, size):
    """Long single-byte runs: exercises overlapping-copy expansion."""
    out = bytearray()
    while len(out) < size:
        out += bytes([rng.randint(0, 255)]) * rng.randint(30, 4000)
    return bytes(out[:size])


def gen_random(rng, size):
    """Incompressible: every block should be stored as a literal."""
    return bytes(rng.getrandbits(8) for _ in range(size))


def gen_baddata(rng, kind):
    """Hand-made malformed raw-snappy streams (decoder rejection food)."""
    if kind == 0:  # declared length far beyond the payload
        return b"\xff\xff\xff\x7f" + bytes(rng.getrandbits(8) for _ in range(64))
    if kind == 1:  # copy with offset 0
        return b"\x08" + b"\x04aaaa" + b"\x01\x00"
    # truncated extended literal
    return b"\x20\xf0"


def main(outdir):
    os.makedirs(outdir, exist_ok=True)
    rng = random.Random(0xC0FFEE)
    files = {
        "gen_text.txt": gen_text(rng, 180_000),
        "gen_markup.html": gen_markup(rng, 120_000),
        "gen_rle.bin": gen_rle(rng, 100_000),
        "gen_random.bin": gen_random(rng, 80_000),
        "gen_small.txt": gen_text(rng, 900),
        "gen_bad1.snappy": gen_baddata(rng, 0),
        "gen_bad2.snappy": gen_baddata(rng, 1),
        "gen_bad3.snappy": gen_baddata(rng, 2),
    }
    for name, blob in files.items():
        with open(os.path.join(outdir, name), "wb") as f:
            f.write(blob)
    print(f"wrote {len(files)} corpus files to {outdir}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "build/corpus")
