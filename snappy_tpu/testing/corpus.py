"""Locate the canonical Snappy benchmark corpus and golden files.

The reference ships the standard corpus in /root/reference/tests/data and
pre-compressed framed streams in /root/reference/tests/stream_compressed
(SURVEY §2.1 "Golden data").  We read those files in place (read-only) as the
differential anchor: the golden ``.rawsnappy`` encoding was produced by C++
google/snappy, so bit-exact decode of it validates our decoder against the
real implementation without linking C++.

Set SNAPPY_TPU_CORPUS to override the location; tests skip gracefully when
the corpus is unavailable.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import List, Optional

_DEFAULT_ROOTS = [
    Path(os.environ.get("SNAPPY_TPU_CORPUS", "")),
    Path("/root/reference/tests"),
]

# The benchmark corpus (tests/benchmark.nim / README.md table).
CORPUS_FILES = [
    "html",
    "urls.10K",
    "fireworks.jpeg",
    "paper-100k.pdf",
    "html_x_4",
    "alice29.txt",
    "asyoulik.txt",
    "lcet10.txt",
    "plrabn12.txt",
    "geo.protodata",
    "kppkn.gtb",
    "Mark.Twain-Tom.Sawyer.txt",
]

BAD_FILES = ["baddata1.snappy", "baddata2.snappy", "baddata3.snappy"]

# Pre-compressed framed streams: (compressed, plaintext) pairs
# (test_framed.nim:117-119 decodes all three).
STREAM_FILES = [
    ("alice29.txt.sz-32k", "alice29.txt"),
    ("alice29.txt.sz-64k", "alice29.txt"),
    ("house.jpg.sz", "house.jpg"),
]

GOLDEN_RAWSNAPPY = "Mark.Twain-Tom.Sawyer.txt.rawsnappy"


def corpus_root() -> Optional[Path]:
    for root in _DEFAULT_ROOTS:
        if root and (root / "data").is_dir():
            return root
    return None


def data_path(name: str) -> Optional[Path]:
    root = corpus_root()
    if root is None:
        return None
    p = root / "data" / name
    return p if p.is_file() else None


def stream_path(name: str) -> Optional[Path]:
    root = corpus_root()
    if root is None:
        return None
    p = root / "stream_compressed" / name
    return p if p.is_file() else None


def read_data(name: str) -> Optional[bytes]:
    p = data_path(name)
    return p.read_bytes() if p else None


def read_stream(name: str) -> Optional[bytes]:
    p = stream_path(name)
    return p.read_bytes() if p else None


def available_corpus() -> List[str]:
    return [n for n in CORPUS_FILES if data_path(n)]
