"""snappy_tpu — a TPU-native Snappy codec framework.

A from-scratch JAX/XLA/Pallas implementation of Google's Snappy raw block
format and framed format (with masked CRC32C), with the capabilities of the
reference implementation status-im/nim-snappy re-designed as data-parallel
device kernels: block/frame data parallelism over device meshes, speculative
tag parsing with pointer doubling, sort-based match finding, prefix-sum
compaction, and GF(2)-combined on-chip CRC32C.

Public API surface (see api.py for the reference-parity table):

    encode / decode                      raw format, bytes in/out
    encode_batch / decode_batch          many raw streams, batched dispatch
    compress_into / uncompress_into      raw format, caller buffers, Result
    encode_framed / decode_framed        framed format, bytes in/out
    compress_framed_into                 framed, caller buffer, Result
    uncompress_framed_into               resumable framed decode, Result
    uncompressed_len[_framed]            stream sizing
    max_compressed_len[_framed]          worst-case output sizing
    is_framed_stream                     magic sniff
    masked_crc32c                        masked CRC32C (backend-routed)
"""

from .api import (  # noqa: F401
    compress_framed_into,
    compress_into,
    decode,
    decode_batch,
    decode_framed,
    encode,
    encode_batch,
    encode_framed,
    is_framed_stream,
    uncompress_framed_into,
    uncompress_into,
    uncompressed_len,
    uncompressed_len_framed,
)
from .engine import masked_crc32c  # noqa: F401
from .formats.constants import (  # noqa: F401
    max_compressed_len,
    max_compressed_len_framed,
)
from .formats.errors import (  # noqa: F401
    CodecError,
    Err,
    FrameError,
    InputTooLarge,
    MalformedSnappyData,
    Ok,
    SnappyDecodingError,
    SnappyEncodingError,
    SnappyError,
    UnexpectedEofError,
)

# Kept in sync with pyproject.toml (pinned by tests/test_api.py).
__version__ = "0.6.0"
