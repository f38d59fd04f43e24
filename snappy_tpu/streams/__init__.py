"""Stream adapters (sync + asyncio) over the batched device engine."""

from . import aio, sync  # noqa: F401
from .sync import (  # noqa: F401
    compress,
    compress_bytes,
    compress_framed,
    compress_framed_bytes,
    uncompress_framed,
    uncompress_framed_bytes,
)
