"""Mesh distribution: sharded block/frame codec pipelines."""

from .mesh import (  # noqa: F401
    default_mesh,
    sharded_framed_compress,
    sharded_framed_uncompress,
    sharded_raw_compress,
)
