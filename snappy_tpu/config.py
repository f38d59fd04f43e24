"""Runtime configuration: codec backend selection.

Two execution paths provide identical semantics (cross-tested):

* ``device`` — the JAX/XLA kernels: data-parallel decode/encode batched on
  the accelerator, with on-chip CRC32C.  The right path when payloads
  already live (or are headed) in device memory, and the only path for the
  ``parallel`` mesh APIs.
* ``host`` — the native C runtime (ops/native/snappy_codec.c) with
  thread fan-out over 64 KiB block spans.  The right path for host-resident
  bytes: byte-pointer chasing is the one workload shape where a scalar core
  beats a vector core, so small one-shot ``bytes -> bytes`` calls route
  here by default.

``auto`` (default) picks ``host`` when the native library is available and
``device`` otherwise.  Select explicitly with ``set_backend`` or the
``SNAPPY_TPU_BACKEND`` environment variable.
"""

from __future__ import annotations

import os

_VALID = ("auto", "device", "host")


def device_relay_reachable() -> bool:
    """Pre-flight for tunneled-TPU environments: the chip is reached
    through a local stdio relay (PALLAS_AXON_POOL_IPS) listening on
    127.0.0.1:8082+; when the relay dies, EVERY jax call — even
    ``jax.devices()`` — hangs forever.  Probe the socket (2 s) before
    dispatching device work.  Returns True outside relay environments
    (let jax decide)."""
    import socket

    ips = os.environ.get("PALLAS_AXON_POOL_IPS")
    if not ips:
        return True
    # Probe every pool host (first responsive wins): a single dead relay
    # must not mark the whole pool unreachable.
    for host in filter(None, (h.strip() for h in ips.split(","))):
        for port in (8082, 8092, 8102, 8112):
            try:
                with socket.create_connection((host, port), timeout=2):
                    return True
            except OSError:
                continue
    return False


def ensure_compilation_cache() -> None:
    """Point JAX at a persistent compilation cache (opt out with
    SNAPPY_TPU_NO_COMPILE_CACHE=1).

    The scalar-core Pallas kernels take minutes to compile on remote-compile
    TPU environments; the on-disk cache makes that a one-time cost per
    kernel shape.  No-op if the user already configured a cache dir.
    """
    if os.environ.get("SNAPPY_TPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            jax.config.update(
                "jax_compilation_cache_dir",
                os.path.join(
                    os.environ.get("XDG_CACHE_HOME")
                    or os.path.join(os.path.expanduser("~"), ".cache"),
                    "jax_compilation",
                ),
            )
    except Exception:  # pragma: no cover - cache is best-effort
        pass
_backend = os.environ.get("SNAPPY_TPU_BACKEND", "auto")
if _backend not in _VALID:
    _backend = "auto"


def set_backend(name: str) -> None:
    global _backend
    if name not in _VALID:
        raise ValueError(f"backend must be one of {_VALID}")
    _backend = name


def get_backend() -> str:
    return _backend


def resolve_backend() -> str:
    """Resolve 'auto' to a concrete backend."""
    if _backend != "auto":
        return _backend
    from .ops import host_codec

    return "host" if host_codec.available() else "device"
