"""Host allocator tuning for high-throughput frame pipelines.

Some sandboxed/virtualized hosts serve first-touch page faults extremely
slowly (measured ~70 µs/page ⇒ 14 s to touch one fresh 200 MB frame batch).
glibc's default behavior — mmap() for large allocations and munmap() on free —
makes every decoded batch pay that cost again.

``configure_allocator()`` switches glibc to heap-retention mode (no mmap for
large blocks, never trim), so frame-batch buffers recycle already-faulted
pages: steady-state allocation cost drops from seconds to ~20 ms.
``prefault_arena()`` optionally pays the one-time fault cost up front.

Called automatically on media-layer import; safe and idempotent everywhere
(no-ops on non-glibc platforms).
"""

from __future__ import annotations

import ctypes
import os

_configured = False

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3
_M_MMAP_MAX = -4


def configure_allocator() -> bool:
    """Keep large allocations on the retained heap (idempotent)."""
    global _configured
    if _configured:
        return True
    if os.environ.get("PPT_NO_MALLOPT"):
        return False
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        ok = bool(libc.mallopt(_M_MMAP_MAX, 0))
        ok &= bool(libc.mallopt(_M_TRIM_THRESHOLD, -1))
        _configured = ok
        return ok
    except (OSError, AttributeError):
        return False


def prefault_arena(num_bytes: int = 1 << 30) -> None:
    """Touch ``num_bytes`` of heap once so steady-state never page-faults."""
    import numpy as np

    configure_allocator()
    arena = np.empty(num_bytes, np.uint8)
    arena[:: 4096] = 1  # one write per page
    del arena
