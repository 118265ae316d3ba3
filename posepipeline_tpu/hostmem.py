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


def prefault_arena(num_bytes: int = 1 << 30,
                   budget_s: float = 60.0) -> int:
    """Touch up to ``num_bytes`` of heap once so steady-state never
    page-faults. Returns the number of bytes actually faulted.

    Two hard-won rules from the virtualized bench host:

    - Fault densely (sequential whole-page writes via ``fill``), never a
      one-byte-per-page strided loop: strided first-touch forfeits the
      kernel's fault-around batching and pays a full VM exit per page
      (measured 1.7 ms/page vs ~250 µs/page dense on cold frames — a 2 GB
      strided prefault took 15 minutes).
    - Bound the work by wall clock, not just size: faulting guest-physical
      frames the VM has never touched goes through the hypervisor and its
      cost varies 70 µs → 1.7 ms per page with host memory pressure. The
      prefault is an optimization; it must never become the startup wall.
      Steady-state buffers are warmed by the caller's warmup pass anyway —
      the arena only widens coverage for allocation-pattern variance.
    """
    import time

    import numpy as np

    configure_allocator()
    arena = np.empty(num_bytes, np.uint8)
    slab = 64 << 20
    t0 = time.perf_counter()
    done = 0
    for off in range(0, num_bytes, slab):
        arena[off:off + slab].fill(1)
        done = min(off + slab, num_bytes)
        if time.perf_counter() - t0 > budget_s:
            break
    del arena
    return done
