"""Host allocator tuning tests."""

import numpy as np


def test_configure_allocator_idempotent():
    from posepipeline_tpu import hostmem

    first = hostmem.configure_allocator()
    second = hostmem.configure_allocator()
    assert second == first or second  # idempotent; True on glibc hosts


def test_prefault_arena_runs():
    from posepipeline_tpu import hostmem

    # small arena completes fully and reports coverage
    assert hostmem.prefault_arena(16 << 20) == 16 << 20


def test_prefault_arena_budget_bounded():
    """The prefault must stop near its wall-clock budget instead of
    becoming the startup wall on hosts with degraded fault latency
    (PERF.md round-3 note: cold faults vary 70 µs → 1.7 ms/page)."""
    import time

    from posepipeline_tpu import hostmem

    t0 = time.perf_counter()
    done = hostmem.prefault_arena(1 << 30, budget_s=0.05)
    dt = time.perf_counter() - t0
    assert 0 < done <= 1 << 30
    # one 64 MB slab may overshoot the budget; even at the worst measured
    # fault rate that is far below the unbounded 1 GB cost
    assert dt < 60.0, f"budget-bounded prefault took {dt:.2f}s"


def test_steady_state_allocations_fast_after_warmup():
    """After warmup, fresh large allocations must reuse heap pages (the
    property the frame pipeline depends on)."""
    import time

    from posepipeline_tpu import hostmem

    hostmem.configure_allocator()
    size = 64 << 20
    # warm: fault the pages once
    a = np.empty(size, np.uint8)
    a.fill(1)
    del a
    t0 = time.perf_counter()
    b = np.empty(size, np.uint8)
    b.fill(2)
    dt = time.perf_counter() - t0
    del b
    # generous bound: reused 64MB fill should take well under a second even
    # on a contended single-core host (fresh-fault pathology is ~4.5s here)
    assert dt < 1.5, f"steady-state 64MB alloc+fill took {dt:.2f}s"
