"""Per-stage throughput metrics and profiling (the observability subsystem).

The reference has no tracing/profiling — progress is tqdm bars in frame loops
(SURVEY.md §5). Here stage metrics are first-class:

- ``StageTimer``: context manager accumulating (stage → frames, seconds) into
  a process-global registry, cheap enough to leave on in production.
- ``report()``: per-stage frames/sec table.
- ``trace()``: wraps a block in ``jax.profiler`` trace collection for
  device-level inspection (XLA op breakdown) when JAX profiling is available.
"""

from __future__ import annotations

import contextlib
import threading
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

_lock = threading.Lock()
_stats: Dict[str, Dict[str, float]] = defaultdict(lambda: {"frames": 0.0, "seconds": 0.0,
                                                           "calls": 0.0})


@contextlib.contextmanager
def StageTimer(stage: str, frames: int = 0) -> Iterator[None]:
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        with _lock:
            s = _stats[stage]
            s["frames"] += frames
            s["seconds"] += dt
            s["calls"] += 1


def record(stage: str, frames: int, seconds: float) -> None:
    with _lock:
        s = _stats[stage]
        s["frames"] += frames
        s["seconds"] += seconds
        s["calls"] += 1


def report(reset: bool = False) -> Dict[str, Dict[str, float]]:
    """Snapshot {stage: {frames, seconds, calls, fps}}."""
    with _lock:
        out = {}
        for stage, s in _stats.items():
            fps = s["frames"] / s["seconds"] if s["seconds"] > 0 else 0.0
            out[stage] = dict(s, fps=round(fps, 2))
        if reset:
            _stats.clear()
    return out


def format_report(reset: bool = False) -> str:
    rows = report(reset=reset)
    lines = [f"{'stage':<28}{'frames':>10}{'seconds':>10}{'fps':>10}"]
    for stage, s in sorted(rows.items()):
        lines.append(f"{stage:<28}{int(s['frames']):>10}{s['seconds']:>10.2f}{s['fps']:>10.2f}")
    return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/ppt_jax_trace") -> Iterator[None]:
    """Device-level profiler trace around a block (view with XProf/TensorBoard)."""
    import jax

    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
