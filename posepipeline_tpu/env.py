"""Environment compatibility shims.

The reference manages 19 external model repos and GPU memory splits through
``pose_pipeline/env.py`` (``set_environmental_variables`` :30-71, ``add_path``
:9-27, ``pytorch_memory_limit``/``tensorflow_memory_limit`` :95-118). The TPU
framework has no external repos or GPU co-tenancy, so these exist as
API-compatible shims: ``add_path`` still works (it is occasionally useful),
the memory limiters are no-ops with explanations, and
``set_environmental_variables`` configures the TPU-relevant knobs instead
(compilation cache, host thread pools).
"""

from __future__ import annotations

import os
import sys


class add_path:
    """Context manager temporarily prepending path(s) to sys.path
    (reference env.py:9-27)."""

    def __init__(self, path):
        self.path = path if isinstance(path, (list, tuple)) else [path]

    def __enter__(self):
        for p in reversed(self.path):
            sys.path.insert(0, p)
        return self

    def __exit__(self, exc_type, exc, tb):
        for p in self.path:
            try:
                sys.path.remove(p)
            except ValueError:
                pass
        return False


def set_environmental_variables():
    """TPU-relevant environment setup (replaces the reference's 19 external
    repo paths, env.py:30-71): persistent compilation cache + host threads."""
    from .models.init_util import enable_compilation_cache

    enable_compilation_cache()
    # actual core count, no floor: oversubscribing cv2 decode threads on
    # small hosts regresses decode ~4x (media/video.py measurement)
    os.environ.setdefault("PPT_CV2_THREADS", str(os.cpu_count() or 1))


def pytorch_memory_limit(frac: float = 0.5):
    """No-op: the reference split one GPU between torch and TF
    (env.py:95-101); TPU inference here has no torch device tenancy."""


def tensorflow_memory_limit():
    """No-op: see :func:`pytorch_memory_limit`."""
