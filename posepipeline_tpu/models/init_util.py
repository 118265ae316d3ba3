"""Model initialization helpers.

``init_on_cpu`` runs flax ``Module.init`` on the host CPU backend when one is
available: initializer programs are many tiny ops, which is pathological
through a remote-accelerator link (measured ~150 s for a ViT init via the
tunnel vs <1 s on host). Parameters transfer to the accelerator lazily on
first use inside the jitted apply.
"""

from __future__ import annotations

import jax


def init_on_cpu(init_fn, *args, **kwargs):
    # jit the whole init program: eager flax init dispatches hundreds of
    # tiny ops that each pay a compile+dispatch round (measured 93 s vs
    # 10 s jitted for a small conv net on the CPU backend)
    jit_init = jax.jit(init_fn)
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        return jit_init(*args, **kwargs)
    with jax.default_device(cpu):
        params = jit_init(*args, **kwargs)
    # Move to the default accelerator ONCE. Leaving params CPU-resident makes
    # every jitted apply re-transfer the full parameter set (observed: seconds
    # per call through the remote-device link).
    default = jax.devices()[0]
    if default.platform != "cpu":
        params = jax.device_put(params, default)
    return params


def enable_compilation_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache (big win when compiles are remote:
    measured 117 s → 12 s for a first call across processes).

    Defaults to the repo-local ``.jax_cache`` (committed, so fresh checkouts
    warm-start) with ``/tmp/jax_compilation_cache`` as fallback.
    """
    import os

    if path is None:
        repo_root = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
        candidate = os.path.join(repo_root, ".jax_cache")
        try:
            os.makedirs(candidate, exist_ok=True)
            probe = os.path.join(candidate, ".probe")
            with open(probe, "w") as f:
                f.write("")
            os.remove(probe)
            path = candidate
        except OSError:
            path = "/tmp/jax_compilation_cache"
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        # XLA:CPU AOT executables embed compile-machine tuning flags
        # (+prefer-no-scatter/…) that fail strict feature checks when the
        # compiling context differs from the loading one (observed with the
        # remote-TPU tunnel: noisy cpu_aot_loader errors on every load).
        # Keep the jax-level compiled-module cache, skip XLA's AOT caches.
        jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    except Exception:
        pass
