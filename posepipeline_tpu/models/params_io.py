"""Parameter checkpoint IO: flat-npz save/load for Flax pytrees.

The reference distributes pretrained torch checkpoints per model repo
(INSTALL.md:28-37, MODEL_DATA_DIR); here model parameters are stored as flat
``.npz`` archives (path-joined keys, e.g. ``params/ViT_0/pos_embed``) written
by scripts/train_synthetic.py or tools/convert_weights.py and loaded back into
model registries via ``params_path=`` arguments or the ``PPT_WEIGHTS_DIR``
environment variable (the registry looks for ``<dir>/<kind>__<name>.npz``).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

SEP = "/"


def flatten_tree(tree, prefix: str = "") -> Dict[str, np.ndarray]:
    flat = {}
    for k, v in tree.items():
        key = f"{prefix}{SEP}{k}" if prefix else str(k)
        if isinstance(v, dict):
            flat.update(flatten_tree(v, key))
        else:
            flat[key] = np.asarray(v)
    return flat


def unflatten_tree(flat: Dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split(SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_params(path: str, params) -> int:
    """Write a Flax param pytree (e.g. ``{"params": {...}}``) as flat npz.
    Returns the number of arrays written."""
    flat = flatten_tree(params)
    np.savez(path, **flat)
    return len(flat)


def load_params(path: str) -> dict:
    """Load a flat npz back into a nested pytree."""
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    return unflatten_tree(flat)


def merge_params(initialized, loaded, path: str = "") -> dict:
    """Graft ``loaded`` subtrees onto an initialized pytree, validating that
    every loaded leaf exists with a matching shape (catching layout drift
    loudly instead of silently misloading)."""
    out = dict(initialized)
    for k, v in loaded.items():
        where = f"{path}{SEP}{k}" if path else str(k)
        if k not in initialized:
            raise KeyError(f"loaded parameter {where!r} not in model")
        if isinstance(v, dict):
            if not isinstance(initialized[k], dict):
                raise TypeError(f"{where!r}: tree/leaf mismatch")
            out[k] = merge_params(initialized[k], v, where)
        else:
            cur = np.asarray(initialized[k])
            new = np.asarray(v)
            if cur.shape != new.shape:
                raise ValueError(
                    f"{where!r}: shape {new.shape} != model shape {cur.shape}")
            out[k] = new.astype(cur.dtype) if cur.dtype != new.dtype else new
    return out


def commit_to_default(params):
    """device_put numpy leaves onto the default accelerator — numpy leaves
    would otherwise re-transfer on every jitted call (see init_util)."""
    import jax

    default = jax.devices()[0]
    if default.platform == "cpu":
        return params
    return jax.device_put(params, default)


def registry_weights_path(kind: str, name: str) -> Optional[str]:
    """Resolve ``$PPT_WEIGHTS_DIR/<kind>__<name>.npz`` if it exists."""
    d = os.environ.get("PPT_WEIGHTS_DIR")
    if not d:
        return None
    p = os.path.join(d, f"{kind}__{name}.npz")
    return p if os.path.exists(p) else None
