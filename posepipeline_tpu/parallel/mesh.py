"""Device mesh construction and sharding helpers.

The reference's "distributed story" is one DataJoint worker per GPU
coordinated through MySQL (SURVEY.md §2.5). The TPU-native equivalents built
here:

- **data parallelism over clips/frames**: batch axis sharded over the mesh
  ``data`` axis (replaces one-worker-per-GPU),
- **temporal context parallelism**: the time axis of lifting sharded over the
  ``time`` axis with ICI halo exchange (parallel/temporal.py),
- **model (tensor) parallelism** hooks for large backbones: channel/head
  dimensions sharded over ``model``.

All collectives are XLA-inserted (psum/all_gather/ppermute over ICI);
multi-slice DCN scale-out distributes whole clips (embarrassingly parallel at
the job level, handled by the core engine's job reservation).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_shapes: Optional[dict] = None, devices=None) -> Mesh:
    """Build a mesh with named axes, defaulting to pure data parallelism.

    axis_shapes: ordered {axis_name: size}; sizes must multiply to #devices.
    A size of -1 absorbs the remainder.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if axis_shapes is None:
        axis_shapes = {"data": n}
    names = list(axis_shapes)
    sizes = list(axis_shapes.values())
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = n // known
    if int(np.prod(sizes)) != n:
        raise ValueError(f"mesh {dict(zip(names, sizes))} != {n} devices")
    dev_array = np.array(devices).reshape(sizes)
    return Mesh(dev_array, names)


def replicate(mesh: Mesh, tree):
    """Place a pytree fully replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(mesh: Mesh, array, axis_name: str = "data"):
    """Shard the leading (batch) axis of an array over ``axis_name``."""
    spec = P(axis_name, *([None] * (array.ndim - 1)))
    return jax.device_put(array, NamedSharding(mesh, spec))


def batch_sharding(mesh: Mesh, ndim: int, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name, *([None] * (ndim - 1))))


def pad_to_multiple(array, multiple: int, axis: int = 0) -> Tuple[np.ndarray, int]:
    """Pad ``axis`` up to a multiple (returns padded array + original length)."""
    n = array.shape[axis]
    target = ((n + multiple - 1) // multiple) * multiple
    if target == n:
        return array, n
    pad = [(0, 0)] * array.ndim
    pad[axis] = (0, target - n)
    return np.pad(np.asarray(array), pad), n
