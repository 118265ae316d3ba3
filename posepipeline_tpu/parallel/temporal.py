"""Temporal context parallelism: shard the time axis with ICI halo exchange.

The reference handles long videos by CPU-side chunking with overlap — e.g.
VideoPose3D's ChunkedGenerator pads ±121 frames for its 243-frame receptive
field (reference wrappers/videopose3d.py:62-75), HuMoR stitches 60-frame
windows with 10-frame overlaps (wrappers/humor.py:29-55). SURVEY.md §5 calls
this "the reference's context parallelism".

TPU-native formulation: shard the time axis of a temporal-conv lifter across
the mesh; each device exchanges a halo of ``rf//2`` frames with its neighbors
over ICI (``jax.lax.ppermute``), runs the conv stack on its extended chunk,
and keeps the core. Because convolution is linear in the halo, the sharded
result is **bit-exact** vs the unsharded model (validated in
tests/test_parallel.py), unlike overlap-stitching heuristics.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def halo_exchange(x_local, halo: int, axis_name: str):
    """Exchange ``halo`` frames with ring neighbors along a mesh axis.

    x_local: (B, T_local, ...) per-device chunk.
    Returns (B, T_local + 2*halo, ...) with zero halos at the global sequence
    boundary (matching zero input padding of the unsharded model).

    When ``halo > T_local`` (deep receptive fields like VideoPose3D's 243 on
    short chunks), halos are assembled from multiple ring hops — each hop is a
    nearest-neighbor ``ppermute`` over ICI, so traffic stays on the ring.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    t_local = x_local.shape[1]
    hops = -(-halo // t_local)  # static ceil

    left_parts, right_parts = [], []
    for hop in range(1, hops + 1):
        fwd = [(i, (i + hop) % n) for i in range(n)]
        bwd = [(i, (i - hop) % n) for i in range(n)]
        left = jax.lax.ppermute(x_local, axis_name, fwd)     # chunk of device idx-hop
        right = jax.lax.ppermute(x_local, axis_name, bwd)    # chunk of device idx+hop
        left = jnp.where(idx < hop, jnp.zeros_like(left), left)
        right = jnp.where(idx >= n - hop, jnp.zeros_like(right), right)
        left_parts.insert(0, left)
        right_parts.append(right)
    ext = jnp.concatenate(left_parts + [x_local] + right_parts, axis=1)
    start = hops * t_local - halo
    return jax.lax.dynamic_slice_in_dim(ext, start, t_local + 2 * halo, axis=1)


def temporal_sharded_apply(net, mesh: Mesh, params, x, halo: int,
                           time_axis_name: str = "time"):
    """Apply a temporal network with the time axis sharded over the mesh.

    net: Flax module whose __call__ maps (B, T, C) → (B, T, J, 3) with SAME
        padding (translation-covariant, receptive field ≤ 2*halo+1).
    x: (B, T, C) with T divisible by the mesh axis size.

    The per-device program: halo exchange over ICI → local forward over the
    extended chunk → drop halo outputs.
    """

    def local_fn(params, x_local):
        ext = halo_exchange(x_local, halo, time_axis_name)
        y = net.apply(params, ext)
        return y[:, halo:-halo]

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(None, time_axis_name, None)),
        out_specs=P(None, time_axis_name, None, None),
        check_vma=False,
    )
    return fn(params, x)


class ShardedLifter:
    """Drop-in LiftingModel wrapper running time-sharded on a mesh."""

    def __init__(self, lifting_model, mesh: Mesh, time_axis: str = "time"):
        self.inner = lifting_model
        self.mesh = mesh
        self.time_axis = time_axis
        self.halo = lifting_model.cfg.receptive_field // 2
        self._jitted = jax.jit(functools.partial(
            temporal_sharded_apply, self.inner.net, self.mesh), static_argnames=("halo", "time_axis_name"))

    def __call__(self, keypoints_2d, width: float, height: float, already_h36m: bool = False):
        from ..models.lifting import coco_to_h36m, normalize_screen_coordinates
        from .mesh import pad_to_multiple

        kp = jnp.asarray(keypoints_2d, jnp.float32)
        valid = kp[..., 2].mean(axis=-1) > 0.0
        h36m = kp if already_h36m else coco_to_h36m(kp)
        xy = normalize_screen_coordinates(h36m[..., :2], width, height)
        T, J, _ = xy.shape
        n = self.mesh.shape[self.time_axis]
        x, orig_t = pad_to_multiple(jnp.asarray(xy.reshape(1, T, J * 2)), n, axis=1)
        out = self._jitted(self.inner.params, jnp.asarray(x),
                           halo=self.halo, time_axis_name=self.time_axis)
        return out[0, :orig_t], valid
