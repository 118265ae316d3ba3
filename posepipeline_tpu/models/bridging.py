"""MeTRAbs-style absolute-3D bottom-up model over the 580-joint superset.

Reference: wrappers/bridging.py wraps a TF-Hub MeTRAbs SavedModel
(`detect_poses(frame, num_aug=10, average_aug=False)`, :105-141) producing
per-person 2D + *absolute camera-space* 3D over a 580-joint multi-skeleton
superset, with prediction noise from test-time-augmentation spread
(:96-102). The TPU-native re-design:

- one jitted program per frame-batch: person crops for **all** augmentations
  of **all** detected people in a single (B·K·A, H, W, 3) MXU batch,
- a metrabs-style head: J spatial heatmaps (soft-argmax 2D) + J depth maps
  (heatmap-weighted absolute depth), J = 580,
- absolute 3D via pinhole back-projection with a nominal-FOV intrinsic
  (the reference model's calibration-free default),
- TTA = A deterministic crop jitters (scale/shift); augmentation axis is
  returned so the caller computes `augmentation_noise` exactly like the
  reference.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.warp import crop_resize_matmul, normalize_imagenet
from ..utils.bridging_superset import SUPERSET_SIZE
from .layers import ViT


@dataclass(frozen=True)
class BridgingConfig:
    name: str = "bridging_formats"
    num_joints: int = SUPERSET_SIZE
    input_hw: Tuple[int, int] = (256, 192)
    dim: int = 320
    depth: int = 6
    num_heads: int = 5
    num_aug: int = 10
    # absolute-depth decode range (mm), spanning clinical capture distances
    depth_min_mm: float = 1000.0
    depth_span_mm: float = 6000.0


# deterministic TTA jitter table (aug 0 = identity): scale factor and
# center offset as a fraction of the box size — the spread plays the role
# of the reference's num_aug=10 geometric augmentations (bridging.py:130)
_AUG_SCALE = np.array([1.0, 0.92, 1.08, 0.96, 1.12, 1.0, 1.0, 0.9, 1.05, 0.98],
                      np.float32)
_AUG_DX = np.array([0.0, 0.02, -0.02, 0.04, -0.03, 0.05, -0.05, 0.0, 0.03, -0.04],
                   np.float32)
_AUG_DY = np.array([0.0, -0.03, 0.02, -0.02, 0.04, 0.0, 0.03, -0.04, 0.02, 0.05],
                   np.float32)


def _augment_boxes(boxes, num_aug: int):
    """TLHW boxes (..., 4) → (..., A, 4) jittered around the center."""
    s = jnp.asarray(_AUG_SCALE[:num_aug])
    dx = jnp.asarray(_AUG_DX[:num_aug])
    dy = jnp.asarray(_AUG_DY[:num_aug])
    wh = boxes[..., None, 2:]                     # (..., 1, 2)
    center = boxes[..., None, :2] + wh / 2.0
    center = center + jnp.stack([dx, dy], -1) * wh
    wh = wh * s[..., None]
    return jnp.concatenate([center - wh / 2.0, wh], axis=-1)


class MetrabsHead(nn.Module):
    """Backbone features → (2D soft-argmax coords in crop space, depth mm)."""

    cfg: BridgingConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats):
        c = self.cfg
        B, h, w, _ = feats.shape
        J = c.num_joints
        # one 1×1 conv emits heatmap logits and depth maps together (a single
        # MXU matmul over 2J output channels)
        maps = nn.Conv(2 * J, (1, 1), dtype=self.dtype, name="joint_maps")(feats)
        maps = maps.astype(jnp.float32)
        logits, depth_map = maps[..., :J], maps[..., J:]
        flat = logits.reshape(B, h * w, J)
        prob = jax.nn.softmax(flat, axis=1).reshape(B, h, w, J)
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        u = jnp.einsum("bhwj,w->bj", prob, xs)    # crop-relative [0,1]
        v = jnp.einsum("bhwj,h->bj", prob, ys)
        d = jnp.einsum("bhwj,bhwj->bj", prob, depth_map)
        z = c.depth_min_mm + c.depth_span_mm * jax.nn.sigmoid(d)
        return jnp.stack([u, v], -1), z           # (B, J, 2), (B, J)


class BridgingNet(nn.Module):
    cfg: BridgingConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, crops_normalized):
        c = self.cfg
        feats = ViT(dim=c.dim, depth=c.depth, num_heads=c.num_heads,
                    dtype=self.dtype)(crops_normalized.astype(self.dtype))
        return MetrabsHead(c, dtype=self.dtype)(feats)


class BridgingModel:
    """Bundled bridging model: frames + person boxes → superset 2D/3D + TTA.

    ``__call__(frames, boxes)``:
        frames (B, H, W, 3) uint8, boxes (B, K, 4) TLHW →
        poses2d (B, K, A, J, 2) image coords,
        poses3d (B, K, A, J, 3) absolute camera-space mm.
    The caller averages over A and derives noise via
    utils.bridging_superset.augmentation_noise (reference bridging.py:96-102).
    """

    def __init__(self, cfg: BridgingConfig = BridgingConfig(), params=None,
                 seed: int = 0, params_path=None):
        from .params_io import (commit_to_default, load_params, merge_params,
                                registry_weights_path)

        self.cfg = cfg
        self.net = BridgingNet(cfg)
        self.weights_loaded = params is not None
        if params is None:
            dummy = jnp.zeros((1, *cfg.input_hw, 3), jnp.float32)
            from .init_util import init_on_cpu
            params = init_on_cpu(self.net.init, jax.random.PRNGKey(seed), dummy)
            path = params_path or registry_weights_path("bridging", cfg.name)
            if path:
                params = commit_to_default(
                    merge_params(params, load_params(path)))
                self.weights_loaded = True
        self.params = params

    @functools.partial(jax.jit, static_argnums=0)
    def _infer(self, params, frames, boxes):
        cfg = self.cfg
        B, H, W, _ = frames.shape
        K = boxes.shape[1]
        A = cfg.num_aug
        th, tw = cfg.input_hw
        aug = _augment_boxes(jnp.asarray(boxes, jnp.float32), A)  # (B,K,A,4)
        flat_boxes = aug.reshape(B, K * A, 4)
        crops = jax.vmap(
            lambda bx: crop_resize_matmul(frames, bx, out_hw=(th, tw)),
            in_axes=1, out_axes=1)(flat_boxes)    # (B, K*A, th, tw, 3)
        crops = crops.reshape(B * K * A, th, tw, 3)
        uv, z = self.net.apply(params, normalize_imagenet(crops))
        J = cfg.num_joints
        uv = uv.reshape(B, K * A, J, 2)
        # crop-relative [0,1] → image pixels through each aug's box
        xy = flat_boxes[..., None, :2] + uv * flat_boxes[..., None, 2:]
        # pinhole back-projection with a nominal-FOV intrinsic
        f = 1.25 * jnp.maximum(H, W).astype(jnp.float32)
        cx, cy = W / 2.0, H / 2.0
        z = z.reshape(B, K * A, J)
        x3 = (xy[..., 0] - cx) * z / f
        y3 = (xy[..., 1] - cy) * z / f
        poses3d = jnp.stack([x3, y3, z], -1)
        return (xy.reshape(B, K, A, J, 2), poses3d.reshape(B, K, A, J, 3))

    def __call__(self, frames, boxes):
        return self._infer(self.params, jnp.asarray(frames), jnp.asarray(boxes))


_bridging_cache = {}


def get_bridging_model(**overrides) -> BridgingModel:
    """Registry accessor. Architecture overrides come from
    ``config["custom"]["bridging"]`` (the tier-3 model-param registry,
    SURVEY §5 config) then explicit kwargs — tests scale the net down via
    config, production uses the defaults."""
    from ..core.config import config

    merged = dict(config.get("custom", {}).get("bridging", {}))
    merged.update(overrides)
    if "input_hw" in merged:  # JSON configs carry lists; the frozen
        merged["input_hw"] = tuple(merged["input_hw"])  # dataclass must hash
    key = tuple(sorted(merged.items()))
    if key not in _bridging_cache:
        _bridging_cache[key] = BridgingModel(BridgingConfig(**merged))
    return _bridging_cache[key]
