"""Skeleton-based action recognition (the PoseC3D slot).

Reference: wrappers/mmaction.py:9-120 + SkeletonAction table
(pipeline.py:1144-1166): PoseC3D runs 3D convolutions over keypoint-heatmap
volumes in sliding clip windows against the AVA label map.

TPU-native: keypoints rasterize into (T, H, W, J) gaussian heatmap volumes on
device (vectorized, no cv2), a factorized 3D-conv net scores each sliding
window, and all windows of a video run as one batched program.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# A compact label set standing in for the AVA map the reference loads from
# mmaction metadata; convertible when the real label file is supplied.
DEFAULT_LABEL_MAP = [
    "stand", "sit", "walk", "run", "jump", "lie down", "bend", "crouch",
    "dance", "fall down", "get up", "martial art", "reach", "turn", "wave",
    "clap", "carry", "climb", "kick", "throw",
]


@dataclass(frozen=True)
class ActionConfig:
    name: str = "PoseC3D"
    num_classes: int = len(DEFAULT_LABEL_MAP)
    num_joints: int = 17
    heatmap_hw: Tuple[int, int] = (56, 56)
    window: int = 48
    stride: int = 24
    sigma: float = 2.0
    # "factorized" = the TPU-native (2+1)D net; "slowonly" = the
    # checkpoint-parity SlowOnly ResNet3d (models/posec3d.py) so converted
    # mmaction2 PoseC3D checkpoints are a file drop
    backbone: str = "factorized"


def keypoints_to_heatmap_volume(keypoints, bbox, out_hw=(56, 56), sigma=2.0):
    """(T, J, 3) keypoints + person box → (T, h, w, J) gaussian volumes.

    Keypoints are normalized into the (dilated) person box so the volume is
    translation/scale invariant (PoseC3D convention).
    """
    kp = jnp.asarray(keypoints, jnp.float32)
    bbox = jnp.asarray(bbox, jnp.float32)
    h, w = out_hw
    x = (kp[..., 0] - bbox[:, None, 0]) / jnp.maximum(bbox[:, None, 2], 1e-3) * w
    y = (kp[..., 1] - bbox[:, None, 1]) / jnp.maximum(bbox[:, None, 3], 1e-3) * h
    conf = kp[..., 2]
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    d2 = ((yy[None, None] - y[..., None, None]) ** 2
          + (xx[None, None] - x[..., None, None]) ** 2)
    vol = jnp.exp(-d2 / (2 * sigma**2)) * conf[..., None, None]
    return jnp.transpose(vol, (0, 2, 3, 1))  # (T, h, w, J)


class Factorized3DConvNet(nn.Module):
    """(2+1)D conv stack over heatmap volumes → class logits."""

    cfg: ActionConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):  # (B, T, H, W, J)
        x = x.astype(self.dtype)
        for width, t_stride in ((32, 1), (64, 2), (128, 2)):
            # spatial conv
            x = nn.Conv(width, (1, 3, 3), (1, 2, 2), padding="SAME",
                        use_bias=False, dtype=self.dtype)(x)
            x = nn.GroupNorm(num_groups=16, dtype=jnp.float32)(x).astype(self.dtype)
            x = nn.relu(x)
            # temporal conv
            x = nn.Conv(width, (3, 1, 1), (t_stride, 1, 1), padding="SAME",
                        use_bias=False, dtype=self.dtype)(x)
            x = nn.GroupNorm(num_groups=16, dtype=jnp.float32)(x).astype(self.dtype)
            x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2, 3))
        return nn.Dense(self.cfg.num_classes, dtype=jnp.float32)(x)


class ActionModel:
    """Sliding-window skeleton action recognition."""

    def __init__(self, cfg: ActionConfig = ActionConfig(), params=None, seed: int = 0,
                 params_path=None):
        self.cfg = cfg
        if cfg.backbone == "slowonly":
            from .posec3d import PoseC3DConfig, PoseC3DNet

            self.net = PoseC3DNet(PoseC3DConfig(
                num_classes=cfg.num_classes, in_channels=cfg.num_joints))
        else:
            self.net = Factorized3DConvNet(cfg)
        self.weights_loaded = False
        if params is None:
            dummy = jnp.zeros((1, cfg.window, *cfg.heatmap_hw, cfg.num_joints), jnp.float32)
            from .init_util import init_on_cpu
            params = init_on_cpu(self.net.init, jax.random.PRNGKey(seed), dummy)
            from .params_io import (commit_to_default, load_params,
                                    merge_params, registry_weights_path)

            path = params_path or registry_weights_path("action", cfg.name)
            if path:
                params = commit_to_default(
                    merge_params(params, load_params(path)))
                self.weights_loaded = True
        else:
            self.weights_loaded = True
        self.params = params

    @functools.partial(jax.jit, static_argnums=0)
    def _infer(self, params, volumes):
        return jax.nn.softmax(self.net.apply(params, volumes), axis=-1)

    def __call__(self, keypoints, bbox):
        """(T, J, 3) + (T, 4) → per-window scores + top5.

        Returns dict(top5, action_scores, label_map, window, stride) matching
        the SkeletonAction contract (pipeline.py:1144-1166).
        """
        cfg = self.cfg
        kp = np.nan_to_num(np.asarray(keypoints, np.float32))[:, : cfg.num_joints]
        bb = np.nan_to_num(np.asarray(bbox, np.float32))
        T = kp.shape[0]
        win, stride = cfg.window, cfg.stride
        if T < win:  # pad short videos to one window
            pad = win - T
            kp = np.concatenate([kp, np.repeat(kp[-1:], pad, 0)])
            bb = np.concatenate([bb, np.repeat(bb[-1:], pad, 0)])
            T = win
        starts = list(range(0, T - win + 1, stride)) or [0]
        vol = np.asarray(keypoints_to_heatmap_volume(kp, bb, cfg.heatmap_hw, cfg.sigma))
        windows = np.stack([vol[s: s + win] for s in starts])
        scores = np.asarray(self._infer(self.params, jnp.asarray(windows)))
        mean_scores = scores.mean(axis=0)
        top5 = [DEFAULT_LABEL_MAP[i] for i in np.argsort(-mean_scores)[:5]]
        return dict(top5=top5, action_scores=scores, label_map=list(DEFAULT_LABEL_MAP),
                    action_window_len=win, stride=stride, starts=starts)
