"""Anchor-free person detector (CenterNet-style) with fixed-K padded decode.

Replaces the reference's external detector zoo (YOLOv4 TF graph at
wrappers/deep_sort_yolov4/yolo4/model.py, mmdet/mmtrack detectors, FairMOT's
DCNv2 backbone) with one TPU-native design:

    frames → conv backbone → center heatmap + size + offset heads
    → 3×3 max-pool peak NMS → top-K boxes (static K, masked)

Everything is a single jitted XLA program; "variable number of detections" is
expressed as a fixed-K score-sorted array + validity mask — the TPU idiom the
SURVEY flags as the hard part of tracking on accelerators (SURVEY.md §7
"Tracking on accelerator").
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvBackbone, ConvBlock


@dataclass(frozen=True)
class DetectorConfig:
    name: str = "CenterDet"
    max_detections: int = 32
    stride: int = 8            # output stride of the detection head
    score_threshold: float = 0.3
    widths: Tuple[int, ...] = (32, 64, 128, 256)


class CenterDetNet(nn.Module):
    """Backbone + upsample fuse + 3 heads (center, size, offset)."""

    cfg: DetectorConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        feats = ConvBackbone(widths=self.cfg.widths, dtype=self.dtype)(x.astype(self.dtype))
        # fuse stride-32 up into stride-8 (simple FPN top-down path)
        p = feats[-1]
        for lower in (feats[-2], feats[-3]):
            B, H, W, C = lower.shape
            p = jax.image.resize(p.astype(jnp.float32), (B, H, W, p.shape[-1]),
                                 "nearest").astype(self.dtype)
            p = ConvBlock(lower.shape[-1], kernel=(3, 3), dtype=self.dtype)(
                jnp.concatenate([p, lower], axis=-1))
        head = ConvBlock(128, dtype=self.dtype)(p)
        center = nn.Conv(1, (1, 1), dtype=jnp.float32,
                         bias_init=nn.initializers.constant(-2.19))(head)  # prior ~0.1
        size = nn.Conv(2, (1, 1), dtype=jnp.float32)(head)
        offset = nn.Conv(2, (1, 1), dtype=jnp.float32)(head)
        return center[..., 0], size, offset  # (B,h,w), (B,h,w,2), (B,h,w,2)


@functools.partial(jax.jit, static_argnames=("k", "stride"))
def decode_centers(center_logits, size, offset, k: int = 32, stride: int = 8):
    """Peak-NMS + top-K box decode.

    Returns (boxes (B, K, 4) TLHW image coords, scores (B, K)) sorted by score.
    """
    prob = jax.nn.sigmoid(center_logits)                        # (B, h, w)
    pooled = nn.max_pool(prob[..., None], (3, 3), strides=(1, 1), padding="SAME")[..., 0]
    peaks = jnp.where(prob >= pooled, prob, 0.0)
    B, H, W = peaks.shape
    flat = peaks.reshape(B, H * W)
    scores, idx = jax.lax.top_k(flat, k)                        # (B, K)
    ys = (idx // W).astype(jnp.float32)
    xs = (idx % W).astype(jnp.float32)
    off = jnp.take_along_axis(offset.reshape(B, H * W, 2), idx[..., None], axis=1)
    sz = jnp.take_along_axis(size.reshape(B, H * W, 2), idx[..., None], axis=1)
    cx = (xs + off[..., 0]) * stride
    cy = (ys + off[..., 1]) * stride
    w = jnp.maximum(sz[..., 0], 0.0) * stride
    h = jnp.maximum(sz[..., 1], 0.0) * stride
    boxes = jnp.stack([cx - w / 2, cy - h / 2, w, h], axis=-1)
    return boxes, scores


class PersonDetector:
    """Bundled detector: frames (B, H, W, 3) uint8 → (boxes, scores)."""

    def __init__(self, cfg: DetectorConfig = DetectorConfig(), params=None, seed: int = 0,
                 input_hw: Tuple[int, int] = (480, 640), params_path=None):
        self.cfg = cfg
        self.net = CenterDetNet(cfg)
        self.weights_loaded = False
        if params is None:
            dummy = jnp.zeros((1, *input_hw, 3), jnp.float32)
            from .init_util import init_on_cpu
            params = init_on_cpu(self.net.init, jax.random.PRNGKey(seed), dummy)
            # registry weights: $PPT_WEIGHTS_DIR/detector__<name>.npz
            # (trained by scripts/eval_accuracy.py / train_all_slots.py)
            from .params_io import (commit_to_default, load_params,
                                    merge_params, registry_weights_path)

            path = params_path or registry_weights_path("detector", cfg.name)
            if path:
                params = commit_to_default(
                    merge_params(params, load_params(path)))
                self.weights_loaded = True
        else:
            self.weights_loaded = True
        self.params = params

    @functools.partial(jax.jit, static_argnums=0)
    def _infer(self, params, frames):
        x = frames.astype(jnp.float32) / 255.0
        center, size, offset = self.net.apply(params, x)
        return decode_centers(center, size, offset,
                              k=self.cfg.max_detections, stride=self.cfg.stride)

    def __call__(self, frames):
        return self._infer(self.params, frames)


class AppearanceEncoder(nn.Module):
    """Small conv net → L2-normalized embedding (DeepSORT's MARS-small128
    appearance-feature slot, reference wrappers/deep_sort_yolov4/tools/
    generate_detections.py:74-113)."""

    dim: int = 128
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, crops):
        x = crops.astype(self.dtype) / 255.0
        for w in (32, 64, 128):
            x = ConvBlock(w, strides=(2, 2), dtype=self.dtype)(x)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(self.dim, dtype=jnp.float32)(x)
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)


class FaceDetector(PersonDetector):
    """Face detector sharing the CenterDet architecture — the privacy
    fallback for frames whose person the pose net misses (the role of the
    reference's MTCNN path, wrappers/facenet.py:9-71). Registry slot:
    ``detector__FaceDet.npz``."""

    def __init__(self, params=None, seed: int = 0,
                 input_hw: Tuple[int, int] = (240, 320), params_path=None):
        super().__init__(DetectorConfig(name="FaceDet", max_detections=8,
                                        widths=(16, 32, 64, 128)),
                         params=params, seed=seed, input_hw=input_hw,
                         params_path=params_path)


class ReIDModel:
    def __init__(self, params=None, seed: int = 0, crop_hw: Tuple[int, int] = (128, 64),
                 params_path=None):
        self.net = AppearanceEncoder()
        self.crop_hw = crop_hw
        self.weights_loaded = False
        if params is None:
            dummy = jnp.zeros((1, *crop_hw, 3), jnp.float32)
            from .init_util import init_on_cpu
            params = init_on_cpu(self.net.init, jax.random.PRNGKey(seed), dummy)
            from .params_io import (commit_to_default, load_params,
                                    merge_params, registry_weights_path)

            path = params_path or registry_weights_path("reid", "AppearanceEncoder")
            if path:
                params = commit_to_default(
                    merge_params(params, load_params(path)))
                self.weights_loaded = True
        else:
            self.weights_loaded = True
        self.params = params

    @functools.partial(jax.jit, static_argnums=0)
    def _infer(self, params, crops):
        return self.net.apply(params, crops)

    def __call__(self, crops):
        return self._infer(self.params, crops)
