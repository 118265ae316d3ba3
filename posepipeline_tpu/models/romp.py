"""Single-shot multi-person mesh recovery (the CenterHMR/ROMP slot).

The reference's CenterHMR tables wrap ROMP (reference pipeline.py:1709-1745;
the wrapped repo is Arthur151/ROMP): ONE fully-convolutional forward over the
whole frame emits a body-center heatmap plus dense per-location SMPL
parameter maps, and people are read out at heatmap peaks — no detector, no
per-person crops. Round-3 served this slot as detector+ProHMR composite;
this module is the true single-shot architecture, TPU-native:

- backbone: strided conv stack (MXU-friendly, bf16) → stride-16 feature map;
- heads: 1×1 convs → center logits (B, h, w) and a parameter map
  (B, h, w, 24·6 + n_betas + 3) holding (pose 6D, betas, weak-persp cam)
  at every location;
- decode: 3×3 max-pool peak NMS + static top-K gather — one jit program,
  no data-dependent shapes (the same decode structure as
  models/detector.decode_centers).

Camera/coordinate convention matches MeshTrainer's renderer: cam = (s, tx,
ty) weak perspective into normalized square coords x ∈ [-1, 1] (x right,
y up), so joints2d = s·X[:, :2] + t and the body center (pelvis) projects
to (tx, ty).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvBackbone, ConvBlock
from .smpl_body import BodyModel, rotation_6d_to_matrix


@dataclass(frozen=True)
class ROMPConfig:
    name: str = "CenterHMR"
    widths: Sequence[int] = (32, 64, 128, 256)
    head_dim: int = 128
    n_betas: int = 10
    num_joints: int = 24
    max_people: int = 8          # static top-K readout
    input_hw: Tuple[int, int] = (256, 256)

    @property
    def stride(self) -> int:
        # ConvBackbone: stride-2 stem + one stride-2 stage per width; the
        # head consumes the third stage (stride 16)
        return 16

    @property
    def param_dim(self) -> int:
        return self.num_joints * 6 + self.n_betas + 3


class ROMPNet(nn.Module):
    """frames (B, H, W, 3) normalized → (center logits (B, h, w),
    param maps (B, h, w, P)) at stride 16."""

    cfg: ROMPConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        feats = ConvBackbone(widths=tuple(self.cfg.widths),
                             dtype=self.dtype)(x)
        f = feats[2]                                   # stride 16
        h = ConvBlock(self.cfg.head_dim, dtype=self.dtype)(f)
        h = ConvBlock(self.cfg.head_dim, dtype=self.dtype)(h)
        center = nn.Conv(1, (1, 1), dtype=jnp.float32,
                         bias_init=nn.initializers.constant(-2.19),
                         name="center_head")(h)[..., 0]
        params = nn.Conv(self.cfg.param_dim, (1, 1), dtype=jnp.float32,
                         kernel_init=nn.initializers.normal(0.01),
                         name="param_head")(h)
        # identity-biased 6D rotations + unit-scale cam, like the iterative
        # regressor's init (meshregressor.IterativeRegressor)
        id6 = jnp.tile(jnp.asarray([1, 0, 0, 0, 1, 0], jnp.float32),
                       (self.cfg.num_joints,))
        bias = jnp.concatenate([id6, jnp.zeros(self.cfg.n_betas),
                                jnp.asarray([0.9, 0.0, 0.0])])
        return center, params + bias


def cell_positions(gh: int, gw: int):
    """Normalized (x, y) center of every feature cell, y-up convention:
    (gh, gw, 2). The dense cam head predicts translation as an OFFSET from
    this — a translation-invariant conv cannot regress absolute (tx, ty)
    (observed r5: the absolute form collapsed to ~0 and recall died at the
    match radius while the center peaks themselves were near-perfect); the
    wrapped ROMP repo's cam maps are cell-relative for the same reason."""
    yy = jax.lax.broadcasted_iota(jnp.float32, (gh, gw), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (gh, gw), 1)
    cx = (xx + 0.5) / gw * 2.0 - 1.0
    cy = 1.0 - (yy + 0.5) / gh * 2.0
    return jnp.stack([cx, cy], axis=-1)


def decode_romp(center_logits, param_maps, k: int = 8):
    """Peak-NMS + static top-K people readout.

    Returns (scores (B, K), centers_px (B, K, 2) feature-map-pixel coords
    ×stride, params (B, K, P)) sorted by score. The last two param channels
    (cam tx, ty) are converted from cell-relative offsets to absolute
    normalized coords by adding the winning cell's position."""
    prob = jax.nn.sigmoid(center_logits)
    pooled = nn.max_pool(prob[..., None], (3, 3), strides=(1, 1),
                         padding="SAME")[..., 0]
    peaks = jnp.where(prob >= pooled, prob, 0.0)
    B, H, W = peaks.shape
    flat = peaks.reshape(B, H * W)
    scores, idx = jax.lax.top_k(flat, k)
    ys = (idx // W).astype(jnp.float32)
    xs = (idx % W).astype(jnp.float32)
    P = param_maps.shape[-1]
    params = jnp.take_along_axis(param_maps.reshape(B, H * W, P),
                                 idx[..., None], axis=1)
    cellpos = jnp.take_along_axis(
        cell_positions(H, W).reshape(1, H * W, 2).repeat(B, axis=0),
        idx[..., None], axis=1)                      # (B, K, 2)
    params = jnp.concatenate([params[..., :-2], params[..., -2:] + cellpos],
                             axis=-1)
    return scores, jnp.stack([xs, ys], axis=-1), params


class ROMPModel:
    """Bundled single-shot net + SMPL body: frames → per-person SMPL fields.

    Registry weights: ``$PPT_WEIGHTS_DIR/mesh__CenterHMR.npz`` (trained by
    ``scripts/train_all_slots.py --only romp``)."""

    def __init__(self, params=None, seed: int = 0, params_path=None):
        from ..core.config import config

        kw = dict(config.get("custom", {}).get("romp_model", {}))
        if "widths" in kw:
            kw["widths"] = tuple(kw["widths"])
        if "input_hw" in kw:
            kw["input_hw"] = tuple(kw["input_hw"])
        self.cfg = ROMPConfig(**kw)
        self.net = ROMPNet(self.cfg)
        self.body = BodyModel()
        self.weights_loaded = params is not None
        if params is None:
            dummy = jnp.zeros((1, *self.cfg.input_hw, 3), jnp.float32)
            from .init_util import init_on_cpu
            params = init_on_cpu(self.net.init, jax.random.PRNGKey(seed),
                                 dummy)
            from .params_io import (commit_to_default, load_params,
                                    merge_params, registry_weights_path)

            path = params_path or registry_weights_path("mesh", self.cfg.name)
            if path:
                params = commit_to_default(
                    merge_params(params, load_params(path)))
                self.weights_loaded = True
        self.params = params

    @functools.partial(jax.jit, static_argnums=0)
    def _infer(self, params, frames_norm):
        cfg = self.cfg
        center, pmap = self.net.apply(params, frames_norm)
        scores, centers, params_k = decode_romp(center, pmap,
                                                k=cfg.max_people)
        B, K = scores.shape
        npose = cfg.num_joints * 6
        pose6d = params_k[..., :npose].reshape(B, K, cfg.num_joints, 6)
        betas = params_k[..., npose:npose + cfg.n_betas]
        cam = params_k[..., npose + cfg.n_betas:]
        R = rotation_6d_to_matrix(pose6d.reshape(B * K, cfg.num_joints, 6))
        verts, joints3d = self.body._forward(
            betas.reshape(B * K, -1), R, jnp.zeros((B * K, 3), jnp.float32))
        # root-relative, like the crop regressors (meshregressor._infer)
        joints3d = joints3d - joints3d[:, :1]
        J = joints3d.shape[1]
        joints3d = joints3d.reshape(B, K, J, 3)
        # weak perspective into normalized [-1, 1] square coords (y up)
        s = cam[..., 0:1, None]
        t = cam[..., None, 1:3]
        joints2d = s * joints3d[..., :2] + t
        return dict(scores=scores, centers=centers, poses=pose6d,
                    betas=betas, cams=cam, joints3d=joints3d,
                    joints2d=joints2d)

    def __call__(self, frames_normalized):
        """frames (B, H, W, 3) normalized floats, H/W = cfg.input_hw →
        dict of (B, K, ...) per-person fields sorted by center score."""
        return self._infer(self.params, frames_normalized)
