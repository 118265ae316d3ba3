"""True bottom-up multi-person 2D pose: heatmaps + associative-embedding tags.

The reference's ``MMPose`` bottom-up slot runs HigherHRNet / mobilenet
associative-embedding models (reference wrappers/mmpose.py:84-121): one
full-frame forward emits per-joint heatmaps AND per-joint tag maps; peaks
are grouped into people by tag similarity — no person detector.

TPU-native redesign:

- one conv backbone + upsample head emits ``(B, h, w, 2J)`` — J heatmaps
  and J tag maps — as a single MXU program over the full frame batch;
- decoding is compiled, fixed-shape: per-joint top-K peak extraction
  (3×3 max-pool NMS + ``lax.top_k``), then grouping as a vectorized
  greedy pass — person slots seed from the best root-joint peaks and each
  remaining joint assigns by minimal tag distance among its K candidates
  (the fixed-shape analogue of AE's Munkres grouping; same objective,
  compiler-friendly control flow);
- everything from pixels to ``(B, P, J, 3)`` keypoints + person scores is
  ONE jitted call — no per-person host loop.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvBackbone


@dataclass(frozen=True)
class BottomUpConfig:
    name: str = "AEBottomUp"
    num_joints: int = 17
    input_hw: Tuple[int, int] = (512, 512)
    max_people: int = 8
    peaks_per_joint: int = 8
    widths: Tuple[int, ...] = (32, 64, 128, 256)
    tag_weight: float = 1.0
    root_joint: int = 0          # seed joint for person slots (nose for COCO)
    conf_threshold: float = 0.1
    tag_threshold: float = 1.0


class AEBottomUpNet(nn.Module):
    """frames (B, H, W, 3) float → (B, H/4, W/4, 2J): heatmaps ‖ tags."""

    cfg: BottomUpConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        feats = ConvBackbone(widths=c.widths, dtype=self.dtype)(x.astype(self.dtype))
        # fuse stride-8 and stride-4 features (HigherHRNet-style two-scale)
        f8 = feats[-2]
        f4 = feats[-3]
        up = jax.image.resize(f8, f4.shape[:1] + (f4.shape[1], f4.shape[2], f8.shape[-1]),
                              method="bilinear")
        h = jnp.concatenate([f4, up.astype(self.dtype)], axis=-1)
        h = nn.relu(nn.Conv(128, (3, 3), dtype=self.dtype)(h))
        out = nn.Conv(2 * c.num_joints, (1, 1), dtype=jnp.float32)(h)
        return out


def _nms_peaks(hm, k):
    """(B, h, w, J) heatmaps → per-joint top-k (conf, y, x) with 3×3 NMS."""
    B, h, w, J = hm.shape
    pooled = nn.max_pool(hm, (3, 3), strides=(1, 1), padding="SAME")
    keep = jnp.where(jnp.abs(hm - pooled) < 1e-6, hm, -jnp.inf)
    flat = keep.transpose(0, 3, 1, 2).reshape(B, J, h * w)
    conf, idx = jax.lax.top_k(flat, k)                     # (B, J, K)
    ys = (idx // w).astype(jnp.float32)
    xs = (idx % w).astype(jnp.float32)
    return conf, ys, xs, idx


def _higherhrnet_head(cfg: BottomUpConfig):
    """models/higherhrnet.HigherHRNetAE adapted to the single
    ``(B, h, w, 2J)`` heatmap‖tag contract the AE decoder consumes:
    stride-2 heatmaps are the mean of the upsampled stride-4 map and the
    deconv branch's map, tags come from the stride-4 scale upsampled —
    exactly mmpose's HigherHRNet test-time aggregation (reference
    wrappers/mmpose.py:84-121). Subclassing keeps the param tree identical
    to HigherHRNetAE, so a converted mmpose checkpoint
    (tools/convert_weights.py --arch higherhrnet) loads unchanged."""
    from .higherhrnet import HigherHRNetAE

    class HigherHRNetAEHead(HigherHRNetAE):
        @nn.compact
        def __call__(self, x):
            out0, out1 = super().__call__(x)
            J = self.num_joints
            hm0 = jax.image.resize(out0[..., :J], out1.shape, "bilinear")
            tags = jax.image.resize(out0[..., J:], out1.shape, "bilinear")
            return jnp.concatenate([0.5 * (hm0 + out1), tags], axis=-1)

    # tier-3 override: train_all_slots sets {"train_norm": True} while
    # fitting, then folds the stats back into conv biases so the shipped
    # npz keeps the converted-checkpoint layout (models/hrnet.py recipe)
    from ..core.config import config

    hk = dict(config.get("custom", {}).get("higherhrnet_model", {}))
    return HigherHRNetAEHead(num_joints=cfg.num_joints, **hk)


class AEBottomUpModel:
    """Bundled config + params + jitted full-frame multi-person inference."""

    def __init__(self, cfg: BottomUpConfig = BottomUpConfig(), params=None,
                 seed: int = 0, net=None):
        self.cfg = cfg
        self.net = AEBottomUpNet(cfg) if net is None else net
        if params is None:
            from .init_util import init_on_cpu

            dummy = jnp.zeros((1, *cfg.input_hw, 3), jnp.float32)
            params = init_on_cpu(self.net.init, jax.random.PRNGKey(seed), dummy)
        self.params = params

    @functools.partial(jax.jit, static_argnums=0)
    def _infer(self, params, frames):
        """frames (B, H, W, 3) uint8 → (people (B, P, J, 3), scores (B, P))."""
        c = self.cfg
        J, K, P = c.num_joints, c.peaks_per_joint, c.max_people
        x = frames.astype(jnp.float32) / 255.0
        out = self.net.apply(params, x)
        hm = jax.nn.sigmoid(out[..., :J])
        tags = out[..., J:]
        B, h, w, _ = hm.shape

        conf, ys, xs, idx = _nms_peaks(hm, K)              # (B, J, K)
        tag_flat = tags.transpose(0, 3, 1, 2).reshape(B, J, h * w)
        ptags = jnp.take_along_axis(tag_flat, idx, axis=-1)  # (B, J, K)

        # person slots seed from the root joint's top-P peaks
        root = c.root_joint
        seed_conf = conf[:, root, :P]                       # (B, P)
        seed_tag = ptags[:, root, :P]
        seed_y, seed_x = ys[:, root, :P], xs[:, root, :P]

        # each joint × person: candidate K peaks scored by tag affinity
        d = jnp.abs(ptags[:, :, None, :] - seed_tag[:, None, :, None])  # (B,J,P,K)
        score = conf[:, :, None, :] - c.tag_weight * d
        score = jnp.where(conf[:, :, None, :] > c.conf_threshold, score, -jnp.inf)
        best = jnp.argmax(score, axis=-1)                   # (B, J, P)

        def take(a):
            cand = jnp.broadcast_to(a[:, :, None, :], (B, J, P, K))
            return jnp.take_along_axis(cand, best[..., None], -1)[..., 0]

        jx = take(xs)
        jy = take(ys)
        jconf = take(conf)
        jtag = take(ptags)
        # reject joints whose tag is too far from the person embedding
        ok = (jnp.abs(jtag - seed_tag[:, None, :]) < c.tag_threshold) & (
            jconf > c.conf_threshold)
        jconf = jnp.where(ok, jconf, 0.0)

        # the root joint itself uses its seed coordinates
        jx = jx.at[:, root].set(seed_x)
        jy = jy.at[:, root].set(seed_y)
        jconf = jconf.at[:, root].set(seed_conf)

        # map heatmap coords to FRAME pixels (the conv net runs at whatever
        # frame resolution it was traced with — no fixed input size)
        stride_y = frames.shape[1] / h
        stride_x = frames.shape[2] / w
        people = jnp.stack([jx * stride_x, jy * stride_y, jconf], axis=-1)
        people = people.transpose(0, 2, 1, 3)               # (B, P, J, 3)
        scores = jnp.where(seed_conf > c.conf_threshold,
                           jconf.mean(axis=1), 0.0)         # (B, P)
        return people, scores

    def __call__(self, frames):
        return self._infer(self.params, frames)


_ae_cache = {}


def get_bottomup_model(name: str = "AEBottomUp") -> AEBottomUpModel:
    """Registry lookup mirroring get_topdown_model (weights via
    $PPT_WEIGHTS_DIR/bottomup__<name>.npz; tests scale the net down through
    the tier-3 config registry)."""
    if name not in _ae_cache:
        from ..core.config import config
        from .params_io import load_params, merge_params, registry_weights_path

        kw = dict(config.get("custom", {}).get("bottomup_model", {}))
        if "input_hw" in kw:
            kw["input_hw"] = tuple(kw["input_hw"])
        if "widths" in kw:
            kw["widths"] = tuple(kw["widths"])
        cfg = BottomUpConfig(name=name, **kw)
        # HigherHRNet: the checkpoint-parity backbone served through the
        # same compiled decoder (converted mmpose AE checkpoints are a file
        # drop: tools/convert_weights.py --arch higherhrnet)
        net = _higherhrnet_head(cfg) if name == "HigherHRNet" else None
        model = AEBottomUpModel(cfg, net=net)
        path = registry_weights_path("bottomup", name)
        if path:
            model.params = merge_params(model.params, load_params(path))
        model.weights_loaded = bool(path)
        _ae_cache[name] = model
    return _ae_cache[name]
