"""PoseC3D SlowOnly ResNet3d — checkpoint-parity architecture.

The reference's skeleton-action wrapper runs mmaction2 PoseC3D
(reference wrappers/mmaction.py:9-86): an R(3D) "SlowOnly" ResNet over
stacked keypoint-heatmap volumes. The serving slot here is the factorized
(2+1)D net in models/action.py (trained on the synthetic cadence protocol);
this module is the *conversion target* for real PoseC3D checkpoints — the
same role models/hrnet.py plays for MMPose HRNet-W48 top-down checkpoints.

Layout notes (mirroring mmaction2 ``ResNet3dSlowOnly`` for the skeleton
configs, e.g. ``slowonly_r50_u48_240e_ntu*_keypoint``):

- input is NDHWC (B, T, H, W, J) heatmap volumes (J=17), base_channels 32,
  3 stages of Bottleneck3d with stage_blocks (4, 6, 3), spatial strides
  (2, 2, 2), temporal strides (1, 1, 2), inflate (0, 1, 1);
- the stem conv is (1, 7, 7) stride 1 — PoseC3D feeds 56×56 heatmaps and
  does not spatially downsample in the stem (``conv1_stride_s=1``,
  ``pool1_stride_s=1``, no max-pool);
- Bottleneck3d, ``inflate_style='3x1x1'``: conv1 is (3, 1, 1) when the
  block is inflated else (1, 1, 1); conv2 is (1, 3, 3) and carries both the
  temporal and spatial stride; conv3 is (1, 1, 1); the stage-entry block
  carries a (1, 1, 1) strided downsample on the residual;
- every torch ConvModule (``.conv`` + ``.bn``) folds to a single biased
  conv at conversion time (tools/convert_weights.py --arch posec3d), so
  this net is BatchNorm-free;
- head: global spatio-temporal average pool → ``fc_cls`` Dense
  (mmaction2 ``I3DHead``).

Module names match the torch key structure one-for-one
(``backbone.layer2.3.conv2.conv.weight`` → ``backbone/layer2_3/conv2``),
golden-tested against a torch twin in tests/test_convert_posec3d.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _conv3d(features, kernel, strides=(1, 1, 1), name=None,
            dtype=jnp.bfloat16):
    """Biased 3D conv (bias carries the folded BatchNorm3d)."""
    return nn.Conv(features, tuple(kernel), tuple(strides),
                   padding=[(k // 2, k // 2) for k in kernel],
                   use_bias=True, name=name, dtype=dtype)


class Bottleneck3d(nn.Module):
    """mmaction2 Bottleneck3d, inflate_style='3x1x1'."""

    planes: int
    spatial_stride: int = 1
    temporal_stride: int = 1
    inflate: bool = True
    downsample: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        st = (self.temporal_stride, self.spatial_stride, self.spatial_stride)
        kt = 3 if self.inflate else 1
        y = nn.relu(_conv3d(self.planes, (kt, 1, 1), name="conv1",
                            dtype=self.dtype)(x))
        y = nn.relu(_conv3d(self.planes, (1, 3, 3), strides=st, name="conv2",
                            dtype=self.dtype)(y))
        y = _conv3d(self.planes * 4, (1, 1, 1), name="conv3",
                    dtype=self.dtype)(y)
        residual = x
        if self.downsample:
            residual = _conv3d(self.planes * 4, (1, 1, 1), strides=st,
                               name="downsample", dtype=self.dtype)(x)
        return nn.relu(y + residual)


@dataclass(frozen=True)
class PoseC3DConfig:
    """The mmaction2 skeleton-PoseC3D SlowOnly-R50 shape."""

    num_classes: int = 20
    in_channels: int = 17
    base_channels: int = 32
    stage_blocks: Tuple[int, ...] = (4, 6, 3)
    spatial_strides: Tuple[int, ...] = (2, 2, 2)
    temporal_strides: Tuple[int, ...] = (1, 1, 2)
    inflate: Tuple[int, ...] = (0, 1, 1)


class SlowOnlyBackbone(nn.Module):
    cfg: PoseC3DConfig
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):  # (B, T, H, W, J)
        cfg = self.cfg
        x = nn.relu(_conv3d(cfg.base_channels, (1, 7, 7), name="conv1",
                            dtype=self.dtype)(x.astype(self.dtype)))
        planes = cfg.base_channels
        for s, (blocks, ss, ts, inf) in enumerate(zip(
                cfg.stage_blocks, cfg.spatial_strides,
                cfg.temporal_strides, cfg.inflate)):
            for b in range(blocks):
                x = Bottleneck3d(
                    planes,
                    spatial_stride=ss if b == 0 else 1,
                    temporal_stride=ts if b == 0 else 1,
                    inflate=bool(inf),
                    downsample=(b == 0),
                    name=f"layer{s + 1}_{b}",
                    dtype=self.dtype)(x)
            planes *= 2
        return x


class PoseC3DNet(nn.Module):
    """SlowOnly backbone + I3DHead: volumes (B, T, H, W, J) → logits."""

    cfg: PoseC3DConfig

    @nn.compact
    def __call__(self, x):
        f = SlowOnlyBackbone(self.cfg, name="backbone")(x)
        f = jnp.mean(f, axis=(1, 2, 3)).astype(jnp.float32)
        return nn.Dense(self.cfg.num_classes, dtype=jnp.float32,
                        name="fc_cls")(f)
