"""torchvision-layout ResNet backbones (checkpoint-parity form).

Two reference checkpoint families need a ResNet to convert onto:

- **mmdet CenterNet** (person/hand detection): ResNet-18 + CTResNetNeck
  (three deconv stages) + center/wh/offset heads — the real-checkpoint
  parity target for the detector slot (reference's trackers all start from
  a detector; hand boxes use RTMDet/mmdet, reference
  wrappers/hand_bbox.py:8-61).
- **SPIN/VIBE-family HMR regressors**: ResNet-50 + iterative
  pose/shape/cam head (reference wrappers/vibe.py:11-74 loads SPIN
  features; prohmr/pare are the same backbone family, INSTALL.md:28-37).

Same conversion conventions as models/hrnet.py: NHWC, bf16 activations,
every BatchNorm folded into its conv's bias at conversion time
(tools/convert_weights.py), submodules named after their torch
counterparts so conversion is a rename + BN fold, golden-tested against
published key sets in tests/test_convert_centernet_spin.py.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _conv(features, kernel, strides=1, name=None, dtype=jnp.bfloat16):
    """Biased conv (the bias carries the folded BatchNorm)."""
    return nn.Conv(features, (kernel, kernel), (strides, strides),
                   padding=[(kernel // 2, kernel // 2)] * 2,
                   use_bias=True, name=name, dtype=dtype)


class BasicBlock(nn.Module):
    """torchvision BasicBlock (3x3 → 3x3 + skip)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.relu(_conv(self.planes, 3, self.stride, name="conv1",
                          dtype=self.dtype)(x))
        y = _conv(self.planes, 3, name="conv2", dtype=self.dtype)(y)
        if self.downsample:
            residual = _conv(self.planes, 1, self.stride, name="downsample",
                             dtype=self.dtype)(x)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    """torchvision Bottleneck (1x1 → 3x3(stride) → 1x1×4 + skip)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.relu(_conv(self.planes, 1, name="conv1", dtype=self.dtype)(x))
        y = nn.relu(_conv(self.planes, 3, self.stride, name="conv2",
                          dtype=self.dtype)(y))
        y = _conv(self.planes * 4, 1, name="conv3", dtype=self.dtype)(y)
        if self.downsample:
            residual = _conv(self.planes * 4, 1, self.stride,
                             name="downsample", dtype=self.dtype)(x)
        return nn.relu(y + residual)


RESNET_SPECS = {
    # depth → (block, layers)
    18: (BasicBlock, (2, 2, 2, 2)),
    34: (BasicBlock, (3, 4, 6, 3)),
    50: (Bottleneck, (3, 4, 6, 3)),
}


class ResNet(nn.Module):
    """torchvision ResNet trunk → stride-32 feature map (B, H/32, W/32, C).

    Submodules named layer{1-4}_{n} / conv1 to mirror the torch state dict.
    """

    depth: int = 18
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        block, layers = RESNET_SPECS[self.depth]
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=True, name="conv1", dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])
        planes = 64
        for li, n_blocks in enumerate(layers, start=1):
            for n in range(n_blocks):
                stride = 2 if (n == 0 and li > 1) else 1
                expansion = 4 if block is Bottleneck else 1
                down = (n == 0 and (stride != 1
                                    or x.shape[-1] != planes * expansion))
                x = block(planes, stride, down, dtype=self.dtype,
                          name=f"layer{li}_{n}")(x)
            planes *= 2
        return x


class CTResNetNeck(nn.Module):
    """mmdet CTResNetNeck: 3 × (3x3 conv + 4x4 stride-2 deconv) stages
    lifting stride 32 → stride 4 (channels 256 → 128 → 64)."""

    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        for i, ch in enumerate((256, 128, 64)):
            x = nn.relu(_conv(ch, 3, name=f"conv{i}", dtype=self.dtype)(x))
            x = nn.ConvTranspose(ch, (4, 4), (2, 2), padding="SAME",
                                 use_bias=True, transpose_kernel=True,
                                 name=f"deconv{i}", dtype=self.dtype)(x)
            x = nn.relu(x)
        return x


class CenterNetParity(nn.Module):
    """mmdet CenterNet (resnet18 + CTResNetNeck + 3 heads), stride 4.

    Emits (center (B, h, w, C), wh (B, h, w, 2), offset (B, h, w, 2)) —
    the decode contract of models/detector.decode_centers with stride=4.
    """

    num_classes: int = 1
    depth: int = 18
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        feats = ResNet(self.depth, dtype=self.dtype, name="backbone")(x)
        feats = CTResNetNeck(dtype=self.dtype, name="neck")(feats)

        def head(out_ch, name):
            y = nn.Conv(64, (3, 3), padding="SAME", use_bias=True,
                        name=f"{name}_conv", dtype=self.dtype)(feats)
            y = nn.relu(y)
            return nn.Conv(out_ch, (1, 1), use_bias=True,
                           name=f"{name}_out", dtype=jnp.float32)(y)

        center = nn.sigmoid(head(self.num_classes, "heatmap"))
        wh = head(2, "wh")
        offset = head(2, "offset")
        return center, wh, offset


class SimpleBaselineParity(nn.Module):
    """mmpose SimpleBaseline parity: ResNet trunk + TopdownHeatmapSimpleHead
    (3 × 4×4 stride-2 ConvTranspose-256 + folded BN + ReLU, 1×1 final conv)
    → heatmaps at stride 4.

    This is the published checkpoint family for mmpose's ResNet-based
    top-down models — hand (res50_onehand10k/freihand/rhd), face
    (res50_wflw/aflw), and body (res50_coco) — i.e. the hand/face heads the
    reference serves through mmpose (reference wrappers/hand_estimation.py:
    10-77, mmpose_top_down_person entries). Conversion:
    tools/convert_weights.py --arch simplebaseline."""

    num_joints: int = 21
    depth: int = 50
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        f = ResNet(self.depth, dtype=self.dtype, name="backbone")(x)
        for i in range(3):
            f = nn.ConvTranspose(256, (4, 4), (2, 2), padding="SAME",
                                 use_bias=True, transpose_kernel=True,
                                 name=f"deconv{i}", dtype=self.dtype)(f)
            f = nn.relu(f)
        return nn.Conv(self.num_joints, (1, 1), use_bias=True,
                       name="final_layer", dtype=jnp.float32)(f)


class SPINRegressorParity(nn.Module):
    """SPIN/VIBE HMR head parity: ResNet-50 pooled features + iterative
    error-feedback regressor with the published fc1/fc2/decpose/decshape/
    deccam layout (+ npose-dim init buffers), 3 iterations.

    Output: (pose 24×6d, betas 10, cam 3) per frame — the tensors the
    reference's SMPLPerson rows store (reference pipeline.py:1556-1620).
    """

    n_iter: int = 3
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        feats = ResNet(50, dtype=self.dtype, name="backbone")(x)
        feats = jnp.mean(feats, axis=(1, 2)).astype(jnp.float32)  # (B, 2048)
        B = feats.shape[0]
        init_pose = self.param("init_pose", nn.initializers.zeros, (1, 144))
        init_shape = self.param("init_shape", nn.initializers.zeros, (1, 10))
        init_cam = self.param("init_cam", nn.initializers.zeros, (1, 3))
        pose = jnp.tile(init_pose, (B, 1))
        betas = jnp.tile(init_shape, (B, 1))
        cam = jnp.tile(init_cam, (B, 1))
        fc1 = nn.Dense(1024, name="fc1")
        fc2 = nn.Dense(1024, name="fc2")
        decpose = nn.Dense(144, name="decpose")
        decshape = nn.Dense(10, name="decshape")
        deccam = nn.Dense(3, name="deccam")
        for _ in range(self.n_iter):
            xc = jnp.concatenate([feats, pose, betas, cam], axis=-1)
            xc = nn.relu(fc1(xc))
            xc = nn.relu(fc2(xc))
            pose = decpose(xc) + pose
            betas = decshape(xc) + betas
            cam = deccam(xc) + cam
        return pose.reshape(B, 24, 6), betas, cam
