"""HigherHRNet associative-embedding bottom-up — checkpoint-parity arch.

The reference's bottom-up MMPose wrapper runs HigherHRNet-W32 AE
(reference wrappers/mmpose.py:84-121). The serving slot here is the compact
AE net in models/bottomup_ae.py (trained on the synthetic multi-person
protocol); this module is the *conversion target* for real mmpose
bottom-up checkpoints — the same role models/hrnet.py plays for the
top-down HRNet-W48 family.

Layout (mirroring mmpose ``AssociativeEmbedding`` + ``AEHigherResolutionHead``
for ``higher_hrnet32_coco_512x512``):

- ``backbone``: HRNet-W32 (reused from models/hrnet.py — identical module
  naming, BN folded at conversion);
- ``final_layers.0``: 1×1 conv on the stride-4 feature → J heatmaps + J
  tags (2J channels; ``with_ae_loss=[True, False]``);
- ``deconv_layers.0``: concat(backbone out, final_layers.0 out) → 4×4
  stride-2 ConvTranspose (+folded BN, ReLU) → 4 BasicBlocks — the
  "HigherResolution" stride-2 branch;
- ``final_layers.1``: 1×1 conv → J heatmaps at stride 2 (no tags).

torch ConvTranspose2d(k=4, s=2, p=1) maps to flax ConvTranspose with
``transpose_kernel=True`` + SAME padding and kernel laid out
(kh, kw, O, I) — verified numerically in tests/test_convert_higherhrnet.py.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .hrnet import BasicBlock, HRNet

Dtype = Any


class HigherHRNetAE(nn.Module):
    """Backbone + AE head. Returns (stride-4 [J hm | J tags], stride-2 J hm)."""

    num_joints: int = 17
    width: int = 32
    num_basic_blocks: int = 4
    stage_modules: Tuple[int, int, int] = (1, 4, 3)
    dtype: Dtype = jnp.bfloat16
    # train-time BatchStatNorm (models/hrnet.BatchStatNorm): the stat-free
    # folded layout is untrainable from scratch — the r4 weights measured
    # PCK 0.235 served, the same disease the HRNet-W48 slot had at 0.000.
    # fold_train_norm() recovers the checkpoint-parity layout after training.
    train_norm: bool = False

    @nn.compact
    def __call__(self, x):
        f = HRNet(width=self.width, stage_modules=self.stage_modules,
                  name="backbone", dtype=self.dtype,
                  train_norm=self.train_norm)(x)
        out0 = nn.Conv(2 * self.num_joints, (1, 1), use_bias=True,
                       name="final_layer0", dtype=jnp.float32)(
                           f.astype(jnp.float32))
        y = jnp.concatenate([f.astype(jnp.float32), out0], axis=-1)
        y = nn.relu(nn.ConvTranspose(
            self.width, (4, 4), strides=(2, 2), padding="SAME",
            transpose_kernel=True, use_bias=True, name="deconv0",
            dtype=self.dtype)(y.astype(self.dtype)))
        for n in range(self.num_basic_blocks):
            y = BasicBlock(self.width, name=f"deconv0_block{n}",
                           dtype=self.dtype, train_norm=self.train_norm)(y)
        out1 = nn.Conv(self.num_joints, (1, 1), use_bias=True,
                       name="final_layer1", dtype=jnp.float32)(
                           y.astype(jnp.float32))
        return out0, out1
