"""Shared neural blocks for the TPU model zoo (Flax linen, NHWC, bf16-ready).

Design rules (TPU-first, see SURVEY.md §7):
- matmuls/convs stay large and batched (MXU); activations default bfloat16
  with float32 params and float32 normalization statistics,
- normalization is GroupNorm/LayerNorm (stat-free: inference needs no running
  averages; converted torch BatchNorm weights get folded into convs),
- static shapes everywhere; no data-dependent Python control flow.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class ConvBlock(nn.Module):
    """Conv → GroupNorm → activation."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    groups: int = 32
    act: Optional[Callable] = nn.silu
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel, self.strides, padding="SAME",
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=min(self.groups, self.features),
                         dtype=jnp.float32)(x).astype(self.dtype)
        if self.act is not None:
            x = self.act(x)
        return x


class ResidualBlock(nn.Module):
    """Pre-activation residual block (2×3×3)."""

    features: int
    strides: Tuple[int, int] = (1, 1)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        residual = x
        y = ConvBlock(self.features, strides=self.strides, dtype=self.dtype)(x)
        y = ConvBlock(self.features, act=None, dtype=self.dtype)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1), self.strides, use_bias=False,
                               dtype=self.dtype)(residual)
        return nn.silu(y + residual)


class ConvStage(nn.Module):
    """Downsampling stage: strided block + N residual blocks."""

    features: int
    num_blocks: int = 2
    stride: int = 2
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = ResidualBlock(self.features, strides=(self.stride, self.stride), dtype=self.dtype)(x)
        for _ in range(self.num_blocks - 1):
            x = ResidualBlock(self.features, dtype=self.dtype)(x)
        return x


class ConvBackbone(nn.Module):
    """Simple strided conv backbone returning multi-scale features.

    Output strides 4/8/16/32 relative to the input (FPN-style consumers).
    """

    widths: Sequence[int] = (64, 128, 256, 512)
    blocks: Sequence[int] = (2, 2, 2, 2)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = ConvBlock(self.widths[0] // 2, kernel=(7, 7), strides=(2, 2), dtype=self.dtype)(x)
        feats = []
        for w, b in zip(self.widths, self.blocks):
            x = ConvStage(w, num_blocks=b, dtype=self.dtype)(x)
            feats.append(x)
        return feats


class MlpBlock(nn.Module):
    mlp_dim: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        x = nn.Dense(self.mlp_dim, dtype=self.dtype)(x)
        # exact (erf) GELU: matches the timm/torch blocks that converted
        # checkpoints come from (flax defaults to the tanh approximation)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(d, dtype=self.dtype)(x)


class TransformerBlock(nn.Module):
    """Standard pre-norm ViT block (MXU-native compute)."""

    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        y = nn.LayerNorm(dtype=jnp.float32)(x).astype(self.dtype)
        y = nn.MultiHeadDotProductAttention(num_heads=self.num_heads, dtype=self.dtype)(y, y)
        x = x + y
        y = nn.LayerNorm(dtype=jnp.float32)(x).astype(self.dtype)
        y = MlpBlock(int(d * self.mlp_ratio), dtype=self.dtype)(y)
        return x + y


class PatchEmbed(nn.Module):
    """Image → patch tokens via strided conv (one big MXU matmul)."""

    dim: int
    patch: int = 16
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.dim, (self.patch, self.patch), (self.patch, self.patch),
                    padding="VALID", dtype=self.dtype)(x)
        B, H, W, D = x.shape
        return x.reshape(B, H * W, D), (H, W)


class ViT(nn.Module):
    """Plain vision transformer backbone (ViTPose-style, arXiv:2204.12484 idea
    re-expressed for TPU: big fused attention/MLP matmuls, bf16 activations)."""

    dim: int = 384
    depth: int = 8
    num_heads: int = 6
    patch: int = 16
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        tokens, (h, w) = PatchEmbed(self.dim, self.patch, dtype=self.dtype)(x)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, tokens.shape[1], self.dim))
        tokens = tokens + pos.astype(self.dtype)
        for _ in range(self.depth):
            tokens = TransformerBlock(self.num_heads, dtype=self.dtype)(tokens)
        tokens = nn.LayerNorm(dtype=jnp.float32)(tokens)
        B = tokens.shape[0]
        return tokens.reshape(B, h, w, self.dim)


class DeconvHead(nn.Module):
    """Upsampling heatmap head: N× (2× transposed conv) → 1×1 conv to J maps.

    (The "simple baselines" head used by top-down pose nets; reference models
    produce (J, 64, 48) heatmaps from 256×192 crops.)
    """

    num_joints: int
    num_deconvs: int = 2
    features: int = 256
    # "group": stat-free GroupNorm (TPU training default); "torch": biased
    # deconvs in torch kernel layout with BatchNorm folded in by
    # tools/convert_weights.py (checkpoint-parity inference form)
    norm: str = "group"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        torch_compat = self.norm == "torch"
        for _ in range(self.num_deconvs):
            x = nn.ConvTranspose(self.features, (4, 4), (2, 2), padding="SAME",
                                 use_bias=torch_compat,
                                 transpose_kernel=torch_compat,
                                 dtype=self.dtype)(x)
            if not torch_compat:
                x = nn.GroupNorm(num_groups=32, dtype=jnp.float32)(x).astype(self.dtype)
            x = nn.relu(x)
        x = nn.Conv(self.num_joints, (1, 1), dtype=jnp.float32)(x)
        return x  # (B, H, W, J) float32 heatmaps
