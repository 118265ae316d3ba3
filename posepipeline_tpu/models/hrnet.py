"""HRNet-W32/W48 backbone + simple heatmap head (checkpoint-parity form).

The reference's flagship 2D model is MMPose HRNet-W48 + DARK decode
(reference wrappers/mmpose.py:26-81, checkpoints per INSTALL.md:28-37).
Round 2 had no HRNet at all, which made the "PCK within 1% of the reference
wrappers" target unfalsifiable — a real MMPose checkpoint had nothing to map
onto. This module is that target architecture, expressed TPU-first:

- NHWC, bf16 activations / f32 params; convs are MXU work and XLA fuses the
  bias+ReLU chains that torch runs as separate CUDA kernels;
- BatchNorm is *folded into conv biases at conversion time*
  (tools/convert_weights.py), so inference is stat-free — every conv here
  carries a bias in place of the torch conv+BN pair;
- fusion upsampling is ``jnp.repeat`` (nearest, matching torch
  ``nn.Upsample(mode='nearest')``); all shapes static.

Every submodule is explicitly named after its torch counterpart
(``conv1``, ``layer1_0``, ``stage3_2_branch1_block0_conv2``,
``stage4_2_fuse_0_2_0`` …) so the converter's mapping from real mmpose
state-dict keys (``backbone.stage3.2.branches.1.0.conv2.weight`` …) is a
direct rename + BN fold, golden-tested against the published layout in
tests/test_hrnet.py.

Only the branch-0 (stride-4, W-channel) output of the last module is
computed — that is the only input the mmpose TopdownHeatmapSimpleHead
consumes (final 1×1 conv → J heatmaps), so the W48 head is
``final_layer`` here, exactly as in the torch checkpoint.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class BatchStatNorm(nn.Module):
    """Stat-free trainable BatchNorm for the parity architecture.

    The serving layout is *stat-free* (BN folded into conv biases), which
    makes the net untrainable from scratch — a 100+-conv CNN with no
    normalization diverges (observed round 4: HRNet-W48 trained to PCK 0.000
    with the plain layout). This layer restores BN semantics at train time
    using only the current batch's statistics — a pure function, no mutable
    running averages — and `fold_train_norm()` later folds calibration-batch
    statistics plus gamma/beta into the preceding conv's kernel/bias,
    recovering the exact checkpoint-parity param layout that
    tools/convert_weights.py produces from real torch state dicts."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, y):
        c = y.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (c,), jnp.float32)
        y32 = y.astype(jnp.float32)
        axes = tuple(range(y.ndim - 1))
        mean = jnp.mean(y32, axes)
        var = jnp.var(y32, axes)
        # sown only when the caller passes mutable=["norm_stats"]
        # (fold-time calibration); a plain apply skips it.
        self.sow("norm_stats", "stats", (mean, var),
                 reduce_fn=lambda a, b: b, init_fn=lambda: None)
        out = (y32 - mean) * jax.lax.rsqrt(var + self.eps) * gamma + beta
        return out.astype(y.dtype)


def _conv(features, kernel, strides=1, name=None, dtype=jnp.bfloat16,
          train_norm=False):
    """Biased conv (the bias carries the folded BatchNorm).

    With ``train_norm`` a BatchStatNorm named ``<name>_bn`` follows the conv
    (the torch conv+BN position); fold_train_norm() removes it again."""
    conv = nn.Conv(features, (kernel, kernel), (strides, strides),
                   padding=[(kernel // 2, kernel // 2)] * 2,
                   use_bias=True, name=name, dtype=dtype)
    if not train_norm:
        return conv
    bsn = BatchStatNorm(name=f"{name}_bn")
    return lambda x: bsn(conv(x))


class Bottleneck(nn.Module):
    """torch torchvision-style Bottleneck (1x1 → 3x3 → 1x1×4 + skip)."""

    planes: int
    downsample: bool = False
    dtype: Dtype = jnp.bfloat16
    train_norm: bool = False

    @nn.compact
    def __call__(self, x):
        tn = self.train_norm
        residual = x
        y = nn.relu(_conv(self.planes, 1, name="conv1", dtype=self.dtype,
                          train_norm=tn)(x))
        y = nn.relu(_conv(self.planes, 3, name="conv2", dtype=self.dtype,
                          train_norm=tn)(y))
        y = _conv(self.planes * 4, 1, name="conv3", dtype=self.dtype,
                  train_norm=tn)(y)
        if self.downsample:
            residual = _conv(self.planes * 4, 1, name="downsample",
                             dtype=self.dtype, train_norm=tn)(x)
        return nn.relu(y + residual)


class BasicBlock(nn.Module):
    """torch BasicBlock (3x3 → 3x3 + skip); branch channels never change."""

    planes: int
    dtype: Dtype = jnp.bfloat16
    train_norm: bool = False

    @nn.compact
    def __call__(self, x):
        tn = self.train_norm
        y = nn.relu(_conv(self.planes, 3, name="conv1", dtype=self.dtype,
                          train_norm=tn)(x))
        y = _conv(self.planes, 3, name="conv2", dtype=self.dtype,
                  train_norm=tn)(y)
        return nn.relu(y + x)


class HRModule(nn.Module):
    """One HighResolutionModule: per-branch BasicBlocks + full fusion.

    ``num_out`` limits fusion outputs (the last stage-4 module only needs
    branch 0). Fuse layer (i, j): j==i identity; j>i 1×1 conv + nearest
    2^(j−i) upsample; j<i a chain of stride-2 3×3 convs (ReLU between, none
    after the last) — mirroring mmpose HRNet._make_fuse_layers.
    """

    widths: Sequence[int]
    num_blocks: int = 4
    num_out: int = -1
    dtype: Dtype = jnp.bfloat16
    train_norm: bool = False

    @nn.compact
    def __call__(self, xs):
        tn = self.train_norm
        nb = len(self.widths)
        n_out = nb if self.num_out < 0 else self.num_out
        ys = []
        for b, (x, w) in enumerate(zip(xs, self.widths)):
            for n in range(self.num_blocks):
                x = BasicBlock(w, name=f"branch{b}_block{n}",
                               dtype=self.dtype, train_norm=tn)(x)
            ys.append(x)
        outs = []
        for i in range(n_out):
            acc = None
            for j in range(nb):
                if j == i:
                    f = ys[j]
                elif j > i:
                    f = _conv(self.widths[i], 1, name=f"fuse_{i}_{j}_0",
                              dtype=self.dtype, train_norm=tn)(ys[j])
                    r = 2 ** (j - i)
                    f = jnp.repeat(jnp.repeat(f, r, axis=1), r, axis=2)
                else:
                    f = ys[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        f = _conv(self.widths[i] if last else self.widths[j],
                                  3, strides=2, name=f"fuse_{i}_{j}_{k}",
                                  dtype=self.dtype, train_norm=tn)(f)
                        if not last:
                            f = nn.relu(f)
                acc = f if acc is None else acc + f
            outs.append(nn.relu(acc))
        return outs


class HRNet(nn.Module):
    """HRNet backbone; returns the stride-4 branch-0 feature map."""

    width: int = 48
    stage_modules: Tuple[int, int, int] = (1, 4, 3)  # stages 2, 3, 4
    dtype: Dtype = jnp.bfloat16
    train_norm: bool = False

    @nn.compact
    def __call__(self, x):
        tn = self.train_norm
        w = self.width
        widths4 = (w, 2 * w, 4 * w, 8 * w)
        x = nn.relu(_conv(64, 3, strides=2, name="conv1", dtype=self.dtype,
                          train_norm=tn)(x.astype(self.dtype)))
        x = nn.relu(_conv(64, 3, strides=2, name="conv2", dtype=self.dtype,
                          train_norm=tn)(x))
        for n in range(4):
            x = Bottleneck(64, downsample=(n == 0), name=f"layer1_{n}",
                           dtype=self.dtype, train_norm=tn)(x)
        # transitions add one stride-2 branch per stage and re-channel the rest
        xs = [
            nn.relu(_conv(widths4[0], 3, name="transition1_0",
                          dtype=self.dtype, train_norm=tn)(x)),
            nn.relu(_conv(widths4[1], 3, strides=2, name="transition1_1",
                          dtype=self.dtype, train_norm=tn)(x)),
        ]
        for s, n_modules in zip((2, 3, 4), self.stage_modules):
            if s > 2:
                xs.append(nn.relu(_conv(
                    widths4[s - 1], 3, strides=2,
                    name=f"transition{s - 1}_{s - 1}",
                    dtype=self.dtype, train_norm=tn)(xs[-1])))
            for m in range(n_modules):
                last_overall = s == 4 and m == n_modules - 1
                xs = HRModule(widths4[:s], num_out=1 if last_overall else -1,
                              name=f"stage{s}_{m}", dtype=self.dtype,
                              train_norm=tn)(xs)
        return xs[0]


class HRNetHeatmap(nn.Module):
    """HRNet + mmpose TopdownHeatmapSimpleHead (no deconvs, 1×1 final):
    crops (B, 256, 192, 3) normalized → heatmaps (B, 64, 48, J)."""

    num_joints: int = 17
    width: int = 48
    stage_modules: Tuple[int, int, int] = (1, 4, 3)
    dtype: Dtype = jnp.bfloat16
    train_norm: bool = False

    @nn.compact
    def __call__(self, x):
        f = HRNet(width=self.width, stage_modules=self.stage_modules,
                  name="backbone", dtype=self.dtype,
                  train_norm=self.train_norm)(x)
        return nn.Conv(self.num_joints, (1, 1), use_bias=True,
                       name="final_layer", dtype=jnp.float32)(
                           f.astype(jnp.float32))


def fold_train_norm(net, params, calib_fn, num_batches: int = 8):
    """Fold a train_norm net's BatchStatNorm layers into conv biases.

    ``calib_fn(i) -> crops_normalized`` supplies calibration batches drawn
    from the training distribution. Per-layer batch statistics are pooled
    across batches (exact pooled mean/variance, not an EMA), then each
    ``<name>_bn``'s (gamma, beta, mean, var) is folded into the sibling conv
    ``<name>``'s kernel/bias — the same algebra tools/convert_weights.py
    applies to torch conv+BN pairs — yielding the stat-free parity layout
    loadable by a plain (train_norm=False) net."""
    from collections.abc import Mapping

    import numpy as np

    sums = {}

    def _walk_stats(tree, path):
        for k, v in tree.items():
            if k == "stats":  # leaf sown by BatchStatNorm
                mean, var = v[0] if isinstance(v, tuple) and len(v) == 1 \
                    and isinstance(v[0], tuple) else v
                m = np.asarray(mean, np.float64)
                s2 = np.asarray(var, np.float64) + m ** 2  # E[y^2]
                acc = sums.setdefault(path, [0.0, 0.0, 0])
                acc[0] += m
                acc[1] += s2
                acc[2] += 1
            elif isinstance(v, Mapping):
                _walk_stats(v, path + (k,))

    for i in range(num_batches):
        _, mut = net.apply(params, calib_fn(i), mutable=["norm_stats"])
        _walk_stats(dict(mut["norm_stats"]), ())

    stats = {p: (a[0] / a[2], a[1] / a[2] - (a[0] / a[2]) ** 2)
             for p, a in sums.items()}

    def _fold(tree, path):
        out = {}
        bn_names = {k for k in tree if k.endswith("_bn")}
        for k, v in tree.items():
            if k in bn_names:
                continue
            if isinstance(v, Mapping) and f"{k}_bn" in bn_names:
                mean, var = stats[path + (f"{k}_bn",)]
                bn = tree[f"{k}_bn"]
                gamma = np.asarray(bn["gamma"], np.float64)
                beta = np.asarray(bn["beta"], np.float64)
                scale = gamma / np.sqrt(var + BatchStatNorm.eps)
                kern = np.asarray(v["kernel"], np.float64)
                bias = np.asarray(v["bias"], np.float64)
                out[k] = {
                    "kernel": jnp.asarray(kern * scale, jnp.float32),
                    "bias": jnp.asarray((bias - mean) * scale + beta,
                                        jnp.float32),
                }
            elif isinstance(v, Mapping):
                out[k] = _fold(v, path + (k,))
            else:
                out[k] = v
        return out

    p = dict(params["params"]) if "params" in params else dict(params)
    folded = _fold(p, ())
    return {"params": folded} if "params" in params else folded
