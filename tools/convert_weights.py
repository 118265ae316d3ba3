#!/usr/bin/env python
"""Convert torch checkpoints into posepipeline_tpu Flax parameter pytrees.

The reference wraps pretrained torch models directly; this framework's models
are TPU-native architectures, so checkpoints are *mapped*, not loaded 1:1:

- Linear:  torch (out, in)  → flax kernel (in, out)   [transpose]
- Conv2d:  torch (O, I, kh, kw) → flax (kh, kw, I, O) [permute]
- Conv1d:  torch (O, I, k)  → flax (k, I, O)
- LayerNorm: weight→scale, bias→bias
- BatchNorm: folded into the preceding conv (scale/shift absorbed) since the
  TPU nets use stat-free GroupNorm/LayerNorm.

Usage:
    python tools/convert_weights.py --src ckpt.pth --arch vitpose --out params.msgpack

Without a matching source checkpoint this module still provides the mapping
primitives (unit-tested with synthetic torch tensors in tests/test_tools.py).
"""

from __future__ import annotations

import argparse
from typing import Dict

import numpy as np


def t2f_linear(weight, bias=None):
    """torch Linear → flax Dense params."""
    p = {"kernel": np.asarray(weight).T}
    if bias is not None:
        p["bias"] = np.asarray(bias)
    return p


def t2f_conv2d(weight, bias=None):
    """torch Conv2d (O, I, kh, kw) → flax Conv (kh, kw, I, O)."""
    p = {"kernel": np.transpose(np.asarray(weight), (2, 3, 1, 0))}
    if bias is not None:
        p["bias"] = np.asarray(bias)
    return p


def t2f_conv1d(weight, bias=None):
    """torch Conv1d (O, I, k) → flax Conv (k, I, O)."""
    p = {"kernel": np.transpose(np.asarray(weight), (2, 1, 0))}
    if bias is not None:
        p["bias"] = np.asarray(bias)
    return p


def t2f_layernorm(weight, bias):
    return {"scale": np.asarray(weight), "bias": np.asarray(bias)}


def fold_batchnorm_into_conv(conv_kernel, conv_bias, bn_weight, bn_bias,
                             bn_mean, bn_var, eps: float = 1e-5):
    """Absorb a BatchNorm (inference stats) into the preceding conv.

    Returns (kernel, bias) in flax layout given a flax-layout kernel
    (..., I, O). The TPU nets are stat-free, so converted torch conv+BN pairs
    collapse to a single conv.
    """
    scale = np.asarray(bn_weight) / np.sqrt(np.asarray(bn_var) + eps)
    kernel = np.asarray(conv_kernel) * scale  # broadcast over O (last axis)
    bias = (np.asarray(conv_bias) if conv_bias is not None else 0.0)
    bias = (bias - np.asarray(bn_mean)) * scale + np.asarray(bn_bias)
    return kernel, bias


def t2f_mha(q_w, q_b, k_w, k_b, v_w, v_b, out_w, out_b, num_heads: int):
    """torch in-proj/out-proj MultiheadAttention → flax MultiHeadDotProductAttention.

    torch: (D, D) projections; flax: kernel (D, H, D/H) per q/k/v and
    out kernel (H, D/H, D).
    """
    D = np.asarray(q_w).shape[1]
    hd = D // num_heads

    def split(w, b):
        return {"kernel": np.asarray(w).T.reshape(D, num_heads, hd),
                "bias": np.asarray(b).reshape(num_heads, hd)}

    return {
        "query": split(q_w, q_b),
        "key": split(k_w, k_b),
        "value": split(v_w, v_b),
        "out": {"kernel": np.asarray(out_w).T.reshape(num_heads, hd, D),
                "bias": np.asarray(out_b)},
    }


def convert_vit_block(torch_state: Dict[str, np.ndarray], prefix: str,
                      num_heads: int) -> Dict:
    """Map one timm/ViTPose-style transformer block onto TransformerBlock."""
    g = lambda k: np.asarray(torch_state[f"{prefix}.{k}"])
    qkv_w = g("attn.qkv.weight")   # (3D, D)
    qkv_b = g("attn.qkv.bias")
    D = qkv_w.shape[1]
    q_w, k_w, v_w = qkv_w[:D], qkv_w[D:2 * D], qkv_w[2 * D:]
    q_b, k_b, v_b = qkv_b[:D], qkv_b[D:2 * D], qkv_b[2 * D:]
    return {
        "LayerNorm_0": t2f_layernorm(g("norm1.weight"), g("norm1.bias")),
        "MultiHeadDotProductAttention_0": t2f_mha(
            q_w, q_b, k_w, k_b, v_w, v_b,
            g("attn.proj.weight"), g("attn.proj.bias"), num_heads),
        "LayerNorm_1": t2f_layernorm(g("norm2.weight"), g("norm2.bias")),
        "MlpBlock_0": {
            "Dense_0": t2f_linear(g("mlp.fc1.weight"), g("mlp.fc1.bias")),
            "Dense_1": t2f_linear(g("mlp.fc2.weight"), g("mlp.fc2.bias")),
        },
    }


def _conv1d_with_bn(torch_state: Dict[str, np.ndarray], conv: str,
                    bn: str | None) -> Dict:
    """One torch Conv1d (+ optional folded BatchNorm1d) → flax Conv params."""
    p = t2f_conv1d(torch_state[f"{conv}.weight"],
                   torch_state.get(f"{conv}.bias"))
    if bn is not None and f"{bn}.weight" in torch_state:
        kernel, bias = fold_batchnorm_into_conv(
            p["kernel"], p.get("bias"),
            torch_state[f"{bn}.weight"], torch_state[f"{bn}.bias"],
            torch_state[f"{bn}.running_mean"], torch_state[f"{bn}.running_var"])
        p = {"kernel": kernel, "bias": bias}
    return p


def convert_videopose3d(torch_state: Dict[str, np.ndarray]) -> Dict:
    """Map a VideoPose3D TemporalModel state dict onto TemporalLifter slots.

    Layer names are mapped *explicitly* in architecture order — expand_conv,
    layers_conv.N in numeric order, then the final ``shrink`` output conv —
    with each conv's BatchNorm folded in (ref videopose3d model layout:
    wrappers/videopose3d.py:40-57 builds TemporalModelOptimized1f)."""
    out = {"Conv_0": _conv1d_with_bn(torch_state, "expand_conv", "expand_bn")}
    idx = 1
    layer_ids = sorted({int(k.split(".")[1]) for k in torch_state
                        if k.startswith("layers_conv.")})
    for i in layer_ids:
        out[f"Conv_{idx}"] = _conv1d_with_bn(
            torch_state, f"layers_conv.{i}", f"layers_bn.{i}")
        idx += 1
    # final 'shrink' is a width-1 Conv1d in torch; TemporalLifter ends in a
    # Dense — identical math, kernel (C, out) = squeeze+transpose of (out, C, 1)
    shrink_w = np.asarray(torch_state["shrink.weight"])[:, :, 0]
    dense = {"kernel": shrink_w.T}
    if "shrink.bias" in torch_state:
        dense["bias"] = np.asarray(torch_state["shrink.bias"])
    out["Dense_0"] = dense
    return out


def _conv2d_bn(state: Dict[str, np.ndarray], conv: str, bn: str) -> Dict:
    """torch Conv2d + BatchNorm2d → one biased flax Conv (BN folded)."""
    p = t2f_conv2d(state[f"{conv}.weight"], state.get(f"{conv}.bias"))
    kernel, bias = fold_batchnorm_into_conv(
        p["kernel"], p.get("bias"),
        state[f"{bn}.weight"], state[f"{bn}.bias"],
        state[f"{bn}.running_mean"], state[f"{bn}.running_var"])
    return {"kernel": kernel, "bias": bias}


def t2f_conv3d(weight, bias=None):
    """torch Conv3d (O, I, kt, kh, kw) → flax Conv (kt, kh, kw, I, O)."""
    p = {"kernel": np.transpose(np.asarray(weight), (2, 3, 4, 1, 0))}
    if bias is not None:
        p["bias"] = np.asarray(bias)
    return p


def _convmodule3d(state: Dict[str, np.ndarray], prefix: str) -> Dict:
    """mmaction2/mmcv ConvModule (``.conv`` Conv3d + ``.bn`` BatchNorm3d) →
    one biased flax Conv (BN folded)."""
    p = t2f_conv3d(state[f"{prefix}.conv.weight"],
                   state.get(f"{prefix}.conv.bias"))
    kernel, bias = fold_batchnorm_into_conv(
        p["kernel"], p.get("bias"),
        state[f"{prefix}.bn.weight"], state[f"{prefix}.bn.bias"],
        state[f"{prefix}.bn.running_mean"],
        state[f"{prefix}.bn.running_var"])
    return {"kernel": kernel, "bias": bias}


def convert_posec3d(s: Dict[str, np.ndarray]) -> Dict:
    """Map an mmaction2 PoseC3D (SlowOnly ResNet3d + I3DHead) state dict
    onto models/posec3d.PoseC3DNet.

    The reference action wrapper's checkpoint family (reference
    wrappers/mmaction.py:9-86). Stage/block structure is discovered from
    the key set (``backbone.layer{l}.{b}.conv{1..3}.conv.weight`` — every
    mmcv ConvModule is ``.conv`` + ``.bn``), so any SlowOnly depth converts
    with one code path; BatchNorms fold into conv biases."""
    out: Dict = {"conv1": _convmodule3d(s, "backbone.conv1")}
    layers = sorted({int(k.split(".")[1][len("layer"):])
                     for k in s if k.startswith("backbone.layer")})
    for l in layers:
        blocks = sorted({int(k.split(".")[2]) for k in s
                         if k.startswith(f"backbone.layer{l}.")})
        for b in blocks:
            bp = f"backbone.layer{l}.{b}"
            blk = {c: _convmodule3d(s, f"{bp}.{c}")
                   for c in ("conv1", "conv2", "conv3")}
            if f"{bp}.downsample.conv.weight" in s:
                blk["downsample"] = _convmodule3d(s, f"{bp}.downsample")
            out[f"layer{l}_{b}"] = blk
    head = t2f_linear(s["cls_head.fc_cls.weight"],
                      s.get("cls_head.fc_cls.bias"))
    return {"params": {"backbone": out, "fc_cls": head}}


def convert_hrnet(torch_state: Dict[str, np.ndarray],
                  consumed: set | None = None) -> Dict:
    """Map an mmpose HRNet top-down state dict (``backbone.*`` HRNet +
    ``keypoint_head.final_layer``) onto models/hrnet.py HRNetHeatmap.

    The reference's flagship checkpoints are exactly this family (HRNet-W48
    DARK COCO/WholeBody/Halpe — reference wrappers/mmpose.py:26-44,
    INSTALL.md:28-37). Stage/module/branch counts are discovered from the
    key set, so W32/W48 and any stage config convert with one code path.
    Every BatchNorm is folded into its conv (the flax net is stat-free).

    ``consumed`` (optional set) collects every torch key the mapping read —
    the golden test asserts nothing load-bearing was silently dropped.
    """
    raw = torch_state
    s = raw
    if consumed is not None:
        class _Track(dict):
            def __getitem__(self, k):
                consumed.add(k)
                return raw[k]

            def get(self, k, default=None):
                if k in raw:
                    consumed.add(k)
                    return raw[k]
                return default

            def __contains__(self, k):
                return k in raw

            def __iter__(self):
                return iter(raw)

        s = _Track()

    out = _convert_hrnet_backbone(s)
    head = t2f_conv2d(s["keypoint_head.final_layer.weight"],
                      s.get("keypoint_head.final_layer.bias"))
    return {"params": {"backbone": out, "final_layer": head}}


def _convert_hrnet_backbone(s) -> Dict:
    """The ``backbone.*`` HRNet portion of an mmpose state dict →
    models/hrnet.HRNet param tree (shared by the top-down and the
    HigherHRNet bottom-up converters)."""
    def cbn(conv, bn):
        return _conv2d_bn(s, f"backbone.{conv}", f"backbone.{bn}")

    out: Dict = {
        "conv1": cbn("conv1", "bn1"),
        "conv2": cbn("conv2", "bn2"),
    }
    # layer1: 4 bottlenecks; block 0 carries the 64→256 downsample
    n_l1 = len({k.split(".")[2] for k in s if k.startswith("backbone.layer1.")})
    for n in range(n_l1):
        blk = {
            "conv1": cbn(f"layer1.{n}.conv1", f"layer1.{n}.bn1"),
            "conv2": cbn(f"layer1.{n}.conv2", f"layer1.{n}.bn2"),
            "conv3": cbn(f"layer1.{n}.conv3", f"layer1.{n}.bn3"),
        }
        if f"backbone.layer1.{n}.downsample.0.weight" in s:
            blk["downsample"] = cbn(f"layer1.{n}.downsample.0",
                                    f"layer1.{n}.downsample.1")
        out[f"layer1_{n}"] = blk
    # transition1: branch 0 re-channels (Sequential(conv, bn)), branch 1 is
    # the new stride-2 branch (nested Sequential)
    out["transition1_0"] = cbn("transition1.0.0", "transition1.0.1")
    out["transition1_1"] = cbn("transition1.1.0.0", "transition1.1.0.1")

    stage_ids = sorted({int(k.split(".")[1][len("stage"):])
                        for k in s if k.startswith("backbone.stage")})
    for si in stage_ids:
        if si > 2:
            # new-branch transition (other slots are identity/None in torch)
            t = si - 1
            b = si - 1
            out[f"transition{t}_{b}"] = cbn(f"transition{t}.{b}.0.0",
                                            f"transition{t}.{b}.0.1")
        modules = sorted({int(k.split(".")[2]) for k in s
                          if k.startswith(f"backbone.stage{si}.")})
        last_stage = si == stage_ids[-1]
        for m in modules:
            pre = f"stage{si}.{m}"
            mod: Dict = {}
            branches = sorted({int(k.split(".")[4]) for k in s
                               if k.startswith(f"backbone.{pre}.branches.")})
            for b in branches:
                blocks = sorted({int(k.split(".")[5]) for k in s
                                 if k.startswith(f"backbone.{pre}.branches.{b}.")})
                for n in blocks:
                    bp = f"{pre}.branches.{b}.{n}"
                    mod[f"branch{b}_block{n}"] = {
                        "conv1": cbn(f"{bp}.conv1", f"{bp}.bn1"),
                        "conv2": cbn(f"{bp}.conv2", f"{bp}.bn2"),
                    }
            # fusion: the very last module only feeds branch 0 (the head
            # input) — its fuse_layers.1+ exist in the checkpoint but are
            # dead weight for inference and are skipped
            n_out = 1 if (last_stage and m == modules[-1]) else len(branches)
            for i in range(n_out):
                for j in range(len(branches)):
                    if j == i:
                        continue
                    fp = f"{pre}.fuse_layers.{i}.{j}"
                    if j > i:  # 1×1 conv + BN (+ upsample, weightless)
                        mod[f"fuse_{i}_{j}_0"] = cbn(f"{fp}.0", f"{fp}.1")
                    else:      # chain of stride-2 convs
                        for k in range(i - j):
                            mod[f"fuse_{i}_{j}_{k}"] = cbn(f"{fp}.{k}.0",
                                                           f"{fp}.{k}.1")
            out[f"stage{si}_{m}"] = mod
    return out


def convert_higherhrnet(s: Dict[str, np.ndarray]) -> Dict:
    """Map an mmpose HigherHRNet AE bottom-up state dict onto
    models/higherhrnet.HigherHRNetAE.

    The reference bottom-up wrapper's checkpoint family (reference
    wrappers/mmpose.py:84-121, ``higher_hrnet32_coco_512x512``). Head layout
    (mmpose ``AEHigherResolutionHead``):

    - ``keypoint_head.final_layers.{0,1}``: biased 1×1 convs;
    - ``keypoint_head.deconv_layers.0.0``: Sequential(ConvTranspose2d(k=4,
      s=2, p=1), BN, ReLU) — BN folds into the deconv (output channels sit
      on axis 2 of the flax (kh, kw, O, I) transpose-kernel layout);
    - ``keypoint_head.deconv_layers.0.{1..4}``: Sequential-wrapped
      BasicBlocks (``.{n}.0.conv1`` …).
    """
    out: Dict = {"backbone": _convert_hrnet_backbone(s)}
    for i in (0, 1):
        out[f"final_layer{i}"] = t2f_conv2d(
            s[f"keypoint_head.final_layers.{i}.weight"],
            s.get(f"keypoint_head.final_layers.{i}.bias"))
    # deconv: torch ConvTranspose2d weight (I, O, kh, kw) → flax
    # transpose_kernel layout (kh, kw, O, I); BN scale broadcasts on axis 2
    dk = np.transpose(
        np.asarray(s["keypoint_head.deconv_layers.0.0.0.weight"]),
        (2, 3, 1, 0))
    bn = "keypoint_head.deconv_layers.0.0.1"
    scale = np.asarray(s[f"{bn}.weight"]) / np.sqrt(
        np.asarray(s[f"{bn}.running_var"]) + 1e-5)
    out["deconv0"] = {
        "kernel": dk * scale[None, None, :, None],
        "bias": (-np.asarray(s[f"{bn}.running_mean"])) * scale
        + np.asarray(s[f"{bn}.bias"]),
    }
    blocks = sorted({int(k.split(".")[3]) for k in s
                     if k.startswith("keypoint_head.deconv_layers.0.")
                     and int(k.split(".")[3]) > 0})
    for n in blocks:
        bp = f"keypoint_head.deconv_layers.0.{n}.0"
        out[f"deconv0_block{n - 1}"] = {
            "conv1": _conv2d_bn(s, f"{bp}.conv1", f"{bp}.bn1"),
            "conv2": _conv2d_bn(s, f"{bp}.conv2", f"{bp}.bn2"),
        }
    return {"params": out}


def convert_resnet(s: Dict[str, np.ndarray], prefix: str = "backbone.") -> Dict:
    """torchvision-layout ResNet (mmdet/SPIN backbones) → models/resnet.ResNet.

    Stage/block/downsample structure is discovered from the key set, so
    resnet18/34/50 convert with one code path; every BatchNorm folds into
    its conv (the flax trunk is stat-free)."""
    out: Dict = {"conv1": _conv2d_bn_pair(s, f"{prefix}conv1", f"{prefix}bn1")}
    layer_ids = sorted({int(k[len(prefix) + 5]) for k in s
                        if k.startswith(f"{prefix}layer")})
    for li in layer_ids:
        blocks = sorted({int(k.split(".")[1 + prefix.count(".")]) for k in s
                         if k.startswith(f"{prefix}layer{li}.")})
        for n in blocks:
            bp = f"{prefix}layer{li}.{n}"
            blk: Dict = {}
            for ci in (1, 2, 3):
                if f"{bp}.conv{ci}.weight" in s:
                    blk[f"conv{ci}"] = _conv2d_bn_pair(s, f"{bp}.conv{ci}",
                                                       f"{bp}.bn{ci}")
            if f"{bp}.downsample.0.weight" in s:
                blk["downsample"] = _conv2d_bn_pair(s, f"{bp}.downsample.0",
                                                    f"{bp}.downsample.1")
            out[f"layer{li}_{n}"] = blk
    return out


def _conv2d_bn_pair(s, conv, bn):
    """Conv2d (+BN if its keys exist) → biased flax Conv params."""
    if f"{bn}.weight" in s:
        return _conv2d_bn(s, conv, bn)
    return t2f_conv2d(s[f"{conv}.weight"], s.get(f"{conv}.bias"))


def convert_centernet(s: Dict[str, np.ndarray]) -> Dict:
    """mmdet CenterNet (resnet18 + CTResNetNeck + CenterNetHead) →
    models/resnet.CenterNetParity.

    Neck Sequential layout per upsample stage i: ConvModule at 3i
    (``.conv``/``.bn``), ConvTranspose2d at 3i+1, BatchNorm at 3i+2.
    Heads: ``bbox_head.{heatmap,wh,offset}_head.{0,2}`` (3×3 conv, ReLU,
    1×1 conv). Reference detector role: every tracker's first stage
    (reference wrappers/deep_sort_yolov4, mmtrack), hand boxes via mmdet
    (reference wrappers/hand_bbox.py:8-61)."""
    backbone = convert_resnet(s, "backbone.")
    neck: Dict = {}
    for i in range(3):
        neck[f"conv{i}"] = _conv2d_bn_pair(
            s, f"neck.deconv_layers.{3 * i}.conv",
            f"neck.deconv_layers.{3 * i}.bn")
        neck[f"deconv{i}"] = _deconv_with_bn(
            s, f"neck.deconv_layers.{3 * i + 1}",
            f"neck.deconv_layers.{3 * i + 2}")
    out: Dict = {"backbone": backbone, "neck": neck}
    for head in ("heatmap", "wh", "offset"):
        out[f"{head}_conv"] = t2f_conv2d(
            s[f"bbox_head.{head}_head.0.weight"],
            s.get(f"bbox_head.{head}_head.0.bias"))
        out[f"{head}_out"] = t2f_conv2d(
            s[f"bbox_head.{head}_head.2.weight"],
            s.get(f"bbox_head.{head}_head.2.bias"))
    return {"params": out}


def convert_simplebaseline(s: Dict[str, np.ndarray]) -> Dict:
    """mmpose SimpleBaseline (ResNet + TopdownHeatmapSimpleHead) →
    models/resnet.SimpleBaselineParity.

    Published layout: ``backbone.*`` torchvision ResNet;
    ``keypoint_head.deconv_layers.{0,3,6}`` bias-free ConvTranspose2d with
    BatchNorm at ``{1,4,7}`` (folded into the flax deconv bias);
    ``keypoint_head.final_layer`` 1×1 conv. This is the checkpoint family
    of mmpose's hand/face/body ResNet models (res50_onehand10k, res50_wflw,
    res50_coco — the hand/face heads the reference serves, reference
    wrappers/hand_estimation.py:10-77)."""
    out: Dict = {"backbone": convert_resnet(s, "backbone.")}
    for i in range(3):
        out[f"deconv{i}"] = _deconv_with_bn(
            s, f"keypoint_head.deconv_layers.{3 * i}",
            f"keypoint_head.deconv_layers.{3 * i + 1}")
    out["final_layer"] = t2f_conv2d(
        s["keypoint_head.final_layer.weight"],
        s.get("keypoint_head.final_layer.bias"))
    return {"params": out}


def convert_spin(s: Dict[str, np.ndarray]) -> Dict:
    """SPIN/VIBE HMR regressor (resnet50 trunk + fc1/fc2/decpose/decshape/
    deccam iterative head + init buffers) → models/resnet.SPINRegressorParity.

    Accepts both the bare SPIN ``hmr`` layout (``conv1.weight`` …) and
    VIBE's ``regressor.``-prefixed variant. Reference consumers:
    wrappers/vibe.py:11-74 (SPIN features), wrappers/pare.py, prohmr."""
    if any(k.startswith("regressor.") for k in s):
        s = {k[len("regressor."):]: v for k, v in s.items()
             if k.startswith("regressor.")}
    out: Dict = {"backbone": convert_resnet(s, "")}
    for name in ("fc1", "fc2", "decpose", "decshape", "deccam"):
        out[name] = t2f_linear(s[f"{name}.weight"], s.get(f"{name}.bias"))
    for buf in ("init_pose", "init_shape", "init_cam"):
        if buf in s:
            out[buf] = np.asarray(s[buf]).reshape(1, -1)
    return {"params": out}


def t2f_conv_transpose2d(weight, bias=None):
    """torch ConvTranspose2d (I, O, kh, kw) → flax ConvTranspose with
    ``transpose_kernel=True`` (kernel layout (kh, kw, O, I) — the
    DeconvHead ``norm="torch"`` checkpoint-parity form)."""
    p = {"kernel": np.transpose(np.asarray(weight), (2, 3, 1, 0))}
    if bias is not None:
        p["bias"] = np.asarray(bias)
    return p


def _deconv_with_bn(torch_state, deconv: str, bn: str) -> Dict:
    """ConvTranspose2d + BatchNorm2d → one biased flax ConvTranspose.

    The transpose_kernel layout is (kh, kw, O, I): the BN scale applies to
    output channels, axis 2."""
    w = np.transpose(np.asarray(torch_state[f"{deconv}.weight"]), (2, 3, 1, 0))
    eps = 1e-5
    scale = (np.asarray(torch_state[f"{bn}.weight"]) /
             np.sqrt(np.asarray(torch_state[f"{bn}.running_var"]) + eps))
    kernel = w * scale[None, None, :, None]
    b = np.asarray(torch_state.get(f"{deconv}.bias", 0.0))
    bias = (b - np.asarray(torch_state[f"{bn}.running_mean"])) * scale \
        + np.asarray(torch_state[f"{bn}.bias"])
    return {"kernel": kernel, "bias": bias}


def convert_vitpose(torch_state: Dict[str, np.ndarray], num_heads: int = 12) -> Dict:
    """Map a full ViTPose state dict (mmpose layout: ``backbone.*`` timm ViT +
    ``keypoint_head.*`` simple-baselines deconv head) onto TopDownNet with
    ``head_norm="torch"`` (reference model family: wrappers/mmpose.py:26-44).

    Handles the cls-token slot: if pos_embed has one more token than the
    patch grid uses, the first token's embedding is dropped.
    """
    s = torch_state
    g = lambda k: np.asarray(s[k])
    vit: Dict = {
        "PatchEmbed_0": {"Conv_0": t2f_conv2d(g("backbone.patch_embed.proj.weight"),
                                              s.get("backbone.patch_embed.proj.bias"))},
    }
    blocks = sorted({k.split(".")[2] for k in s if k.startswith("backbone.blocks.")},
                    key=int)
    for i, b in enumerate(blocks):
        vit[f"TransformerBlock_{i}"] = convert_vit_block(
            {k[len("backbone."):]: v for k, v in s.items()
             if k.startswith(f"backbone.blocks.{b}.")},
            f"blocks.{b}", num_heads)
    ln = "backbone.last_norm" if "backbone.last_norm.weight" in s else "backbone.norm"
    vit["LayerNorm_0"] = t2f_layernorm(g(f"{ln}.weight"), g(f"{ln}.bias"))
    pos = g("backbone.pos_embed")
    vit["pos_embed"] = pos  # cls-token slot trimmed at load vs model shape
    head: Dict = {}
    deconv_ids = sorted({int(k.split(".")[2]) for k in s
                         if k.startswith("keypoint_head.deconv_layers.")
                         and k.endswith(".weight")
                         and "running" not in k
                         and s[k].ndim == 4})
    for j, d in enumerate(deconv_ids):
        head[f"ConvTranspose_{j}"] = _deconv_with_bn(
            s, f"keypoint_head.deconv_layers.{d}",
            f"keypoint_head.deconv_layers.{d + 1}")
    head["Conv_0"] = t2f_conv2d(g("keypoint_head.final_layer.weight"),
                                s.get("keypoint_head.final_layer.bias"))
    return {"params": {"ViT_0": vit, "DeconvHead_0": head}}


def trim_pos_embed(pos: np.ndarray, num_patches: int) -> np.ndarray:
    """Drop the cls-token slot when present (ViTPose keeps it in pos_embed)."""
    if pos.shape[1] == num_patches + 1:
        return pos[:, 1:]
    return pos[:, :num_patches]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help="torch checkpoint (.pth)")
    ap.add_argument("--arch", required=True,
                    choices=["vitpose", "videopose3d", "hrnet", "centernet",
                             "spin", "simplebaseline", "posec3d",
                             "higherhrnet"])
    ap.add_argument("--out", required=True, help="output .npz")
    args = ap.parse_args()

    import torch

    state = torch.load(args.src, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    state = {k: v.numpy() for k, v in state.items()}

    if args.arch == "videopose3d":
        params = convert_videopose3d(state)
    elif args.arch == "hrnet":
        params = convert_hrnet(state)
    elif args.arch == "centernet":
        params = convert_centernet(state)
    elif args.arch == "spin":
        params = convert_spin(state)
    elif args.arch == "simplebaseline":
        params = convert_simplebaseline(state)
    elif args.arch == "posec3d":
        params = convert_posec3d(state)
    elif args.arch == "higherhrnet":
        params = convert_higherhrnet(state)
    elif any(k.startswith("backbone.") for k in state):
        params = convert_vitpose(state)
    else:
        num_heads = 12
        # numeric sort: lexical order would scramble block 10/11 vs 2 for
        # any arch deeper than 9 blocks
        blocks = sorted({k.split(".")[1] for k in state if k.startswith("blocks.")},
                        key=int)
        params = {f"TransformerBlock_{i}": convert_vit_block(state, f"blocks.{b}", num_heads)
                  for i, b in enumerate(blocks)}

    flat = {}

    def flatten(tree, prefix=""):
        for k, v in tree.items():
            if isinstance(v, dict):
                flatten(v, f"{prefix}{k}/")
            else:
                flat[f"{prefix}{k}"] = v

    flatten(params)
    np.savez(args.out, **flat)
    print(f"wrote {len(flat)} arrays to {args.out}")


if __name__ == "__main__":
    main()
