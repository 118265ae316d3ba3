"""Model-level weight-conversion round-trip tests.

Round 1 converted per-layer only; the ADVICE bugs (lexical block ordering,
dropped shrink conv) were exactly the class of error per-layer tests miss.
These tests build real torch modules (torch is CPU-only in this image),
export their state dicts, run tools/convert_weights.py mappings, load the
result into the Flax models, and require numeric agreement with the torch
forward pass.

Reference models being mirrored: ViTPose-style top-down nets
(reference wrappers/mmpose.py:26-44) and VideoPose3D temporal convs
(reference wrappers/videopose3d.py:40-57).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax

from tools.convert_weights import (convert_videopose3d, convert_vitpose,
                                   trim_pos_embed)


@pytest.fixture(autouse=True)
def _high_precision():
    """Exact-parity comparisons need full-precision XLA matmuls/convs."""
    old = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    yield
    jax.config.update("jax_default_matmul_precision", old)


# ---------------------------------------------------------------------------
# VideoPose3D-family temporal conv lifter
# ---------------------------------------------------------------------------


class TorchTemporalModel(torch.nn.Module):
    """VideoPose3D TemporalModel layout (expand_conv/layers_conv/layers_bn/
    shrink naming), with per-layer 'same' zero padding so edge semantics
    match the TPU net's convention (interior frames are identical to the
    reference's pad-once ChunkedGenerator form either way)."""

    def __init__(self, in_features, channels, out_features, filter_widths):
        super().__init__()
        self.expand_conv = torch.nn.Conv1d(in_features, channels,
                                           filter_widths[0], bias=False,
                                           padding="same")
        self.expand_bn = torch.nn.BatchNorm1d(channels)
        convs, bns = [], []
        dilation = filter_widths[0]
        for w in filter_widths[1:]:
            convs.append(torch.nn.Conv1d(channels, channels, w, bias=False,
                                         dilation=dilation, padding="same"))
            bns.append(torch.nn.BatchNorm1d(channels))
            convs.append(torch.nn.Conv1d(channels, channels, 1, bias=False))
            bns.append(torch.nn.BatchNorm1d(channels))
            dilation *= w
        self.layers_conv = torch.nn.ModuleList(convs)
        self.layers_bn = torch.nn.ModuleList(bns)
        self.shrink = torch.nn.Conv1d(channels, out_features, 1)

    def forward(self, x):  # x: (B, T, F)
        x = x.transpose(1, 2)
        x = torch.relu(self.expand_bn(self.expand_conv(x)))
        for i in range(0, len(self.layers_conv), 2):
            res = x
            y = torch.relu(self.layers_bn[i](self.layers_conv[i](x)))
            y = torch.relu(self.layers_bn[i + 1](self.layers_conv[i + 1](y)))
            x = res + y
        return self.shrink(x).transpose(1, 2)


def _randomize_bn(m):
    """Non-trivial BN statistics so folding is actually exercised."""
    for mod in m.modules():
        if isinstance(mod, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            with torch.no_grad():
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 2.0)
                mod.weight.uniform_(0.5, 1.5)
                mod.bias.uniform_(-0.3, 0.3)


def test_videopose3d_model_roundtrip():
    from posepipeline_tpu.models.lifting import LifterConfig, TemporalLifter
    import jax.numpy as jnp

    torch.manual_seed(0)
    J = 17
    tm = TorchTemporalModel(J * 2, 32, J * 3, (3, 3, 3)).eval()
    _randomize_bn(tm)
    state = {k: v.numpy() for k, v in tm.state_dict().items()}

    params = {"params": convert_videopose3d(state)}
    cfg = LifterConfig("rt", (3, 3, 3), 32, norm="none")
    net = TemporalLifter(cfg, dtype=jnp.float32)

    T = cfg.receptive_field + 9
    x = np.random.RandomState(1).randn(2, T, J * 2).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy().reshape(2, T, J, 3)
    ours = np.asarray(net.apply(params, jnp.asarray(x)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# ViTPose-family top-down net (timm ViT backbone + simple-baselines head)
# ---------------------------------------------------------------------------


class TorchViTBlock(torch.nn.Module):
    def __init__(self, dim, num_heads):
        super().__init__()
        self.norm1 = torch.nn.LayerNorm(dim)
        self.attn = torch.nn.Module()
        self.attn.qkv = torch.nn.Linear(dim, dim * 3)
        self.attn.proj = torch.nn.Linear(dim, dim)
        self.norm2 = torch.nn.LayerNorm(dim)
        self.mlp = torch.nn.Module()
        self.mlp.fc1 = torch.nn.Linear(dim, dim * 4)
        self.mlp.fc2 = torch.nn.Linear(dim * 4, dim)
        self.num_heads = num_heads

    def forward(self, x):
        B, N, D = x.shape
        h = self.num_heads
        y = self.norm1(x)
        qkv = self.attn.qkv(y).reshape(B, N, 3, h, D // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        att = torch.softmax(q @ k.transpose(-2, -1) / (D // h) ** 0.5, dim=-1)
        y = (att @ v).transpose(1, 2).reshape(B, N, D)
        x = x + self.attn.proj(y)
        y = self.norm2(x)
        y = self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(y)))
        return x + y


class TorchViTPose(torch.nn.Module):
    """Minimal mmpose-ViTPose layout: backbone.* + keypoint_head.*."""

    def __init__(self, dim=32, depth=2, num_heads=2, num_joints=5,
                 img_hw=(32, 32), patch=16):
        super().__init__()
        self.backbone = torch.nn.Module()
        self.backbone.patch_embed = torch.nn.Module()
        self.backbone.patch_embed.proj = torch.nn.Conv2d(3, dim, patch, patch)
        n = (img_hw[0] // patch) * (img_hw[1] // patch)
        self.backbone.pos_embed = torch.nn.Parameter(
            torch.randn(1, n + 1, dim) * 0.02)  # cls-token slot included
        self.backbone.blocks = torch.nn.ModuleList(
            [TorchViTBlock(dim, num_heads) for _ in range(depth)])
        self.backbone.last_norm = torch.nn.LayerNorm(dim)
        self.keypoint_head = torch.nn.Module()
        self.keypoint_head.deconv_layers = torch.nn.ModuleList([
            torch.nn.ConvTranspose2d(dim, 16, 4, 2, 1, bias=False),
            torch.nn.BatchNorm2d(16),
            torch.nn.ReLU(),
            torch.nn.ConvTranspose2d(16, 16, 4, 2, 1, bias=False),
            torch.nn.BatchNorm2d(16),
            torch.nn.ReLU(),
        ])
        self.keypoint_head.final_layer = torch.nn.Conv2d(16, num_joints, 1)
        self.grid = (img_hw[0] // patch, img_hw[1] // patch)

    def forward(self, x):  # (B, H, W, 3) float
        x = x.permute(0, 3, 1, 2)
        t = self.backbone.patch_embed.proj(x)
        B, D, gh, gw = t.shape
        t = t.flatten(2).transpose(1, 2)
        t = t + self.backbone.pos_embed[:, 1:]
        for blk in self.backbone.blocks:
            t = blk(t)
        t = self.backbone.last_norm(t)
        f = t.transpose(1, 2).reshape(B, D, gh, gw)
        for layer in self.keypoint_head.deconv_layers:
            f = layer(f)
        return self.keypoint_head.final_layer(f).permute(0, 2, 3, 1)


def test_vitpose_model_roundtrip():
    import jax.numpy as jnp

    from posepipeline_tpu.models.params_io import merge_params
    from posepipeline_tpu.models.topdown import TopDownConfig, TopDownNet

    torch.manual_seed(0)
    tm = TorchViTPose().eval()
    _randomize_bn(tm)
    state = {k: v.numpy() for k, v in tm.state_dict().items()}

    converted = convert_vitpose(state, num_heads=2)
    cfg = TopDownConfig("rt", num_joints=5, input_hw=(32, 32),
                        heatmap_hw=(8, 8), dim=32, depth=2, num_heads=2,
                        head_norm="torch", head_features=16)
    net = TopDownNet(cfg, dtype=jnp.float32)
    x = np.random.RandomState(2).rand(2, 32, 32, 3).astype(np.float32)
    init = net.init(jax.random.PRNGKey(0), jnp.asarray(x))
    converted["params"]["ViT_0"]["pos_embed"] = trim_pos_embed(
        converted["params"]["ViT_0"]["pos_embed"],
        init["params"]["ViT_0"]["pos_embed"].shape[1])
    # DeconvHead feature width differs from the default 256 in this tiny
    # config; the merge validates shapes, so resize via a matching module
    params = merge_params(jax.tree.map(np.asarray, init), converted)

    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    ours = np.asarray(net.apply(params, jnp.asarray(x)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)
