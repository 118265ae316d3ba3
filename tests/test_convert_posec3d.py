"""PoseC3D (SlowOnly ResNet3d) architecture + converter golden tests.

The reference's skeleton-action checkpoints are mmaction2 PoseC3D
(reference wrappers/mmaction.py:9-86). Same contract as tests/test_hrnet.py
pins for HRNet-W48:

1. a torch oracle built with mmaction2's exact module naming
   (``backbone.layer2.3.conv2.conv.weight`` — every mmcv ConvModule is
   ``.conv`` + ``.bn``; ``cls_head.fc_cls``) is converted and must match
   the Flax net's forward output numerically (BN folding included);
2. the full skeleton-SlowOnly-R50 key set (stage_blocks (4, 6, 3),
   base_channels 32, in_channels 17, inflate (0, 1, 1)) must convert onto
   the Flax init tree exactly — no shape drift, no dropped keys.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402
from torch import nn  # noqa: E402

import sys, os  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from convert_weights import convert_posec3d  # noqa: E402

from posepipeline_tpu.models.posec3d import (PoseC3DConfig,  # noqa: E402
                                             PoseC3DNet)


# ---------------------------------------------------------------------------
# torch oracle with mmaction2-compatible module naming
# ---------------------------------------------------------------------------

class TConvModule(nn.Module):
    """mmcv ConvModule: ``.conv`` + ``.bn`` (+ ReLU applied by callers)."""

    def __init__(self, cin, cout, kernel, stride=(1, 1, 1)):
        super().__init__()
        pad = tuple(k // 2 for k in kernel)
        self.conv = nn.Conv3d(cin, cout, kernel, stride, pad, bias=False)
        self.bn = nn.BatchNorm3d(cout)

    def forward(self, x):
        return self.bn(self.conv(x))


class TBottleneck3d(nn.Module):
    """mmaction2 Bottleneck3d, inflate_style='3x1x1'."""

    def __init__(self, cin, planes, spatial_stride=1, temporal_stride=1,
                 inflate=True, downsample=False):
        super().__init__()
        st = (temporal_stride, spatial_stride, spatial_stride)
        kt = 3 if inflate else 1
        self.conv1 = TConvModule(cin, planes, (kt, 1, 1))
        self.conv2 = TConvModule(planes, planes, (1, 3, 3), st)
        self.conv3 = TConvModule(planes, planes * 4, (1, 1, 1))
        self.downsample = (TConvModule(cin, planes * 4, (1, 1, 1), st)
                           if downsample else None)
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.conv1(x))
        y = self.relu(self.conv2(y))
        return self.relu(self.conv3(y) + r)


class TSlowOnly(nn.Module):
    def __init__(self, cfg: PoseC3DConfig):
        super().__init__()
        self.conv1 = TConvModule(cfg.in_channels, cfg.base_channels,
                                 (1, 7, 7))
        planes, cin = cfg.base_channels, cfg.base_channels
        for s, (blocks, ss, ts, inf) in enumerate(zip(
                cfg.stage_blocks, cfg.spatial_strides,
                cfg.temporal_strides, cfg.inflate)):
            stage = nn.Sequential(*[
                TBottleneck3d(cin if b == 0 else planes * 4, planes,
                              spatial_stride=ss if b == 0 else 1,
                              temporal_stride=ts if b == 0 else 1,
                              inflate=bool(inf), downsample=(b == 0))
                for b in range(blocks)])
            setattr(self, f"layer{s + 1}", stage)
            cin = planes * 4
            planes *= 2
        self.relu = nn.ReLU(inplace=True)
        self.n_stages = len(cfg.stage_blocks)

    def forward(self, x):
        x = self.relu(self.conv1(x))
        for s in range(self.n_stages):
            x = getattr(self, f"layer{s + 1}")(x)
        return x


class TI3DHead(nn.Module):
    def __init__(self, cin, num_classes):
        super().__init__()
        self.fc_cls = nn.Linear(cin, num_classes)

    def forward(self, x):  # (B, C, T, H, W)
        return self.fc_cls(x.mean(dim=(2, 3, 4)))


class TPoseC3D(nn.Module):
    def __init__(self, cfg: PoseC3DConfig):
        super().__init__()
        self.backbone = TSlowOnly(cfg)
        c_out = cfg.base_channels * (2 ** (len(cfg.stage_blocks) - 1)) * 4
        self.cls_head = TI3DHead(c_out, cfg.num_classes)

    def forward(self, x):
        return self.cls_head(self.backbone(x))


def _randomize_bn(model, rng):
    """Non-trivial BN stats so folding is actually exercised."""
    for m in model.modules():
        if isinstance(m, (nn.BatchNorm2d, nn.BatchNorm3d)):
            m.weight.data = torch.tensor(
                rng.uniform(0.5, 1.5, m.weight.shape).astype(np.float32))
            m.bias.data = torch.tensor(
                rng.normal(0, 0.2, m.bias.shape).astype(np.float32))
            m.running_mean.data = torch.tensor(
                rng.normal(0, 0.2, m.running_mean.shape).astype(np.float32))
            m.running_var.data = torch.tensor(
                rng.uniform(0.5, 1.5, m.running_var.shape).astype(np.float32))


TINY = PoseC3DConfig(num_classes=5, in_channels=4, base_channels=8,
                     stage_blocks=(1, 1), spatial_strides=(2, 2),
                     temporal_strides=(1, 2), inflate=(0, 1))


def test_posec3d_forward_parity_small():
    torch.manual_seed(0)
    tm = TPoseC3D(TINY).eval()
    _randomize_bn(tm, np.random.default_rng(1))
    state = {k: v.numpy() for k, v in tm.state_dict().items()}

    params = jax.tree_util.tree_map(jnp.asarray, convert_posec3d(state))
    net = PoseC3DNet(TINY)
    x = np.random.default_rng(2).normal(
        0, 1, (2, 8, 16, 16, TINY.in_channels)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(np.transpose(x, (0, 4, 1, 2, 3)))).numpy()
    out = np.asarray(net.apply(params, jnp.asarray(x)))
    # bf16 conv trunk: compare with a tolerance scaled to logit magnitude
    np.testing.assert_allclose(out, ref, atol=0.05 * np.abs(ref).max() + 1e-3)


def test_posec3d_skeleton_r50_full_layout():
    """The published skeleton-SlowOnly-R50 key set converts exactly onto the
    Flax init tree: same paths, same shapes, nothing dropped."""
    cfg = PoseC3DConfig(num_classes=60)
    torch.manual_seed(0)
    tm = TPoseC3D(cfg).eval()
    state = {k: v.numpy() for k, v in tm.state_dict().items()}
    # the real checkpoint carries these exact families and nothing else
    families = {tuple(k.split(".")[:2]) for k in state}
    assert ("backbone", "conv1") in families
    assert ("cls_head", "fc_cls") in families
    assert ("backbone", "layer3") in families

    params = convert_posec3d(state)
    net = PoseC3DNet(cfg)
    init = net.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, 8, 56, 56, cfg.in_channels)))

    flat_c = jax.tree_util.tree_leaves_with_path(params)
    flat_i = dict(jax.tree_util.tree_leaves_with_path(init))
    assert len(flat_c) == len(flat_i)
    for path, leaf in flat_c:
        assert path in flat_i, f"converted path {path} missing from init"
        assert flat_i[path].shape == np.asarray(leaf).shape, path
    # every BN/conv torch key is consumed by construction: count them
    n_convmodules = sum(1 for k in state if k.endswith(".conv.weight"))
    n_flax_convs = sum(1 for p, _ in flat_c
                       if p[-1].key == "kernel" and "fc_cls" not in str(p))
    assert n_convmodules == n_flax_convs
