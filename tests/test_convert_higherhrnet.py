"""HigherHRNet AE bottom-up architecture + converter golden tests.

The reference's bottom-up checkpoints are mmpose HigherHRNet-W32 AE
(reference wrappers/mmpose.py:84-121). Same contract as tests/test_hrnet.py:

1. a torch oracle with mmpose's exact module naming (the shared THRNet
   backbone oracle + ``keypoint_head.final_layers.{0,1}`` /
   ``keypoint_head.deconv_layers.0`` AEHigherResolutionHead) is converted
   and must match the Flax net numerically (deconv-BN folding included);
2. the full W32 AE key set converts onto the Flax init tree exactly.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402
from torch import nn  # noqa: E402

import sys, os  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from convert_weights import convert_higherhrnet  # noqa: E402

from posepipeline_tpu.models.higherhrnet import HigherHRNetAE  # noqa: E402
from test_hrnet import THRNet, TBasicBlock, _randomize_bn  # noqa: E402


class TAEHead(nn.Module):
    """mmpose AEHigherResolutionHead (one deconv stage, tags on scale 0)."""

    def __init__(self, width, num_joints, num_basic_blocks=4):
        super().__init__()
        self.final_layers = nn.ModuleList([
            nn.Conv2d(width, 2 * num_joints, 1),
            nn.Conv2d(width, num_joints, 1),
        ])
        deconv = [nn.Sequential(
            nn.ConvTranspose2d(width + 2 * num_joints, width, 4, 2, 1,
                               bias=False),
            nn.BatchNorm2d(width),
            nn.ReLU(inplace=True))]
        deconv += [nn.Sequential(TBasicBlock(width))
                   for _ in range(num_basic_blocks)]
        self.deconv_layers = nn.ModuleList([nn.Sequential(*deconv)])

    def forward(self, f):
        out0 = self.final_layers[0](f)
        y = self.deconv_layers[0](torch.cat([f, out0], dim=1))
        return out0, self.final_layers[1](y)


class THigherHRNet(nn.Module):
    def __init__(self, width=32, num_joints=17, stage_modules=(1, 4, 3),
                 num_basic_blocks=4):
        super().__init__()
        self.backbone = THRNet(width, stage_modules)
        self.keypoint_head = TAEHead(width, num_joints, num_basic_blocks)

    def forward(self, x):
        return self.keypoint_head(self.backbone(x))


TINY = dict(width=8, num_joints=3, stage_modules=(1, 1, 1),
            num_basic_blocks=2)


def test_higherhrnet_forward_parity_small():
    torch.manual_seed(0)
    tm = THigherHRNet(**TINY).eval()
    _randomize_bn(tm, np.random.default_rng(1))
    state = {k: v.numpy() for k, v in tm.state_dict().items()}

    params = jax.tree_util.tree_map(jnp.asarray, convert_higherhrnet(state))
    net = HigherHRNetAE(num_joints=TINY["num_joints"], width=TINY["width"],
                        num_basic_blocks=TINY["num_basic_blocks"],
                        stage_modules=TINY["stage_modules"])
    x = np.random.default_rng(2).normal(0, 1, (2, 64, 64, 3)) \
        .astype(np.float32)
    with torch.no_grad():
        r0, r1 = tm(torch.tensor(np.transpose(x, (0, 3, 1, 2))))
    r0 = np.transpose(r0.numpy(), (0, 2, 3, 1))
    r1 = np.transpose(r1.numpy(), (0, 2, 3, 1))
    o0, o1 = net.apply(params, jnp.asarray(x))
    tol0 = 0.05 * np.abs(r0).max() + 1e-3
    tol1 = 0.05 * np.abs(r1).max() + 1e-3
    np.testing.assert_allclose(np.asarray(o0), r0, atol=tol0)
    np.testing.assert_allclose(np.asarray(o1), r1, atol=tol1)


def test_higherhrnet_w32_full_layout():
    """The published higher_hrnet32 key set converts exactly onto the Flax
    init tree: same paths, same shapes."""
    torch.manual_seed(0)
    tm = THigherHRNet(width=32, num_joints=17).eval()
    state = {k: v.numpy() for k, v in tm.state_dict().items()}
    # spot-check the real layout families this converter claims to read
    assert "keypoint_head.deconv_layers.0.0.0.weight" in state
    assert "keypoint_head.deconv_layers.0.1.0.conv1.weight" in state
    assert "keypoint_head.final_layers.1.bias" in state
    assert state["keypoint_head.deconv_layers.0.0.0.weight"].shape \
        == (32 + 34, 32, 4, 4)

    params = convert_higherhrnet(state)
    net = HigherHRNetAE(num_joints=17, width=32)
    init = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))

    flat_c = jax.tree_util.tree_leaves_with_path(params)
    flat_i = dict(jax.tree_util.tree_leaves_with_path(init))
    assert len(flat_c) == len(flat_i)
    for path, leaf in flat_c:
        assert path in flat_i, f"converted path {path} missing from init"
        assert flat_i[path].shape == np.asarray(leaf).shape, path
