"""CenterNet + SPIN checkpoint-parity conversion golden tests.

Same strategy as tests/test_hrnet.py: build torch modules with the
*published* state-dict layouts (mmdet CenterNet resnet18+CTResNetNeck+
CenterNetHead; SPIN hmr resnet50+iterative regressor), run
tools/convert_weights mappings, and check

1. numeric parity on a small-width twin (BN folded, eval mode),
2. the full-size key sets convert onto the Flax init trees with exact
   shapes — so a real downloaded checkpoint is a file drop.

Reference roles: detectors feed every tracker (reference
wrappers/deep_sort_yolov4, mmtrack.py:8-62, hand_bbox.py:8-61); SPIN-family
regressors are the SMPL wrappers' trunk (reference wrappers/vibe.py:11-74).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import os  # noqa: E402
import sys  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from convert_weights import (convert_centernet, convert_resnet,  # noqa: E402
                             convert_simplebaseline, convert_spin)

from posepipeline_tpu.models.resnet import (CenterNetParity,  # noqa: E402
                                            ResNet, SimpleBaselineParity,
                                            SPINRegressorParity)


# ---- torch twins with the published layouts -------------------------------

def _tbasic(cin, planes, stride=1):
    m = tnn.Module()
    m.conv1 = tnn.Conv2d(cin, planes, 3, stride, 1, bias=False)
    m.bn1 = tnn.BatchNorm2d(planes)
    m.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
    m.bn2 = tnn.BatchNorm2d(planes)
    if stride != 1 or cin != planes:
        m.downsample = tnn.Sequential(
            tnn.Conv2d(cin, planes, 1, stride, bias=False),
            tnn.BatchNorm2d(planes))
    def fwd(x, m=m):
        r = x
        y = torch.relu(m.bn1(m.conv1(x)))
        y = m.bn2(m.conv2(y))
        if hasattr(m, "downsample"):
            r = m.downsample(x)
        return torch.relu(y + r)
    m.fwd = fwd
    return m


class TResNet18ish(tnn.Module):
    """torchvision-layout resnet with BasicBlocks, width-scaled."""

    def __init__(self, width=8):
        super().__init__()
        w = width
        self.conv1 = tnn.Conv2d(3, w, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(w)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        chans = [w, 2 * w, 4 * w, 8 * w]
        cin = w
        for li, ch in enumerate(chans, start=1):
            blocks = tnn.ModuleList()
            for n in range(2):
                stride = 2 if (n == 0 and li > 1) else 1
                blocks.append(_tbasic(cin, ch, stride))
                cin = ch
            setattr(self, f"layer{li}", blocks)

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        for li in range(1, 5):
            for blk in getattr(self, f"layer{li}"):
                x = blk.fwd(x)
        return x


def _randomize_bn(module):
    for m in module.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.uniform_(-0.3, 0.3)
            m.running_var.uniform_(0.6, 1.6)
            m.weight.data.uniform_(0.7, 1.3)
            m.bias.data.uniform_(-0.2, 0.2)


def test_resnet_trunk_numeric_parity():
    """Small-width resnet: converted flax trunk matches torch eval fwd."""
    torch.manual_seed(0)
    m = TResNet18ish(width=8).eval()
    _randomize_bn(m)
    state = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    params = {"params": convert_resnet(state, "")}

    # flax twin: width-8 basicblock trunk (ResNet hardcodes 64-base widths;
    # the full-width key-set test below covers the real module)
    from flax import linen as nn

    from posepipeline_tpu.models import resnet as R

    class FlaxTiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            w = 8
            x = nn.Conv(w, (7, 7), (2, 2), padding=[(3, 3)] * 2,
                        use_bias=True, name="conv1")(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (3, 3), (2, 2), padding=[(1, 1)] * 2)
            chans = [w, 2 * w, 4 * w, 8 * w]
            for li, ch in enumerate(chans, start=1):
                for n in range(2):
                    stride = 2 if (n == 0 and li > 1) else 1
                    down = n == 0 and (stride != 1 or x.shape[-1] != ch)
                    x = R.BasicBlock(ch, stride, down, dtype=jnp.float32,
                                     name=f"layer{li}_{n}")(x)
            return x

    x = np.random.default_rng(0).normal(0, 1, (1, 64, 48, 3)).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    out = FlaxTiny().apply(jax.device_put(params), jnp.asarray(x))
    out = np.transpose(np.asarray(out), (0, 3, 1, 2))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=1e-3)


def _centernet_state(width=64, num_classes=1):
    """Full-layout mmdet CenterNet key set (resnet18 + CTResNetNeck +
    CenterNetHead), synthetic values."""
    m = TResNet18ish(width=width)
    state = {f"backbone.{k}": v.detach().numpy()
             for k, v in m.state_dict().items()}
    rng = np.random.default_rng(1)
    cin = width * 8
    for i, ch in enumerate((256, 128, 64)):
        state[f"neck.deconv_layers.{3 * i}.conv.weight"] = \
            rng.normal(0, .02, (ch, cin, 3, 3)).astype(np.float32)
        for stat, val in (("weight", np.ones(ch)), ("bias", np.zeros(ch)),
                          ("running_mean", np.zeros(ch)),
                          ("running_var", np.ones(ch))):
            state[f"neck.deconv_layers.{3 * i}.bn.{stat}"] = \
                val.astype(np.float32)
        state[f"neck.deconv_layers.{3 * i + 1}.weight"] = \
            rng.normal(0, .02, (ch, ch, 4, 4)).astype(np.float32)
        for stat, val in (("weight", np.ones(ch)), ("bias", np.zeros(ch)),
                          ("running_mean", np.zeros(ch)),
                          ("running_var", np.ones(ch))):
            state[f"neck.deconv_layers.{3 * i + 2}.{stat}"] = \
                val.astype(np.float32)
        cin = ch
    for head, out_ch in (("heatmap", num_classes), ("wh", 2), ("offset", 2)):
        state[f"bbox_head.{head}_head.0.weight"] = \
            rng.normal(0, .02, (64, 64, 3, 3)).astype(np.float32)
        state[f"bbox_head.{head}_head.0.bias"] = np.zeros(64, np.float32)
        state[f"bbox_head.{head}_head.2.weight"] = \
            rng.normal(0, .02, (out_ch, 64, 1, 1)).astype(np.float32)
        state[f"bbox_head.{head}_head.2.bias"] = np.zeros(out_ch, np.float32)
    return state


def test_centernet_full_key_set_converts_exactly():
    """The published mmdet CenterNet layout (real resnet18 widths) converts
    onto CenterNetParity's init tree with exact shapes — a downloaded
    checkpoint is a file drop."""
    state = _centernet_state(width=64)
    params = convert_centernet(state)
    net = CenterNetParity(num_classes=1)
    init = jax.eval_shape(
        lambda: net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 128, 96, 3), jnp.float32)))
    flat_conv = {jax.tree_util.keystr(p): np.asarray(v).shape
                 for p, v in jax.tree_util.tree_flatten_with_path(params)[0]}
    flat_init = {jax.tree_util.keystr(p): v.shape
                 for p, v in jax.tree_util.tree_flatten_with_path(init)[0]}
    assert set(flat_conv) == set(flat_init), (
        sorted(set(flat_conv) ^ set(flat_init))[:8])
    for k in flat_init:
        assert tuple(flat_conv[k]) == tuple(flat_init[k]), (
            f"{k}: converted {flat_conv[k]} vs model {flat_init[k]}")
    # converted net runs and emits the decode contract
    out = CenterNetParity(num_classes=1).apply(
        jax.device_put(params), jnp.zeros((1, 128, 96, 3), jnp.float32))
    center, wh, offset = out
    assert center.shape == (1, 32, 24, 1)
    assert wh.shape == (1, 32, 24, 2) and offset.shape == (1, 32, 24, 2)


def test_spin_full_key_set_converts_exactly():
    """SPIN hmr layout (resnet50 + fc1/fc2/dec* + init buffers) converts
    onto SPINRegressorParity with exact shapes."""
    rng = np.random.default_rng(2)
    state = {}
    # resnet50 trunk (bottleneck): conv1/bn1 + layer{1-4} with [3,4,6,3]
    def bn(prefix, ch):
        state[f"{prefix}.weight"] = np.ones(ch, np.float32)
        state[f"{prefix}.bias"] = np.zeros(ch, np.float32)
        state[f"{prefix}.running_mean"] = np.zeros(ch, np.float32)
        state[f"{prefix}.running_var"] = np.ones(ch, np.float32)

    state["conv1.weight"] = rng.normal(0, .02, (64, 3, 7, 7)).astype(np.float32)
    bn("bn1", 64)
    cin = 64
    for li, (blocks, planes) in enumerate(
            zip((3, 4, 6, 3), (64, 128, 256, 512)), start=1):
        for n in range(blocks):
            bp = f"layer{li}.{n}"
            state[f"{bp}.conv1.weight"] = rng.normal(
                0, .02, (planes, cin, 1, 1)).astype(np.float32)
            bn(f"{bp}.bn1", planes)
            state[f"{bp}.conv2.weight"] = rng.normal(
                0, .02, (planes, planes, 3, 3)).astype(np.float32)
            bn(f"{bp}.bn2", planes)
            state[f"{bp}.conv3.weight"] = rng.normal(
                0, .02, (planes * 4, planes, 1, 1)).astype(np.float32)
            bn(f"{bp}.bn3", planes * 4)
            if n == 0:
                stride_cin = cin
                state[f"{bp}.downsample.0.weight"] = rng.normal(
                    0, .02, (planes * 4, stride_cin, 1, 1)).astype(np.float32)
                bn(f"{bp}.downsample.1", planes * 4)
            cin = planes * 4
    state["fc1.weight"] = rng.normal(0, .02, (1024, 2048 + 144 + 13)).astype(np.float32)
    state["fc1.bias"] = np.zeros(1024, np.float32)
    state["fc2.weight"] = rng.normal(0, .02, (1024, 1024)).astype(np.float32)
    state["fc2.bias"] = np.zeros(1024, np.float32)
    for name, o in (("decpose", 144), ("decshape", 10), ("deccam", 3)):
        state[f"{name}.weight"] = rng.normal(0, .02, (o, 1024)).astype(np.float32)
        state[f"{name}.bias"] = np.zeros(o, np.float32)
    state["init_pose"] = np.zeros((1, 144), np.float32)
    state["init_shape"] = np.zeros((1, 10), np.float32)
    state["init_cam"] = np.zeros((1, 3), np.float32)

    params = convert_spin(state)
    net = SPINRegressorParity()
    init = jax.eval_shape(
        lambda: net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 224, 224, 3), jnp.float32)))
    flat_conv = {jax.tree_util.keystr(p): np.asarray(v).shape
                 for p, v in jax.tree_util.tree_flatten_with_path(params)[0]}
    flat_init = {jax.tree_util.keystr(p): v.shape
                 for p, v in jax.tree_util.tree_flatten_with_path(init)[0]}
    assert set(flat_conv) == set(flat_init), (
        sorted(set(flat_conv) ^ set(flat_init))[:8])
    for k in flat_init:
        assert tuple(flat_conv[k]) == tuple(flat_init[k]), (
            f"{k}: converted {flat_conv[k]} vs model {flat_init[k]}")


def _resnet50_state(state, prefix="backbone."):
    """Fill ``state`` with a full torchvision resnet50 key set."""
    rng = np.random.default_rng(3)

    def bn(p, ch):
        state[f"{p}.weight"] = np.ones(ch, np.float32)
        state[f"{p}.bias"] = np.zeros(ch, np.float32)
        state[f"{p}.running_mean"] = np.zeros(ch, np.float32)
        state[f"{p}.running_var"] = np.ones(ch, np.float32)

    state[f"{prefix}conv1.weight"] = rng.normal(
        0, .02, (64, 3, 7, 7)).astype(np.float32)
    bn(f"{prefix}bn1", 64)
    cin = 64
    for li, (blocks, planes) in enumerate(
            zip((3, 4, 6, 3), (64, 128, 256, 512)), start=1):
        for n in range(blocks):
            bp = f"{prefix}layer{li}.{n}"
            state[f"{bp}.conv1.weight"] = rng.normal(
                0, .02, (planes, cin, 1, 1)).astype(np.float32)
            bn(f"{bp}.bn1", planes)
            state[f"{bp}.conv2.weight"] = rng.normal(
                0, .02, (planes, planes, 3, 3)).astype(np.float32)
            bn(f"{bp}.bn2", planes)
            state[f"{bp}.conv3.weight"] = rng.normal(
                0, .02, (planes * 4, planes, 1, 1)).astype(np.float32)
            bn(f"{bp}.bn3", planes * 4)
            if n == 0:
                state[f"{bp}.downsample.0.weight"] = rng.normal(
                    0, .02, (planes * 4, cin, 1, 1)).astype(np.float32)
                bn(f"{bp}.downsample.1", planes * 4)
            cin = planes * 4
    return state


def test_simplebaseline_full_key_set_converts_exactly():
    """The published mmpose SimpleBaseline layout (resnet50 backbone +
    TopdownHeatmapSimpleHead deconv_layers/final_layer — the hand/face/body
    checkpoint family, e.g. res50_onehand10k) converts onto
    SimpleBaselineParity with exact shapes."""
    rng = np.random.default_rng(4)
    state = _resnet50_state({})
    cin = 2048
    for i in range(3):
        state[f"keypoint_head.deconv_layers.{3 * i}.weight"] = rng.normal(
            0, .02, (cin, 256, 4, 4)).astype(np.float32)
        for stat, val in (("weight", np.ones(256)), ("bias", np.zeros(256)),
                          ("running_mean", np.zeros(256)),
                          ("running_var", np.ones(256))):
            state[f"keypoint_head.deconv_layers.{3 * i + 1}.{stat}"] = \
                val.astype(np.float32)
        cin = 256
    state["keypoint_head.final_layer.weight"] = rng.normal(
        0, .02, (21, 256, 1, 1)).astype(np.float32)
    state["keypoint_head.final_layer.bias"] = np.zeros(21, np.float32)

    params = convert_simplebaseline(state)
    net = SimpleBaselineParity(num_joints=21)
    init = jax.eval_shape(
        lambda: net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 256, 256, 3), jnp.float32)))
    flat_conv = {jax.tree_util.keystr(p): np.asarray(v).shape
                 for p, v in jax.tree_util.tree_flatten_with_path(params)[0]}
    flat_init = {jax.tree_util.keystr(p): v.shape
                 for p, v in jax.tree_util.tree_flatten_with_path(init)[0]}
    assert set(flat_conv) == set(flat_init), (
        sorted(set(flat_conv) ^ set(flat_init))[:8])
    for k in flat_init:
        assert tuple(flat_conv[k]) == tuple(flat_init[k]), (
            f"{k}: converted {flat_conv[k]} vs model {flat_init[k]}")
    # converted net runs and emits stride-4 heatmaps
    out = net.apply(jax.device_put(params),
                    jnp.zeros((1, 64, 64, 3), jnp.float32))
    assert out.shape == (1, 16, 16, 21)
