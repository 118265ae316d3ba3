"""Weight-conversion mapping tests: torch layers ↔ flax layers must agree."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
from flax import linen as nn

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from convert_weights import (  # noqa: E402
    fold_batchnorm_into_conv, t2f_conv1d, t2f_conv2d, t2f_linear, t2f_mha,
)


def test_linear_conversion():
    tl = torch.nn.Linear(8, 5)
    x = np.random.default_rng(0).normal(0, 1, (3, 8)).astype(np.float32)
    want = tl(torch.tensor(x)).detach().numpy()
    params = {"params": t2f_linear(tl.weight.detach().numpy(), tl.bias.detach().numpy())}
    got = nn.Dense(5).apply(jax.tree.map(jnp.asarray, params), x)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_conv2d_conversion():
    tc = torch.nn.Conv2d(3, 6, 3, padding=1)
    x = np.random.default_rng(1).normal(0, 1, (2, 3, 8, 8)).astype(np.float32)
    want = tc(torch.tensor(x)).detach().numpy().transpose(0, 2, 3, 1)  # NHWC
    params = {"params": t2f_conv2d(tc.weight.detach().numpy(), tc.bias.detach().numpy())}
    got = nn.Conv(6, (3, 3), padding="SAME").apply(
        jax.tree.map(jnp.asarray, params), x.transpose(0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_conv1d_conversion():
    tc = torch.nn.Conv1d(4, 7, 3, padding=1)
    x = np.random.default_rng(2).normal(0, 1, (2, 4, 10)).astype(np.float32)
    want = tc(torch.tensor(x)).detach().numpy().transpose(0, 2, 1)  # NWC
    params = {"params": t2f_conv1d(tc.weight.detach().numpy(), tc.bias.detach().numpy())}
    got = nn.Conv(7, (3,), padding="SAME").apply(
        jax.tree.map(jnp.asarray, params), x.transpose(0, 2, 1))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_batchnorm_folding():
    conv = torch.nn.Conv2d(3, 4, 3, padding=1)
    bn = torch.nn.BatchNorm2d(4)
    bn.eval()
    with torch.no_grad():
        bn.running_mean.copy_(torch.tensor([0.1, -0.2, 0.3, 0.0]))
        bn.running_var.copy_(torch.tensor([1.5, 0.5, 2.0, 1.0]))
        bn.weight.copy_(torch.tensor([1.1, 0.9, 1.0, 1.2]))
        bn.bias.copy_(torch.tensor([0.0, 0.1, -0.1, 0.2]))
    x = np.random.default_rng(3).normal(0, 1, (2, 3, 6, 6)).astype(np.float32)
    with torch.no_grad():
        want = bn(conv(torch.tensor(x))).numpy().transpose(0, 2, 3, 1)

    fk = np.transpose(conv.weight.detach().numpy(), (2, 3, 1, 0))
    kernel, bias = fold_batchnorm_into_conv(
        fk, conv.bias.detach().numpy(),
        bn.weight.detach().numpy(), bn.bias.detach().numpy(),
        bn.running_mean.numpy(), bn.running_var.numpy())
    got = nn.Conv(4, (3, 3), padding="SAME").apply(
        {"params": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(bias)}},
        x.transpose(0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_mha_conversion():
    D, H = 16, 4
    mha = torch.nn.MultiheadAttention(D, H, batch_first=True)
    mha.eval()
    x = np.random.default_rng(4).normal(0, 1, (2, 5, D)).astype(np.float32)
    with torch.no_grad():
        want, _ = mha(torch.tensor(x), torch.tensor(x), torch.tensor(x))
    want = want.detach().numpy()

    w = mha.in_proj_weight.detach().numpy()
    b = mha.in_proj_bias.detach().numpy()
    params = t2f_mha(w[:D], b[:D], w[D:2 * D], b[D:2 * D], w[2 * D:], b[2 * D:],
                     mha.out_proj.weight.detach().numpy(),
                     mha.out_proj.bias.detach().numpy(), H)
    got = nn.MultiHeadDotProductAttention(num_heads=H).apply(
        {"params": jax.tree.map(jnp.asarray, params)}, x, x)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)
