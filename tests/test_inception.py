"""InceptionV3 block plumbing vs torch.nn oracles (torchvision-free)."""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax.numpy as jnp

from vtp_tpu.metrics.inception import (
    _avgpool3,
    _conv_bn,
    _inception_a,
    _inception_e,
    convert_inception_state_dict,
    inception_features,
)


class BasicConv2d(tnn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = tnn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _rand_bn(m):
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.1)
                mod.running_var.uniform_(0.5, 1.5)
                mod.weight.normal_(1, 0.1)
                mod.bias.normal_(0, 0.1)
    m.eval()
    return m


def _params_of(mod: BasicConv2d):
    return {
        "w": jnp.asarray(mod.conv.weight.detach().numpy()),
        "gamma": jnp.asarray(mod.bn.weight.detach().numpy()),
        "beta": jnp.asarray(mod.bn.bias.detach().numpy()),
        "mean": jnp.asarray(mod.bn.running_mean.numpy()),
        "var": jnp.asarray(mod.bn.running_var.numpy()),
    }


def test_conv_bn_matches(rng):
    torch.manual_seed(0)
    m = _rand_bn(BasicConv2d(3, 8, kernel_size=3, stride=2))
    x = rng.standard_normal((2, 3, 17, 17)).astype(np.float32)
    with torch.no_grad():
        want = m(torch.from_numpy(x)).numpy()
    got = _conv_bn(jnp.asarray(x), _params_of(m), stride=2)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_avgpool_count_include_pad(rng):
    x = rng.standard_normal((1, 2, 8, 8)).astype(np.float32)
    want_inc = F.avg_pool2d(torch.from_numpy(x), 3, 1, 1, count_include_pad=True).numpy()
    want_exc = F.avg_pool2d(torch.from_numpy(x), 3, 1, 1, count_include_pad=False).numpy()
    np.testing.assert_allclose(np.asarray(_avgpool3(jnp.asarray(x), True)), want_inc, atol=1e-6)
    np.testing.assert_allclose(np.asarray(_avgpool3(jnp.asarray(x), False)), want_exc, atol=1e-6)


class TorchInceptionA(tnn.Module):
    """torchvision InceptionA replica (fid pooling switchable)."""

    def __init__(self, cin, pool_features, fid=False):
        super().__init__()
        self.branch1x1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch5x5_1 = BasicConv2d(cin, 48, kernel_size=1)
        self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = BasicConv2d(cin, pool_features, kernel_size=1)
        self.fid = fid

    def forward(self, x):
        bp = F.avg_pool2d(x, 3, 1, 1, count_include_pad=not self.fid)
        return torch.cat([
            self.branch1x1(x),
            self.branch5x5_2(self.branch5x5_1(x)),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            self.branch_pool(bp),
        ], 1)


@pytest.mark.parametrize("fid", [False, True])
def test_inception_a_matches(rng, fid):
    torch.manual_seed(1)
    m = _rand_bn(TorchInceptionA(192, 32, fid=fid))
    x = rng.standard_normal((1, 192, 9, 9)).astype(np.float32)
    with torch.no_grad():
        want = m(torch.from_numpy(x)).numpy()
    p = {name: _params_of(getattr(m, name)) for name in [
        "branch1x1", "branch5x5_1", "branch5x5_2",
        "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool",
    ]}
    got = _inception_a(jnp.asarray(x), p, fid)
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)


def test_converter_and_full_graph_shapes(rng):
    """Random-weight full-network pass: converter naming + output shape."""
    torch.manual_seed(2)

    # synthesize a state dict with torchvision naming for every block
    def conv_sd(pref, cin, cout, k):
        kk = (k, k) if isinstance(k, int) else k
        return {
            f"{pref}.conv.weight": torch.randn(cout, cin, *kk) * 0.05,
            f"{pref}.bn.weight": torch.rand(cout) + 0.5,
            f"{pref}.bn.bias": torch.randn(cout) * 0.1,
            f"{pref}.bn.running_mean": torch.randn(cout) * 0.1,
            f"{pref}.bn.running_var": torch.rand(cout) + 0.5,
        }

    sd = {}
    sd.update(conv_sd("Conv2d_1a_3x3", 3, 32, 3))
    sd.update(conv_sd("Conv2d_2a_3x3", 32, 32, 3))
    sd.update(conv_sd("Conv2d_2b_3x3", 32, 64, 3))
    sd.update(conv_sd("Conv2d_3b_1x1", 64, 80, 1))
    sd.update(conv_sd("Conv2d_4a_3x3", 80, 192, 3))

    def block_a(pref, cin, pf):
        out = {}
        out.update(conv_sd(f"{pref}.branch1x1", cin, 64, 1))
        out.update(conv_sd(f"{pref}.branch5x5_1", cin, 48, 1))
        out.update(conv_sd(f"{pref}.branch5x5_2", 48, 64, 5))
        out.update(conv_sd(f"{pref}.branch3x3dbl_1", cin, 64, 1))
        out.update(conv_sd(f"{pref}.branch3x3dbl_2", 64, 96, 3))
        out.update(conv_sd(f"{pref}.branch3x3dbl_3", 96, 96, 3))
        out.update(conv_sd(f"{pref}.branch_pool", cin, pf, 1))
        return out

    def block_b(pref, cin):
        out = {}
        out.update(conv_sd(f"{pref}.branch3x3", cin, 384, 3))
        out.update(conv_sd(f"{pref}.branch3x3dbl_1", cin, 64, 1))
        out.update(conv_sd(f"{pref}.branch3x3dbl_2", 64, 96, 3))
        out.update(conv_sd(f"{pref}.branch3x3dbl_3", 96, 96, 3))
        return out

    def block_c(pref, cin, c7):
        out = {}
        out.update(conv_sd(f"{pref}.branch1x1", cin, 192, 1))
        out.update(conv_sd(f"{pref}.branch7x7_1", cin, c7, 1))
        out.update(conv_sd(f"{pref}.branch7x7_2", c7, c7, (1, 7)))
        out.update(conv_sd(f"{pref}.branch7x7_3", c7, 192, (7, 1)))
        out.update(conv_sd(f"{pref}.branch7x7dbl_1", cin, c7, 1))
        out.update(conv_sd(f"{pref}.branch7x7dbl_2", c7, c7, (7, 1)))
        out.update(conv_sd(f"{pref}.branch7x7dbl_3", c7, c7, (1, 7)))
        out.update(conv_sd(f"{pref}.branch7x7dbl_4", c7, c7, (7, 1)))
        out.update(conv_sd(f"{pref}.branch7x7dbl_5", c7, 192, (1, 7)))
        out.update(conv_sd(f"{pref}.branch_pool", cin, 192, 1))
        return out

    def block_d(pref, cin):
        out = {}
        out.update(conv_sd(f"{pref}.branch3x3_1", cin, 192, 1))
        out.update(conv_sd(f"{pref}.branch3x3_2", 192, 320, 3))
        out.update(conv_sd(f"{pref}.branch7x7x3_1", cin, 192, 1))
        out.update(conv_sd(f"{pref}.branch7x7x3_2", 192, 192, (1, 7)))
        out.update(conv_sd(f"{pref}.branch7x7x3_3", 192, 192, (7, 1)))
        out.update(conv_sd(f"{pref}.branch7x7x3_4", 192, 192, 3))
        return out

    def block_e(pref, cin):
        out = {}
        out.update(conv_sd(f"{pref}.branch1x1", cin, 320, 1))
        out.update(conv_sd(f"{pref}.branch3x3_1", cin, 384, 1))
        out.update(conv_sd(f"{pref}.branch3x3_2a", 384, 384, (1, 3)))
        out.update(conv_sd(f"{pref}.branch3x3_2b", 384, 384, (3, 1)))
        out.update(conv_sd(f"{pref}.branch3x3dbl_1", cin, 448, 1))
        out.update(conv_sd(f"{pref}.branch3x3dbl_2", 448, 384, 3))
        out.update(conv_sd(f"{pref}.branch3x3dbl_3a", 384, 384, (1, 3)))
        out.update(conv_sd(f"{pref}.branch3x3dbl_3b", 384, 384, (3, 1)))
        out.update(conv_sd(f"{pref}.branch_pool", cin, 192, 1))
        return out

    sd.update(block_a("Mixed_5b", 192, 32))
    sd.update(block_a("Mixed_5c", 256, 64))
    sd.update(block_a("Mixed_5d", 288, 64))
    sd.update(block_b("Mixed_6a", 288))
    sd.update(block_c("Mixed_6b", 768, 128))
    sd.update(block_c("Mixed_6c", 768, 160))
    sd.update(block_c("Mixed_6d", 768, 160))
    sd.update(block_c("Mixed_6e", 768, 192))
    sd.update(block_d("Mixed_7a", 768))
    sd.update(block_e("Mixed_7b", 1280))
    sd.update(block_e("Mixed_7c", 2048))

    params = convert_inception_state_dict({k: v.numpy() for k, v in sd.items()})
    x = jnp.asarray(rng.uniform(0, 1, (2, 3, 64, 64)).astype(np.float32))
    feats = inception_features(params, x, fid_variant=True)
    assert feats.shape == (2, 2048)
    assert bool(jnp.isfinite(feats).all())
