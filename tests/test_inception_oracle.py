"""Graph-level oracle parity for the FID InceptionV3 port.

The reference FID extractor (metrics/inception.py) is pytorch-fid's
InceptionV3: torchvision's inception_v3 with FID-patched pooling
(count_include_pad=False avg pools; a max pool in Mixed_7c).  Its real
weights come from a download URL that's unreachable offline, so this
test builds the torchvision architecture by hand (faithful BasicConv2d/
InceptionA-E base classes — the FID subclasses at reference
metrics/inception.py:193-310 only override `forward`), runs the
REFERENCE module on random weights with randomized BatchNorm running
stats, ports the same state dict through
``port_fid_inception_weights`` (which folds BN), and requires matching
pool3 features.

This pins: block structure, paddings/strides, the three FID pooling
quirks, 299x299 bilinear resize, input normalization, BN folding math,
and the porter's OIHW->HWIO mapping.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import torch
import torch.nn.functional as F

from transeditor_tpu.metrics.inception import (InceptionV3Features,
                                               port_fid_inception_weights)

REF = "/root/reference"


class BasicConv2d(torch.nn.Module):
    def __init__(self, in_channels, out_channels, **kwargs):
        super().__init__()
        self.conv = torch.nn.Conv2d(in_channels, out_channels,
                                    bias=False, **kwargs)
        self.bn = torch.nn.BatchNorm2d(out_channels, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)), inplace=True)


class InceptionA(torch.nn.Module):
    def __init__(self, in_channels, pool_features):
        super().__init__()
        self.branch1x1 = BasicConv2d(in_channels, 64, kernel_size=1)
        self.branch5x5_1 = BasicConv2d(in_channels, 48, kernel_size=1)
        self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = BasicConv2d(in_channels, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = BasicConv2d(in_channels, pool_features,
                                       kernel_size=1)

    def forward(self, x):  # unpatched torchvision forward (unused here)
        bp = F.avg_pool2d(x, kernel_size=3, stride=1, padding=1)
        return torch.cat([
            self.branch1x1(x),
            self.branch5x5_2(self.branch5x5_1(x)),
            self.branch3x3dbl_3(self.branch3x3dbl_2(
                self.branch3x3dbl_1(x))),
            self.branch_pool(bp)], 1)


class InceptionB(torch.nn.Module):
    def __init__(self, in_channels):
        super().__init__()
        self.branch3x3 = BasicConv2d(in_channels, 384,
                                     kernel_size=3, stride=2)
        self.branch3x3dbl_1 = BasicConv2d(in_channels, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(
                self.branch3x3dbl_1(x))),
            F.max_pool2d(x, kernel_size=3, stride=2)], 1)


class InceptionC(torch.nn.Module):
    def __init__(self, in_channels, channels_7x7):
        super().__init__()
        c7 = channels_7x7
        self.branch1x1 = BasicConv2d(in_channels, 192, kernel_size=1)
        self.branch7x7_1 = BasicConv2d(in_channels, c7, kernel_size=1)
        self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                       padding=(0, 3))
        self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1),
                                       padding=(3, 0))
        self.branch7x7dbl_1 = BasicConv2d(in_channels, c7, kernel_size=1)
        self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch_pool = BasicConv2d(in_channels, 192, kernel_size=1)

    def forward(self, x):  # unpatched (unused here)
        bp = F.avg_pool2d(x, kernel_size=3, stride=1, padding=1)
        return torch.cat([
            self.branch1x1(x),
            self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x))),
            self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
                self.branch7x7dbl_2(self.branch7x7dbl_1(x))))),
            self.branch_pool(bp)], 1)


class InceptionD(torch.nn.Module):
    def __init__(self, in_channels):
        super().__init__()
        self.branch3x3_1 = BasicConv2d(in_channels, 192, kernel_size=1)
        self.branch3x3_2 = BasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = BasicConv2d(in_channels, 192, kernel_size=1)
        self.branch7x7x3_2 = BasicConv2d(192, 192, kernel_size=(1, 7),
                                         padding=(0, 3))
        self.branch7x7x3_3 = BasicConv2d(192, 192, kernel_size=(7, 1),
                                         padding=(3, 0))
        self.branch7x7x3_4 = BasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3_2(self.branch3x3_1(x)),
            self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
                self.branch7x7x3_1(x)))),
            F.max_pool2d(x, kernel_size=3, stride=2)], 1)


class InceptionE(torch.nn.Module):
    def __init__(self, in_channels):
        super().__init__()
        self.branch1x1 = BasicConv2d(in_channels, 320, kernel_size=1)
        self.branch3x3_1 = BasicConv2d(in_channels, 384, kernel_size=1)
        self.branch3x3_2a = BasicConv2d(384, 384, kernel_size=(1, 3),
                                        padding=(0, 1))
        self.branch3x3_2b = BasicConv2d(384, 384, kernel_size=(3, 1),
                                        padding=(1, 0))
        self.branch3x3dbl_1 = BasicConv2d(in_channels, 448, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(448, 384, kernel_size=3,
                                          padding=1)
        self.branch3x3dbl_3a = BasicConv2d(384, 384, kernel_size=(1, 3),
                                           padding=(0, 1))
        self.branch3x3dbl_3b = BasicConv2d(384, 384, kernel_size=(3, 1),
                                           padding=(1, 0))
        self.branch_pool = BasicConv2d(in_channels, 192, kernel_size=1)

    def forward(self, x):  # unpatched (unused here)
        raise NotImplementedError


class Inception3(torch.nn.Module):
    def __init__(self, num_classes=1000, aux_logits=True):
        super().__init__()
        self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = InceptionA(192, pool_features=32)
        self.Mixed_5c = InceptionA(256, pool_features=64)
        self.Mixed_5d = InceptionA(288, pool_features=64)
        self.Mixed_6a = InceptionB(288)
        self.Mixed_6b = InceptionC(768, channels_7x7=128)
        self.Mixed_6c = InceptionC(768, channels_7x7=160)
        self.Mixed_6d = InceptionC(768, channels_7x7=160)
        self.Mixed_6e = InceptionC(768, channels_7x7=192)
        self.Mixed_7a = InceptionD(768)
        self.Mixed_7b = InceptionE(1280)
        self.Mixed_7c = InceptionE(2048)
        self.fc = torch.nn.Linear(2048, num_classes)


def _load_reference_inception():
    """Import reference metrics/inception.py against the stub."""
    built = []

    def inception_v3(num_classes=1000, aux_logits=True, pretrained=False):
        assert not pretrained
        m = Inception3(num_classes=num_classes, aux_logits=aux_logits)
        built.append(m)
        return m

    tv = types.ModuleType("torchvision")
    tvm = types.ModuleType("torchvision.models")
    tvi = types.ModuleType("torchvision.models.inception")
    tvi.InceptionA, tvi.InceptionC, tvi.InceptionE = (
        InceptionA, InceptionC, InceptionE)
    tvm.inception = tvi
    tvm.inception_v3 = inception_v3
    tv.models = tvm

    saved = {n: sys.modules.get(n)
             for n in ("torchvision", "torchvision.models",
                       "torchvision.models.inception",
                       "torchvision.models.utils")}
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tvm
    sys.modules["torchvision.models.inception"] = tvi
    tvu = types.ModuleType("torchvision.models.utils")
    # identity "download": the state dict of the (already FID-patched)
    # model under construction — load_state_dict becomes a no-op
    tvu.load_state_dict_from_url = (
        lambda url, progress=True: built[-1].state_dict())
    sys.modules["torchvision.models.utils"] = tvu
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_fid_inception", os.path.join(REF, "metrics/inception.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        ref = mod.InceptionV3(output_blocks=[3], resize_input=True,
                              normalize_input=True)
    finally:
        for n, m in saved.items():
            if m is None:
                sys.modules.pop(n, None)
            else:
                sys.modules[n] = m
    return ref, built[-1]


def _randomize_bn(model, seed=0):
    """Non-trivial BN running stats/affine so folding is exercised."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            n = m.num_features
            m.running_mean.copy_(torch.randn(n, generator=g) * 0.2)
            m.running_var.copy_(0.5 + torch.rand(n, generator=g))
            m.weight.data.copy_(1 + torch.randn(n, generator=g) * 0.1)
            m.bias.data.copy_(torch.randn(n, generator=g) * 0.1)


def test_fid_inception_graph_oracle():
    torch.manual_seed(0)
    ref, incep = _load_reference_inception()
    _randomize_bn(incep)
    ref.eval()

    g = torch.Generator().manual_seed(1)
    x = torch.rand((2, 3, 64, 64), generator=g)   # (0,1) like the ref
    with torch.no_grad():
        want = ref(x)[0].reshape(2, -1).numpy()    # [2, 2048, 1, 1]
    assert want.shape == (2, 2048)

    sd = {k: v.numpy() for k, v in incep.state_dict().items()}
    params = port_fid_inception_weights(sd)
    ours = InceptionV3Features(resize_input=True, normalize_input=True)
    got = np.asarray(ours.apply(
        params, np.transpose(x.numpy(), (0, 2, 3, 1))))
    assert got.shape == (2, 2048)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-4)
