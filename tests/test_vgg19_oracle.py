"""Graph oracle for the reference's VGGLoss (model_spatial_query.py:52-72).

The reference Vgg19 is doubly dead code: nothing imports it, and its
__init__ indexes the FULL torchvision VGG module (``vgg19[x]``,
model_spatial_query.py:29 — nn.Module is not subscriptable) so it
cannot even construct as written.  This test realises the INTENDED
semantics by stubbing ``models.vgg19`` with a module whose
``__getitem__`` forwards to ``.features`` (clearly what the slicing
at :28-37 meant), then checks our ``vgg19_perceptual_loss`` — with the
same random weights ported — reproduces the reference loss, including
its double-shift input normalisation and sqrt(std+eps) quirks.
"""

import sys

import numpy as np
import torch

from oracle_utils import load_reference_module
from transeditor_tpu.zoo.backbones import (VGG19_CFG, VGG19_TAPS,
                                           VGGFeatures, port_vgg,
                                           vgg19_perceptual_loss)


class _FakeVGG19(torch.nn.Module):
    def __init__(self):
        super().__init__()
        layers, in_ch = [], 3
        for v in VGG19_CFG:
            if v == "M":
                layers.append(torch.nn.MaxPool2d(2, 2))
            else:
                layers.append(torch.nn.Conv2d(in_ch, v, 3, 1, 1))
                layers.append(torch.nn.ReLU(inplace=True))
                in_ch = v
        self.features = torch.nn.Sequential(*layers)

    def __getitem__(self, i):          # the intended vgg19[x]
        return self.features[i]


def test_vgg19_loss_graph_oracle(monkeypatch):
    ref = load_reference_module()

    torch.manual_seed(0)
    built = []

    def fake_vgg19(pretrained=False):
        m = _FakeVGG19()
        built.append(m)
        return m

    monkeypatch.setattr(ref.models, "vgg19", fake_vgg19, raising=False)
    monkeypatch.setattr(torch, "load",
                        lambda *a, **k: built[-1].state_dict())
    vggloss = ref.VGGLoss()   # .cuda() no-ops via oracle_utils

    g = torch.Generator().manual_seed(1)
    x = torch.rand((2, 3, 64, 64), generator=g) * 2 - 1
    y = torch.rand((2, 3, 64, 64), generator=g) * 2 - 1
    with torch.no_grad():
        want = float(vggloss(x, y))

    sd = {k: v.numpy() for k, v in built[-1].state_dict().items()}
    net = VGGFeatures(tuple(VGG19_CFG), VGG19_TAPS)
    params = port_vgg(sd, 16)
    got = float(vgg19_perceptual_loss(
        lambda p, im: net.apply(p, im), params,
        np.transpose(x.numpy(), (0, 2, 3, 1)),
        np.transpose(y.numpy(), (0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)
