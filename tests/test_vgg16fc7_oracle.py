"""Graph oracle for the PRDC feature extractor (VGG16 through fc7).

The reference (metrics/calc_prdc.py:101-103) takes torchvision's
vgg16, drops the last classifier Linear, and feeds 256px [-1,1]
images straight in — so the live path includes the
AdaptiveAvgPool2d((7,7)) on an 8x8 feature map, channel-major
flattening, and the ReLUs (Dropouts are eval no-ops).  torchvision
pretrained weights can't download offline; the architecture is built
here by hand with random weights shared with our port, pinning the
graph (incl. the adaptive-pool window math at non-224 sizes).
"""

import numpy as np
import pytest
import torch

from transeditor_tpu.zoo.backbones import (VGG16Fc7, adaptive_avg_pool_2d,
                                           port_vgg16_fc7)


def _torch_vgg16_fc7():
    """torchvision vgg16 layout with classifier[:-1] applied."""
    layers, in_ch = [], 3
    for v in (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M"):
        if v == "M":
            layers.append(torch.nn.MaxPool2d(2, 2))
        else:
            layers.append(torch.nn.Conv2d(in_ch, v, 3, 1, 1))
            layers.append(torch.nn.ReLU(inplace=True))
            in_ch = v

    class VGG(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.features = torch.nn.Sequential(*layers)
            self.avgpool = torch.nn.AdaptiveAvgPool2d((7, 7))
            self.classifier = torch.nn.Sequential(
                torch.nn.Linear(512 * 7 * 7, 4096),
                torch.nn.ReLU(True), torch.nn.Dropout(),
                torch.nn.Linear(4096, 4096),
                torch.nn.ReLU(True), torch.nn.Dropout(),
                torch.nn.Linear(4096, 1000))

        def forward(self, x):
            x = self.avgpool(self.features(x))
            return self.classifier(torch.flatten(x, 1))

    m = VGG()
    m.classifier = m.classifier[:-1]   # calc_prdc.py:102
    return m.eval()


@pytest.mark.parametrize("n_in,n_out",
                         [(8, 7), (2, 7), (4, 7), (7, 7),
                          (188, 112),    # the ArcFace face_pool shape
                          (16, 7)])      # the IntoWPlus trunk shape
def test_adaptive_avg_pool_matches_torch(n_in, n_out):
    g = torch.Generator().manual_seed(0)
    x = torch.randn((2, 5, n_in, n_in), generator=g)
    want = torch.nn.functional.adaptive_avg_pool2d(x, n_out).numpy()
    got = np.asarray(adaptive_avg_pool_2d(
        np.transpose(x.numpy(), (0, 2, 3, 1)), (n_out, n_out)))
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), want,
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("size", [64, 128])
def test_vgg16_fc7_graph_oracle(size):
    torch.manual_seed(0)
    ref = _torch_vgg16_fc7()
    g = torch.Generator().manual_seed(1)
    x = torch.rand((2, 3, size, size), generator=g) * 2 - 1
    with torch.no_grad():
        want = ref(x).numpy()
    assert want.shape == (2, 4096)

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = port_vgg16_fc7(sd)
    got = np.asarray(VGG16Fc7().apply(
        params, np.transpose(x.numpy(), (0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)
