"""Oracle parity: pose classifier (resnet18 trunk + Linear head,
reference our_interfaceGAN/ffhq_utils/dex/models.py:73-89) vs a torch
implementation.

torchvision is not installed in this image, so the torch side rebuilds
resnet18's BasicBlock trunk with torchvision's exact module naming —
the ported state dict therefore has the same keys ClassifyModel would
produce (``backbone.{0,1,4..7}...`` + ``extra_layer``)."""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
tnn = torch.nn

from transeditor_tpu.edit.classifiers import (  # noqa: E402
    PoseClassifier, port_pose_classifier)


class TorchBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.relu = tnn.ReLU(inplace=False)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(y + idt)


def torch_classify_model(n_class=2):
    """ClassifyModel equivalent: Sequential(resnet18 children minus fc)
    named ``backbone`` + ``extra_layer`` (models.py:73-89)."""
    def layer(cin, cout, stride):
        return tnn.Sequential(TorchBasicBlock(cin, cout, stride),
                              TorchBasicBlock(cout, cout))

    backbone = tnn.Sequential(
        tnn.Conv2d(3, 64, 7, 2, 3, bias=False),   # 0: conv1
        tnn.BatchNorm2d(64),                      # 1: bn1
        tnn.ReLU(),                               # 2
        tnn.MaxPool2d(3, 2, 1),                   # 3
        layer(64, 64, 1),                         # 4: layer1
        layer(64, 128, 2),                        # 5: layer2
        layer(128, 256, 2),                       # 6: layer3
        layer(256, 512, 2),                       # 7: layer4
        tnn.AdaptiveAvgPool2d(1),                 # 8: avgpool
    )
    model = tnn.Module()
    model.backbone = backbone
    model.extra_layer = tnn.Linear(512, n_class)
    return model


@pytest.mark.slow
def test_pose_classifier_parity():
    torch.manual_seed(3)
    ref = torch_classify_model()
    # non-trivial BN running stats so the port is actually exercised
    for m in ref.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.normal_(0, 0.2)
            m.running_var.uniform_(0.5, 1.5)
    ref.eval()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = port_pose_classifier(sd)

    rng = np.random.RandomState(7)
    img = rng.randn(2, 3, 64, 64).astype(np.float32) * 0.5
    with torch.no_grad():
        x = torch.tensor(img)
        feats = torch.flatten(ref.backbone(x), 1)
        want = torch.softmax(ref.extra_layer(feats), dim=1).numpy()

    got = np.asarray(PoseClassifier().apply(
        variables, jnp.asarray(img.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_pose_classifier_reference_module_oracle():
    """Import the REFERENCE ClassifyModel itself (ffhq_utils/dex/
    models.py:73-89) against a stub torchvision resnet18 whose
    children() order matches torchvision's, so its children[:-1]
    slicing / flatten / softmax are the oracle — not a replica."""
    import importlib.util
    import sys
    import types

    class _StubResNet18(tnn.Module):
        def __init__(self):
            super().__init__()

            def layer(cin, cout, stride):
                return tnn.Sequential(TorchBasicBlock(cin, cout, stride),
                                      TorchBasicBlock(cout, cout))

            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.relu = tnn.ReLU(inplace=True)
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            self.layer1 = layer(64, 64, 1)
            self.layer2 = layer(64, 128, 2)
            self.layer3 = layer(128, 256, 2)
            self.layer4 = layer(256, 512, 2)
            self.avgpool = tnn.AdaptiveAvgPool2d((1, 1))
            self.fc = tnn.Linear(512, 1000)

    tv = types.ModuleType("torchvision")
    tvm = types.ModuleType("torchvision.models")
    tvm.resnet18 = lambda *a, **k: _StubResNet18()
    tv.models = tvm
    saved = {n: sys.modules.get(n)
             for n in ("torchvision", "torchvision.models")}
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tvm
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_dex_models",
            "/root/reference/our_interfaceGAN/ffhq_utils/dex/models.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for n, m in saved.items():
            if m is None:
                sys.modules.pop(n, None)
            else:
                sys.modules[n] = m

    torch.manual_seed(5)
    ref = mod.ClassifyModel(n_class=2)
    for m in ref.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.normal_(0, 0.2)
            m.running_var.uniform_(0.5, 1.5)
    ref.eval()

    rng = np.random.RandomState(11)
    img = rng.randn(2, 3, 64, 64).astype(np.float32) * 0.5
    with torch.no_grad():
        want = ref(torch.tensor(img)).numpy()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    got = np.asarray(PoseClassifier().apply(
        port_pose_classifier(sd),
        jnp.asarray(img.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
