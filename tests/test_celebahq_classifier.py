"""Oracle parity: CelebA-HQ attribute classifier vs the reference torch
implementation (ProGAN-D shaped, fixed_size, no mbstd)."""

import sys

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from transeditor_tpu.edit.celebahq_classifier import (  # noqa: E402
    CelebAHQAttributeClassifier, box_downsample_256,
    port_celebahq_classifier)

REF = "/root/reference"


@pytest.mark.slow
def test_classifier_parity():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from our_interfaceGAN.celebahq_utils.dex.networks.classifiers import (
        attribute_classifier)

    torch.manual_seed(0)
    ref = attribute_classifier.D(resolution=256, fixed_size=True,
                                 use_mbstd=False)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = port_celebahq_classifier(sd)

    rng = np.random.RandomState(1)
    img = rng.randn(2, 3, 256, 256).astype(np.float32) * 0.3
    with torch.no_grad():
        want = ref(torch.tensor(img)).numpy().reshape(-1)

    net = CelebAHQAttributeClassifier()
    got = np.asarray(net.apply(params,
                               jnp.asarray(img.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-3)


def test_box_downsample():
    x = jnp.ones((1, 512, 512, 3))
    y = box_downsample_256(x)
    assert y.shape == (1, 256, 256, 3)
    np.testing.assert_allclose(np.asarray(y), 1.0, atol=1e-6)
