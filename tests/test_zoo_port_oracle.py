"""Oracle parity for the encoder/ID model zoo: reference torch modules
(CPU) vs our Flax ports via io/zoo_port."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from oracle_utils import load_reference_module  # noqa: E402  (installs stubs)
from transeditor_tpu.io.zoo_port import (  # noqa: E402
    port_arcface, port_gradual_style_encoder)
from transeditor_tpu.models.irse import ArcFaceBackbone  # noqa: E402
from transeditor_tpu.models.psp import GradualStyleEncoder  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _stubs():
    load_reference_module()  # installs utils.op/torchvision stubs + path


@pytest.mark.slow
def test_arcface_backbone_parity():
    from pSp.models.encoders.model_irse import Backbone
    torch.manual_seed(0)
    ref = Backbone(input_size=112, num_layers=50, mode="ir_se")
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = port_arcface(sd)

    rng = np.random.RandomState(1)
    img = rng.randn(2, 3, 112, 112).astype(np.float32) * 0.5
    with torch.no_grad():
        want = ref(torch.tensor(img)).numpy()

    net = ArcFaceBackbone()
    got = np.asarray(net.apply(variables,
                               jnp.asarray(img.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_arcface_ir101_parity():
    """IR-101 mode='ir' (the CurricularFace net of
    calc_id_loss_parallel.py:29-30) through the same porter."""
    from pSp.models.encoders.model_irse import Backbone
    torch.manual_seed(0)
    ref = Backbone(input_size=112, num_layers=100, mode="ir")
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = port_arcface(sd, num_layers=100, use_se=False)

    rng = np.random.RandomState(1)
    img = rng.randn(1, 3, 112, 112).astype(np.float32) * 0.5
    with torch.no_grad():
        want = ref(torch.tensor(img)).numpy()

    net = ArcFaceBackbone(num_layers=100, mode="ir")
    got = np.asarray(net.apply(variables,
                               jnp.asarray(img.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_gradual_style_encoder_parity():
    from types import SimpleNamespace
    from pSp.models.encoders.psp_encoders_new import GradualStyleEncoder \
        as RefEncoder
    torch.manual_seed(0)
    ref = RefEncoder(50, "ir_se", SimpleNamespace(input_nc=3))
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = port_gradual_style_encoder(sd)

    rng = np.random.RandomState(2)
    img = rng.randn(1, 3, 256, 256).astype(np.float32) * 0.5
    with torch.no_grad():
        z_ref, p_ref = ref(torch.tensor(img))

    enc = GradualStyleEncoder(train=False)
    z, p = enc.apply(variables, jnp.asarray(img.transpose(0, 2, 3, 1)))
    # reference returns [B, 512, 16]; ours is [B, 16, 512]
    np.testing.assert_allclose(np.asarray(z),
                               z_ref.numpy().transpose(0, 2, 1),
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(p),
                               p_ref.numpy().transpose(0, 2, 1),
                               atol=5e-4, rtol=1e-3)


def test_backbone_encoder_into_w_parity():
    from types import SimpleNamespace
    from pSp.models.encoders.psp_encoders_new import (
        BackboneEncoderUsingLastLayerIntoW as RefW)
    from transeditor_tpu.io.zoo_port import port_backbone_encoder_into_w
    from transeditor_tpu.models.psp import BackboneEncoderIntoW

    torch.manual_seed(1)
    ref = RefW(50, "ir_se", SimpleNamespace(input_nc=3))
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    rng = np.random.RandomState(3)
    img = rng.randn(2, 3, 256, 256).astype(np.float32) * 0.5
    with torch.no_grad():
        want = ref(torch.tensor(img)).numpy()

    enc = BackboneEncoderIntoW(train=False)
    got = np.asarray(enc.apply(port_backbone_encoder_into_w(sd),
                               jnp.asarray(img.transpose(0, 2, 3, 1))))
    assert got.shape == want.shape == (2, 512)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_backbone_encoder_into_wplus_parity():
    """Also pins the AdaptiveAvgPool2d((7,7)) on the 16x16 trunk
    output (psp_encoders_new.py:191)."""
    from types import SimpleNamespace
    from pSp.models.encoders.psp_encoders_new import (
        BackboneEncoderUsingLastLayerIntoWPlus as RefWPlus)
    from transeditor_tpu.io.zoo_port import (
        port_backbone_encoder_into_wplus)
    from transeditor_tpu.models.psp import BackboneEncoderIntoWPlus

    torch.manual_seed(2)
    ref = RefWPlus(50, "ir_se", SimpleNamespace(input_nc=3))
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    rng = np.random.RandomState(4)
    img = rng.randn(1, 3, 256, 256).astype(np.float32) * 0.5
    with torch.no_grad():
        want = ref(torch.tensor(img)).numpy()

    enc = BackboneEncoderIntoWPlus(train=False)
    got = np.asarray(enc.apply(port_backbone_encoder_into_wplus(sd),
                               jnp.asarray(img.transpose(0, 2, 3, 1))))
    assert got.shape == want.shape == (1, 18, 512)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)
