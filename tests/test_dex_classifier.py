"""Oracle parity: DEX VGG16 age/gender classifiers vs the reference
implementation (our_interfaceGAN/ffhq_utils/dex/models.py:9-69), and
the expectation scoring of api.py:42-58.

The reference module is imported directly from /root/reference with a
stub torchvision (only ClassifyModel's resnet18 needs the real thing,
and that path is covered by test_pose_classifier.py instead)."""

import importlib.util
import sys
import types

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from transeditor_tpu.edit.classifiers import (  # noqa: E402
    DexVGG, expected_age, port_dex_vgg)

REF_MODELS = "/root/reference/our_interfaceGAN/ffhq_utils/dex/models.py"


def _load_ref_dex():
    if "dex_models_ref" in sys.modules:
        return sys.modules["dex_models_ref"]
    tv = types.ModuleType("torchvision")
    tv.models = types.ModuleType("torchvision.models")
    tv.models.resnet18 = lambda *a, **k: None  # only ClassifyModel uses it
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.models", tv.models)
    spec = importlib.util.spec_from_file_location("dex_models_ref",
                                                  REF_MODELS)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["dex_models_ref"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
@pytest.mark.parametrize("attr,classes", [("age", 101), ("gender", 2)])
def test_dex_vgg_parity(attr, classes):
    ref_mod = _load_ref_dex()
    torch.manual_seed(11)
    ref = (ref_mod.Age() if attr == "age" else ref_mod.Gender()).eval()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = port_dex_vgg(sd)

    rng = np.random.RandomState(5)
    # the DEX feed is BGR 0..255 crops (api.py:49-52); match that scale
    img = rng.randint(0, 256, (1, 3, 224, 224)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(img)).numpy()

    got = np.asarray(DexVGG(classes=classes).apply(
        variables, jnp.asarray(img.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-3)

    if attr == "age":
        # expectation scoring, api.py:42-58: sum(probs * arange(1,102))
        want_age = (want * np.arange(1, 102)).sum(axis=1)
        got_age = np.asarray(expected_age(jnp.asarray(got)))
        np.testing.assert_allclose(got_age, want_age, atol=1e-3)
