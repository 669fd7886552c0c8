"""Attribute classifiers for editing sweeps (Flax).

Reference: ``our_interfaceGAN/ffhq_utils/dex/{models,api}.py`` —
  * DEX VGG16 heads: Age (101-way softmax, scored by expectation over
    ages 1..101, api.py:42-58) and Gender (2-way);
  * pose: torchvision resnet18 trunk + Linear(512, 2) + softmax;
  * inputs are center-cropped to 224 (api.py:49-52).

Weight files are not shipped with the reference (pth/ dir absent); the
porters below consume the same state-dict layout when provided.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax

from transeditor_tpu.zoo.resnet import ResNet18Features

VGG_PLAN = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]


class DexVGG(nn.Module):
    """DEX VGG16 (conv blocks + 2 fc + cls head + softmax)."""

    classes: int = 101

    @nn.compact
    def __call__(self, x):
        for b, (feat, n_convs) in enumerate(VGG_PLAN):
            for c in range(n_convs):
                x = nn.Conv(feat, (3, 3), padding=[(1, 1), (1, 1)],
                            dtype=x.dtype, name=f"b{b}_conv{c}")(x)
                x = jax.nn.relu(x)
            x = lax.reduce_window(x, -jnp.inf, lax.max, (1, 2, 2, 1),
                                  (1, 2, 2, 1), "VALID")
        b = x.shape[0]
        # channel-major flatten to match the torch Linear weights
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, -1)
        x = jax.nn.relu(nn.Dense(4096, dtype=x.dtype, name="fc1")(x))
        x = jax.nn.relu(nn.Dense(4096, dtype=x.dtype, name="fc2")(x))
        x = nn.Dense(self.classes, dtype=x.dtype, name="cls")(x)
        return jax.nn.softmax(x, axis=-1)


class PoseClassifier(nn.Module):
    """resnet18 trunk + Linear(512, n_class) + softmax."""

    n_class: int = 2
    train: bool = False

    @nn.compact
    def __call__(self, x):
        feats = ResNet18Features(train=self.train, name="backbone")(x)
        return jax.nn.softmax(
            nn.Dense(self.n_class, dtype=x.dtype, name="extra_layer")(feats),
            axis=-1)


def center_crop_224(img):
    """Center crop to 224 (api.py:49-52)."""
    h = img.shape[1]
    off = (h - 224) // 2
    return img[:, off:off + 224, off:off + 224, :]


def expected_age(probs):
    """Softmax expectation over ages 1..101 (api.py:42-47)."""
    ages = jnp.arange(1, probs.shape[-1] + 1, dtype=probs.dtype)
    return jnp.sum(probs * ages, axis=-1)


def dex_preprocess(img):
    """[-1,1] RGB NHWC -> BGR 0..255 rounded + 224 center crop — the
    exact feed the DEX nets expect (edit_all_noinversion_ffhq.py:113-116,
    api.py:49-52)."""
    x = jnp.round((jnp.clip(img, -1, 1) + 1) * 127.5)
    x = x[..., ::-1]
    return center_crop_224(x)


def make_scorer(attribute: str, params, train_vars=None):
    """Returns a jitted fn: [-1,1] RGB NHWC images -> [B] scores.

    attribute in {'age', 'gender', 'pose'}.
    """
    if attribute == "age":
        net = DexVGG(classes=101)

        @jax.jit
        def score(img):
            return expected_age(net.apply(params, dex_preprocess(img)))
    elif attribute == "gender":
        net = DexVGG(classes=2)

        @jax.jit
        def score(img):
            return net.apply(params, dex_preprocess(img))[:, 0]
    elif attribute == "pose":
        net = PoseClassifier()

        @jax.jit
        def score(img):
            return net.apply(params, dex_preprocess(img))[:, 0]
    else:
        raise ValueError(attribute)
    return score


# ---------------------------------------------------------------------------
# torch-state-dict porters


def port_dex_vgg(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """conv.{block}.conv{i}.weight/.bias + fc1/fc2/cls -> our tree."""
    p: Dict[str, Any] = {}
    for b in range(5):
        n_convs = VGG_PLAN[b][1]
        for c in range(n_convs):
            w = sd[f"conv.{b}.conv{c + 1}.weight"]
            bias = sd[f"conv.{b}.conv{c + 1}.bias"]
            p[f"b{b}_conv{c}"] = {
                "kernel": np.transpose(w, (2, 3, 1, 0)),
                "bias": bias,
            }
    p["fc1"] = {"kernel": sd["fc1.0.weight"].T, "bias": sd["fc1.0.bias"]}
    p["fc2"] = {"kernel": sd["fc2.0.weight"].T, "bias": sd["fc2.0.bias"]}
    p["cls"] = {"kernel": sd["cls.weight"].T, "bias": sd["cls.bias"]}
    return {"params": p}
