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


class Scorer:
    """Image -> attribute-score callable that keeps its weights OUT of
    the jaxpr.

    Weight trees must travel through jit boundaries as *arguments*:
    closure-captured (numpy) trees get embedded as HLO constants, which
    bloats remote-compile payloads (DexVGG's fc1 alone is 134 MB) and
    recompiles per checkpoint.  Callers that jit around a scorer should
    use ``scorer.fn(scorer.params, img)`` so the weights stay arguments
    of the outer jit too.
    """

    def __init__(self, fn, params):
        self.params = jax.tree.map(jnp.asarray, params)
        self.fn = fn                      # fn(params, img) -> [B]
        self._jitted = jax.jit(fn)

    def __call__(self, img):
        return self._jitted(self.params, img)


def make_scorer(attribute: str, params, train_vars=None) -> Scorer:
    """Returns a Scorer: [-1,1] RGB NHWC images -> [B] scores.

    attribute in {'age', 'gender', 'pose'}.
    """
    if attribute == "age":
        net = DexVGG(classes=101)

        def score(p, img):
            return expected_age(net.apply(p, dex_preprocess(img)))
    elif attribute == "gender":
        net = DexVGG(classes=2)

        def score(p, img):
            return net.apply(p, dex_preprocess(img))[:, 0]
    elif attribute == "pose":
        net = PoseClassifier()

        def score(p, img):
            return net.apply(p, dex_preprocess(img))[:, 0]
    else:
        raise ValueError(attribute)
    return Scorer(score, params)


# ---------------------------------------------------------------------------
# torch-state-dict porters


def port_pose_classifier(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """ClassifyModel state dict -> PoseClassifier variables.

    Reference layout (our_interfaceGAN/ffhq_utils/dex/models.py:73-89):
    ``backbone`` is ``nn.Sequential(*resnet18().children()[:-1])``, so
    torchvision's named children become numeric indices — 0=conv1,
    1=bn1, 4..7=layer1..4 (each two BasicBlocks) — plus
    ``extra_layer`` = Linear(512, n_class).
    """
    def bn(prefix):
        return ({"scale": sd[f"{prefix}.weight"],
                 "bias": sd[f"{prefix}.bias"]},
                {"mean": sd[f"{prefix}.running_mean"],
                 "var": sd[f"{prefix}.running_var"]})

    bb_p: Dict[str, Any] = {"conv1": {"kernel": np.transpose(
        sd["backbone.0.weight"], (2, 3, 1, 0))}}
    bb_s: Dict[str, Any] = {}
    bb_p["bn1"], bb_s["bn1"] = bn("backbone.1")
    for layer in range(4):          # Sequential indices 4..7
        for b in range(2):
            base = f"backbone.{4 + layer}.{b}"
            name = f"block{2 * layer + b}"
            p: Dict[str, Any] = {
                "conv1": {"kernel": np.transpose(
                    sd[f"{base}.conv1.weight"], (2, 3, 1, 0))},
                "conv2": {"kernel": np.transpose(
                    sd[f"{base}.conv2.weight"], (2, 3, 1, 0))},
            }
            s: Dict[str, Any] = {}
            p["bn1"], s["bn1"] = bn(f"{base}.bn1")
            p["bn2"], s["bn2"] = bn(f"{base}.bn2")
            if f"{base}.downsample.0.weight" in sd:
                p["down_conv"] = {"kernel": np.transpose(
                    sd[f"{base}.downsample.0.weight"], (2, 3, 1, 0))}
                p["down_bn"], s["down_bn"] = bn(f"{base}.downsample.1")
            bb_p[name], bb_s[name] = p, s
    params = {"backbone": bb_p,
              "extra_layer": {"kernel": sd["extra_layer.weight"].T,
                              "bias": sd["extra_layer.bias"]}}
    return {"params": params, "batch_stats": {"backbone": bb_s}}


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


def load_scorer_from_checkpoint(attribute: str, path: str) -> Scorer:
    """Port a torch classifier checkpoint and build its Scorer,
    dispatched on the attribute name: DEX VGG16 for age/gender
    (api.py:15-18), resnet18 for pose (models.py:78-89), and the
    CelebA-HQ ProGAN-D attribute nets for anything else
    (domain_classifier.py:4-36)."""
    from transeditor_tpu.io.torch_port import load_torch_checkpoint

    sd = load_torch_checkpoint(path)
    if attribute in ("age", "gender"):
        return make_scorer(attribute, port_dex_vgg(sd))
    if attribute == "pose":
        return make_scorer(attribute, port_pose_classifier(sd))
    from transeditor_tpu.edit.celebahq_classifier import (
        make_celebahq_scorer, port_celebahq_classifier)
    return make_celebahq_scorer(port_celebahq_classifier(sd))
