"""CelebA-HQ attribute classifiers (gan-ensembling stack) in Flax.

Reference: ``our_interfaceGAN/celebahq_utils/dex/networks/classifiers/
attribute_classifier.py`` — a ProGAN-discriminator-shaped binary
classifier (wscale conv blocks, avg-pool downscale with
conv->bias->downscale->act ordering, fixed-size fromRGB, no
minibatch-std) at 256px, one logit; scored as
``softmax([logit, -logit])[:, 1]`` after box-downsampling inputs to 256
(attribute_utils.py:8-31).  40 CelebA attributes, one checkpoint each.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax


# The 40 CelebA attributes in the reference's sweep order
# (edit_all_noinversion_celebahq.py:25-66); index into this list is the
# reference's --attribute_index.
CELEBAHQ_ATTRIBUTES = [
    "Male", "Smiling", "Attractive", "Wavy_Hair", "Young",
    "5_o_Clock_Shadow", "Arched_Eyebrows", "Bags_Under_Eyes", "Bald",
    "Bangs", "Big_Lips", "Big_Nose", "Black_Hair", "Blond_Hair",
    "Blurry", "Brown_Hair", "Bushy_Eyebrows", "Chubby", "Double_Chin",
    "Eyeglasses", "Goatee", "Gray_Hair", "Heavy_Makeup",
    "High_Cheekbones", "Mouth_Slightly_Open", "Mustache", "Narrow_Eyes",
    "No_Beard", "Oval_Face", "Pale_Skin", "Pointy_Nose",
    "Receding_Hairline", "Rosy_Cheeks", "Sideburns", "Straight_Hair",
    "Wearing_Earrings", "Wearing_Hat", "Wearing_Lipstick",
    "Wearing_Necklace", "Wearing_Necktie",
]


def _nf(stage: int, fmap_base=8192, fmap_max=512) -> int:
    return min(int(fmap_base / (2.0 ** stage)), fmap_max)


class WScaleConv(nn.Module):
    features: int
    kernel: int
    padding: int = 0
    gain: float = math.sqrt(2)

    @nn.compact
    def __call__(self, x):
        k, c = self.kernel, x.shape[-1]
        w = self.param("weight", nn.initializers.normal(1.0),
                       (k, k, c, self.features))
        b = self.param("bias", nn.initializers.normal(1.0),
                       (self.features,))
        scale = self.gain / math.sqrt(c * k * k)
        y = lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1),
            ((self.padding, self.padding), (self.padding, self.padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y * scale + b.astype(y.dtype)


class WScaleDense(nn.Module):
    features: int
    gain: float = math.sqrt(2)

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        w = self.param("weight", nn.initializers.normal(1.0),
                       (c, self.features))
        b = self.param("bias", nn.initializers.normal(1.0),
                       (self.features,))
        return (x @ w.astype(x.dtype)) * (self.gain / math.sqrt(c)) \
            + b.astype(x.dtype)


def avg_pool2(x):
    return lax.reduce_window(x, 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
                             "VALID") * 0.25


class CelebAHQAttributeClassifier(nn.Module):
    """256px binary attribute net -> raw logit [B]."""

    resolution: int = 256

    @nn.compact
    def __call__(self, img):
        act = lambda v: jax.nn.leaky_relu(v, 0.2)
        log2res = int(math.log2(self.resolution))
        x = act(WScaleConv(_nf(log2res - 1), 1, name="fromrgb")(img))
        for res in range(log2res, 2, -1):
            blk = f"block_{2 ** res}"
            x = act(WScaleConv(_nf(res - 1), 3, 1,
                               name=f"{blk}_conv0")(x))
            # conv -> bias -> downscale -> act ordering (reference :98-106)
            x = WScaleConv(_nf(res - 2), 3, 1, name=f"{blk}_conv1")(x)
            x = act(avg_pool2(x))
        # prediction block @4x4 (no minibatch-std for attribute nets)
        x = act(WScaleConv(_nf(1), 3, 1, name="pred_conv")(x))
        b = x.shape[0]
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, -1)  # channel-major
        x = act(WScaleDense(_nf(0), name="pred_dense0")(x))
        x = WScaleDense(1, gain=1.0, name="pred_dense1")(x)
        return x[:, 0]


def box_downsample_256(img):
    """Resize to the classifier's fixed 256px: factor-mean downsample
    (attribute_utils.py:8-19) for larger inputs; nearest upsample for
    smaller ones (the reference never feeds <256, but small dev
    generators do)."""
    h = img.shape[1]
    if h == 256:
        return img
    if h < 256:
        f = 256 // h
        return jnp.repeat(jnp.repeat(img, f, axis=1), f, axis=2)
    f = h // 256
    b, _, w, c = img.shape
    return img.reshape(b, 256, f, 256, f, c).mean(axis=(2, 4))


def make_celebahq_scorer(params):
    """[-1,1] RGB NHWC -> (N,) softmaxed attribute scores
    (attribute_utils.get_softmaxed).  Returns a Scorer so callers can
    route the weights through their own jit boundaries as arguments."""
    from transeditor_tpu.edit.classifiers import Scorer
    net = CelebAHQAttributeClassifier()

    def score(p, img):
        logit = net.apply(p, box_downsample_256(img))
        return jax.nn.softmax(jnp.stack([logit, -logit], -1), axis=-1)[:, 1]

    return Scorer(score, params)


def port_celebahq_classifier(sd: Dict[str, np.ndarray],
                             resolution: int = 256) -> Dict[str, Any]:
    """torch D state dict (fixed_size, use_mbstd=False) -> our params."""
    def conv(prefix):
        return {"weight": np.ascontiguousarray(np.transpose(
                    sd[f"{prefix}.conv.weight"], (2, 3, 1, 0))),
                "bias": sd[f"{prefix}.wscale.b"]}

    def dense(prefix):
        return {"weight": np.ascontiguousarray(
                    sd[f"{prefix}.linear.weight"].T),
                "bias": sd[f"{prefix}.wscale.b"]}

    p: Dict[str, Any] = {"fromrgb": conv("fromrgb_lod0.conv")}
    log2res = int(math.log2(resolution))
    for res in range(log2res, 2, -1):
        name = f"{2 ** res}x{2 ** res}"
        p[f"block_{2 ** res}_conv0"] = conv(f"{name}.conv0")
        p[f"block_{2 ** res}_conv1"] = conv(f"{name}.conv1")
    p["pred_conv"] = conv("4x4.conv")
    p["pred_dense0"] = dense("4x4.dense0")
    p["pred_dense1"] = dense("4x4.dense1")
    return {"params": p}
