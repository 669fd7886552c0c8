"""Classic convnet backbones (Flax, NHWC) + torch-state-dict porters.

These are inference feature extractors backing the metric/loss stack:
  * AlexNet  — LPIPS diversity metric (reference metrics/lpips.py:49-98)
    and the richzhang 'net-lin alex' LPIPS.
  * VGG16    — richzhang 'net-lin vgg' LPIPS (projector loss,
    reference projector_optimization.py:142-144), PRDC fc7 features
    (metrics/calc_prdc.py:99-122), DEX classifier trunk.
  * VGG19    — the (dead-code) VGGLoss in the reference model file.

Weight porting: torchvision layouts ([O,I,kh,kw] convs, [out,in]
linears) -> HWIO/[in,out]; see ``port_torch_sequential``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax


def conv2d(x, w, b=None, stride=1, padding=0):
    y = lax.conv_general_dilated(
        x, w, (stride, stride),
        ((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        y = y + b
    return y


def adaptive_avg_pool_2d(x, out_hw=(7, 7)):
    """torch.nn.AdaptiveAvgPool2d semantics, NHWC, static shapes:
    output cell i averages input rows floor(i*n/out)..ceil((i+1)*n/out)-1.
    Expressed as two small matmuls so XLA maps it onto the MXU."""
    if x.shape[1] < 1 or x.shape[2] < 1:
        raise ValueError(
            f"adaptive_avg_pool_2d got an empty spatial map {x.shape} "
            f"(input image too small for an upstream crop?)")

    def pool_matrix(n_in, n_out):
        m = np.zeros((n_out, n_in), np.float32)
        for i in range(n_out):
            a = (i * n_in) // n_out
            b = -((-(i + 1) * n_in) // n_out)   # ceil
            m[i, a:b] = 1.0 / (b - a)
        return jnp.asarray(m, x.dtype)   # preserve the compute dtype

    mh = pool_matrix(x.shape[1], out_hw[0])
    mw = pool_matrix(x.shape[2], out_hw[1])
    x = jnp.einsum("oh,bhwc->bowc", mh, x)
    return jnp.einsum("pw,bowc->bopc", mw, x)


def max_pool(x, window=3, stride=2, padding=0):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, window, window, 1),
        (1, stride, stride, 1),
        ((0, 0), (padding, padding), (padding, padding), (0, 0)))


class AlexNetFeatures(nn.Module):
    """torchvision AlexNet `.features`, returning the five relu taps
    used by LPIPS (relu1..relu5)."""

    @nn.compact
    def __call__(self, x) -> List[jax.Array]:
        taps = []

        def cv(name, feats, k, stride, pad, inp):
            w = self.param(f"{name}_w", nn.initializers.normal(0.1),
                           (k, k, inp.shape[-1], feats))
            b = self.param(f"{name}_b", nn.initializers.zeros, (feats,))
            return jax.nn.relu(conv2d(inp, w, b, stride, pad))

        x = cv("conv1", 64, 11, 4, 2, x); taps.append(x)
        x = max_pool(x)
        x = cv("conv2", 192, 5, 1, 2, x); taps.append(x)
        x = max_pool(x)
        x = cv("conv3", 384, 3, 1, 1, x); taps.append(x)
        x = cv("conv4", 256, 3, 1, 1, x); taps.append(x)
        x = cv("conv5", 256, 3, 1, 1, x); taps.append(x)
        return taps


# VGG configurations: channel list with 'M' = maxpool(2,2).
VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512, "M"]
VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
             512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
# relu indices (0-based position among conv layers) to tap for LPIPS:
VGG16_TAPS = (1, 3, 6, 9, 12)    # relu1_2, 2_2, 3_3, 4_3, 5_3
# VGGLoss slice boundaries (model_spatial_query.py:28-37): relu after
# conv1_1, conv2_1, conv3_1, conv4_1, conv5_1
VGG19_TAPS = (0, 2, 4, 8, 12)


class VGGFeatures(nn.Module):
    """VGG16/19 `.features` with configurable relu taps.

    ``tap_after_pool``: include the pre-tap maxpools exactly as the
    sequential index order dictates.
    """

    cfg: Tuple = tuple(VGG16_CFG)
    taps: Tuple[int, ...] = VGG16_TAPS

    @nn.compact
    def __call__(self, x) -> List[jax.Array]:
        out = []
        conv_idx = 0
        for item in self.cfg:
            if item == "M":
                x = max_pool(x, 2, 2, 0)
                continue
            w = self.param(f"conv{conv_idx}_w",
                           nn.initializers.normal(0.1),
                           (3, 3, x.shape[-1], item))
            b = self.param(f"conv{conv_idx}_b", nn.initializers.zeros,
                           (item,))
            x = jax.nn.relu(conv2d(x, w, b, 1, 1))
            if conv_idx in self.taps:
                out.append(x)
            conv_idx += 1
        return out


class VGG16Fc7(nn.Module):
    """torchvision VGG16 through classifier fc7 (4096-d ReLU features)
    — the PRDC feature space (reference metrics/calc_prdc.py:99-122)."""

    @nn.compact
    def __call__(self, x) -> jax.Array:
        conv_idx = 0
        for item in VGG16_CFG:
            if item == "M":
                x = max_pool(x, 2, 2, 0)
                continue
            w = self.param(f"conv{conv_idx}_w",
                           nn.initializers.normal(0.1),
                           (3, 3, x.shape[-1], item))
            b = self.param(f"conv{conv_idx}_b", nn.initializers.zeros,
                           (item,))
            x = jax.nn.relu(conv2d(x, w, b, 1, 1))
            conv_idx += 1
        # adaptive avg pool to 7x7, exactly torchvision's AvgPool —
        # the PRDC protocol feeds 256px images, so this is the live
        # 8x8 -> 7x7 path, not just a 224px no-op
        if x.shape[1] != 7 or x.shape[2] != 7:
            x = adaptive_avg_pool_2d(x, (7, 7))
        b0 = x.shape[0]
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(b0, -1)  # channel-major
        fc6_w = self.param("fc6_w", nn.initializers.normal(0.01),
                           (x.shape[-1], 4096))
        fc6_b = self.param("fc6_b", nn.initializers.zeros, (4096,))
        x = jax.nn.relu(x @ fc6_w + fc6_b)
        fc7_w = self.param("fc7_w", nn.initializers.normal(0.01),
                           (4096, 4096))
        fc7_b = self.param("fc7_b", nn.initializers.zeros, (4096,))
        return jax.nn.relu(x @ fc7_w + fc7_b)


def port_vgg16_fc7(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """torchvision vgg16 state dict -> VGG16Fc7 params."""
    params = port_torch_sequential(
        sd, "features.", [f"conv{i}" for i in range(13)])
    params["fc6_w"] = np.ascontiguousarray(sd["classifier.0.weight"].T)
    params["fc6_b"] = sd["classifier.0.bias"]
    params["fc7_w"] = np.ascontiguousarray(sd["classifier.3.weight"].T)
    params["fc7_b"] = sd["classifier.3.bias"]
    return {"params": params}


def vgg19_perceptual_loss(feats_apply, params, x, y, weights=None):
    """The reference's VGGLoss (model_spatial_query.py:52-72): weighted
    L1 over VGG19 relu taps of ImageNet-normalised inputs."""
    weights = weights or [1 / 32, 1 / 16, 1 / 8, 1 / 4, 1.0]
    mean = jnp.asarray([0.485, 0.456, 0.406])
    std = jnp.asarray([0.229, 0.224, 0.225])

    def norm(t):
        t = t * 0.5 + 0.5              # [-1,1] -> [0,1]
        t = t * 0.5 + 0.5              # the reference double-shifts (:68)
        return (t - mean) / jnp.sqrt(std + 1e-5)

    fx = feats_apply(params, norm(x))
    fy = feats_apply(params, norm(y))
    loss = 0.0
    for w, a, b in zip(weights, fx, fy):
        loss = loss + w * jnp.mean(jnp.abs(a - jax.lax.stop_gradient(b)))
    return loss


def port_torch_sequential(sd: Dict[str, np.ndarray], layer_prefix: str,
                          names: Sequence[str]) -> Dict[str, np.ndarray]:
    """Port torchvision Sequential conv weights.

    ``names`` maps our param basenames (e.g. 'conv1') in order onto the
    torch Sequential's conv indices found in ``sd``.
    """
    conv_indices = sorted(
        {int(k[len(layer_prefix):].split(".")[0])
         for k in sd if k.startswith(layer_prefix)
         and k.endswith(".weight")
         and sd[k].ndim == 4})
    out = {}
    for name, idx in zip(names, conv_indices):
        w = sd[f"{layer_prefix}{idx}.weight"]
        b = sd[f"{layer_prefix}{idx}.bias"]
        out[f"{name}_w"] = np.ascontiguousarray(
            np.transpose(w, (2, 3, 1, 0)))
        out[f"{name}_b"] = b
    return out


def port_alexnet(sd: Dict[str, np.ndarray],
                 prefix: str = "features.") -> Dict[str, Any]:
    return {"params": port_torch_sequential(
        sd, prefix, ["conv1", "conv2", "conv3", "conv4", "conv5"])}


def port_vgg(sd: Dict[str, np.ndarray], n_convs: int,
             prefix: str = "features.") -> Dict[str, Any]:
    return {"params": port_torch_sequential(
        sd, prefix, [f"conv{i}" for i in range(n_convs)])}
