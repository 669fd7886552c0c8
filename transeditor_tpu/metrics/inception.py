"""InceptionV3 feature extractor for FID (Flax, NHWC, inference-only).

Reference: ``metrics/inception.py`` (pytorch-fid port of torchvision
inception_v3 with the FID-specific pooling quirks: 3x3 avg-pools with
count_include_pad=False in the InceptionA/C/E blocks and a MAX pool in
the final InceptionE block).  Output = pool3 features, 2048-d.

TPU-first choices:
  * inference only -> BatchNorm is folded into a per-channel
    scale/bias at weight-port time (mathematically exact), so the
    network is conv+bias+relu chains that XLA fuses;
  * NHWC layout; bilinear 299x299 resize via jax.image.

Weights: ported from the pytorch-fid checkpoint
(``pt_inception-2015-12-05-6726825d.pth``) with
``port_fid_inception_weights``; random init is available for tests.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax


def _conv(x, w, stride=(1, 1), padding=((0, 0), (0, 0))):
    return lax.conv_general_dilated(
        x, w, window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class ConvBN(nn.Module):
    """Conv (no bias) + folded-BN scale/bias + ReLU (BasicConv2d)."""

    features: int
    kernel: tuple
    stride: tuple = (1, 1)
    padding: tuple = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel
        w = self.param("weight", nn.initializers.normal(0.1),
                       (kh, kw, x.shape[-1], self.features))
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = _conv(x, w, self.stride, self.padding)
        return jax.nn.relu(y * scale + bias)


def max_pool_3x3_s2(x):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 3, 3, 1),
                             (1, 2, 2, 1), "VALID")


def max_pool_3x3_s1_p1(x):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 3, 3, 1),
                             (1, 1, 1, 1), ((0, 0), (1, 1), (1, 1), (0, 0)))


def avg_pool_3x3_s1_p1_nocountpad(x):
    """3x3 stride-1 avg pool, count_include_pad=False (the pytorch-fid
    patch to torchvision's blocks)."""
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    pad = ((0, 0), (1, 1), (1, 1), (0, 0))
    s = lax.reduce_window(x, 0.0, lax.add, (1, 3, 3, 1), (1, 1, 1, 1), pad)
    cnt = lax.reduce_window(ones, 0.0, lax.add, (1, 3, 3, 1),
                            (1, 1, 1, 1), pad)
    return s / cnt


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(64, (1, 1), name="branch1x1")(x)
        b5 = ConvBN(48, (1, 1), name="branch5x5_1")(x)
        b5 = ConvBN(64, (5, 5), padding=((2, 2), (2, 2)),
                    name="branch5x5_2")(b5)
        b3 = ConvBN(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = ConvBN(96, (3, 3), padding=((1, 1), (1, 1)),
                    name="branch3x3dbl_2")(b3)
        b3 = ConvBN(96, (3, 3), padding=((1, 1), (1, 1)),
                    name="branch3x3dbl_3")(b3)
        bp = avg_pool_3x3_s1_p1_nocountpad(x)
        bp = ConvBN(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(384, (3, 3), stride=(2, 2), name="branch3x3")(x)
        bd = ConvBN(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = ConvBN(96, (3, 3), padding=((1, 1), (1, 1)),
                    name="branch3x3dbl_2")(bd)
        bd = ConvBN(96, (3, 3), stride=(2, 2), name="branch3x3dbl_3")(bd)
        bp = max_pool_3x3_s2(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        p17 = ((0, 0), (3, 3))
        p71 = ((3, 3), (0, 0))
        b1 = ConvBN(192, (1, 1), name="branch1x1")(x)
        b7 = ConvBN(self.c7, (1, 1), name="branch7x7_1")(x)
        b7 = ConvBN(self.c7, (1, 7), padding=p17, name="branch7x7_2")(b7)
        b7 = ConvBN(192, (7, 1), padding=p71, name="branch7x7_3")(b7)
        bd = ConvBN(self.c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = ConvBN(self.c7, (7, 1), padding=p71, name="branch7x7dbl_2")(bd)
        bd = ConvBN(self.c7, (1, 7), padding=p17, name="branch7x7dbl_3")(bd)
        bd = ConvBN(self.c7, (7, 1), padding=p71, name="branch7x7dbl_4")(bd)
        bd = ConvBN(192, (1, 7), padding=p17, name="branch7x7dbl_5")(bd)
        bp = avg_pool_3x3_s1_p1_nocountpad(x)
        bp = ConvBN(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(192, (1, 1), name="branch3x3_1")(x)
        b3 = ConvBN(320, (3, 3), stride=(2, 2), name="branch3x3_2")(b3)
        b7 = ConvBN(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = ConvBN(192, (1, 7), padding=((0, 0), (3, 3)),
                    name="branch7x7x3_2")(b7)
        b7 = ConvBN(192, (7, 1), padding=((3, 3), (0, 0)),
                    name="branch7x7x3_3")(b7)
        b7 = ConvBN(192, (3, 3), stride=(2, 2), name="branch7x7x3_4")(b7)
        bp = max_pool_3x3_s2(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool: str = "avg"   # 'avg' for Mixed_7b, 'max' for Mixed_7c (FID)

    @nn.compact
    def __call__(self, x):
        p13 = ((0, 0), (1, 1))
        p31 = ((1, 1), (0, 0))
        b1 = ConvBN(320, (1, 1), name="branch1x1")(x)

        b3 = ConvBN(384, (1, 1), name="branch3x3_1")(x)
        b3a = ConvBN(384, (1, 3), padding=p13, name="branch3x3_2a")(b3)
        b3b = ConvBN(384, (3, 1), padding=p31, name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)

        bd = ConvBN(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = ConvBN(384, (3, 3), padding=((1, 1), (1, 1)),
                    name="branch3x3dbl_2")(bd)
        bda = ConvBN(384, (1, 3), padding=p13, name="branch3x3dbl_3a")(bd)
        bdb = ConvBN(384, (3, 1), padding=p31, name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)

        if self.pool == "max":
            bp = max_pool_3x3_s1_p1(x)
        else:
            bp = avg_pool_3x3_s1_p1_nocountpad(x)
        bp = ConvBN(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """[-1, 1] NHWC images (any HxW) -> 2048-d pool3 features."""

    resize_input: bool = True
    normalize_input: bool = False  # input already in [-1,1]

    @nn.compact
    def __call__(self, x):
        if self.resize_input:
            # F.interpolate(bilinear, align_corners=False), which does
            # not antialias even when downscaling (inception.py:147-150)
            x = jax.image.resize(
                x, (x.shape[0], 299, 299, x.shape[3]), "bilinear",
                antialias=False)
        if self.normalize_input:
            x = 2 * x - 1
        x = ConvBN(32, (3, 3), stride=(2, 2), name="Conv2d_1a_3x3")(x)
        x = ConvBN(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = ConvBN(64, (3, 3), padding=((1, 1), (1, 1)),
                   name="Conv2d_2b_3x3")(x)
        x = max_pool_3x3_s2(x)
        x = ConvBN(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = ConvBN(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = max_pool_3x3_s2(x)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", name="Mixed_7b")(x)
        x = InceptionE("max", name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))   # adaptive avg pool -> [N, 2048]


def port_fid_inception_weights(sd: Dict[str, np.ndarray],
                               bn_eps: float = 1e-3) -> Dict[str, Any]:
    """Map a pytorch-fid InceptionV3 state_dict to our param tree,
    folding each BatchNorm into (scale, bias)."""
    tree: Dict[str, Any] = {}
    convs = sorted({k.rsplit(".conv.weight", 1)[0]
                    for k in sd if k.endswith(".conv.weight")})
    for name in convs:
        w = sd[f"{name}.conv.weight"]             # [O,I,kh,kw]
        gamma = sd[f"{name}.bn.weight"]
        beta = sd[f"{name}.bn.bias"]
        mean = sd[f"{name}.bn.running_mean"]
        var = sd[f"{name}.bn.running_var"]
        scale = gamma / np.sqrt(var + bn_eps)
        bias = beta - mean * scale
        node: Dict[str, Any] = {
            "weight": np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0))),
            "scale": scale.astype(np.float32),
            "bias": bias.astype(np.float32),
        }
        # names like 'Mixed_5b.branch1x1' -> tree['Mixed_5b']['branch1x1']
        parts = name.split(".")
        cur = tree
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = node
    return {"params": tree}
