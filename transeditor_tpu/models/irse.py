"""IR-SE ResNet backbones (ArcFace-style) in Flax.

Reference: ``pSp/models/encoders/helpers.py`` (bottleneck_IR_SE
:98-120, get_blocks :30-54) and ``pSp/models/model_irse.py`` — used by
the pSp dual-space encoder (trunk) and the ArcFace ID loss.

NHWC; BatchNorm carries running stats in the 'batch_stats' collection
(torch momentum 0.1 == flax momentum 0.9); PReLU is per-channel.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


BLOCK_SPECS = {
    50: [(64, 64, 3), (64, 128, 4), (128, 256, 14), (256, 512, 3)],
    100: [(64, 64, 3), (64, 128, 13), (128, 256, 30), (256, 512, 3)],
    152: [(64, 64, 3), (64, 128, 8), (128, 256, 36), (256, 512, 3)],
}


def unit_list(num_layers: int) -> List[Tuple[int, int, int]]:
    """Flatten block specs to (in_ch, depth, stride) units."""
    units = []
    for in_ch, depth, n in BLOCK_SPECS[num_layers]:
        units.append((in_ch, depth, 2))
        units.extend((depth, depth, 1) for _ in range(n - 1))
    return units


class PReLU(nn.Module):
    """Per-channel PReLU (torch PReLU(num_parameters=C), init 0.25)."""

    @nn.compact
    def __call__(self, x):
        a = self.param("alpha",
                       lambda k, s: jnp.full(s, 0.25, jnp.float32),
                       (x.shape[-1],))
        a = a.astype(x.dtype)
        return jnp.where(x >= 0, x, a * x)


class BatchNorm(nn.Module):
    """torch-equivalent BatchNorm2d/1d (eps 1e-5, momentum 0.1)."""

    use_running_average: bool = True

    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(use_running_average=self.use_running_average,
                            momentum=0.9, epsilon=1e-5,
                            dtype=x.dtype, name="bn")(x)


def _conv(x, features, kernel, stride=1, padding=0, name=None, parent=None):
    raise NotImplementedError  # convs are declared inline below


class Conv(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (self.kernel, self.kernel),
                       strides=(self.stride, self.stride),
                       padding=[(self.padding, self.padding)] * 2,
                       use_bias=self.use_bias, dtype=x.dtype,
                       name="conv")(x)


class SEModule(nn.Module):
    """Squeeze-excitation (helpers.py:57-73)."""

    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = Conv(c // self.reduction, 1, name="fc1")(s)
        s = jax.nn.relu(s)
        s = Conv(c, 1, name="fc2")(s)
        return x * jax.nn.sigmoid(s)


class BottleneckIRSE(nn.Module):
    """bottleneck_IR / bottleneck_IR_SE (helpers.py:76-120)."""

    depth: int
    stride: int
    use_se: bool = True
    train: bool = False

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        if in_ch == self.depth:
            shortcut = x[:, ::self.stride, ::self.stride, :]  # MaxPool2d(1,s)
        else:
            shortcut = Conv(self.depth, 1, self.stride,
                            name="shortcut_conv")(x)
            shortcut = BatchNorm(not self.train, name="shortcut_bn")(shortcut)

        r = BatchNorm(not self.train, name="res_bn1")(x)
        r = Conv(self.depth, 3, 1, 1, name="res_conv1")(r)
        r = PReLU(name="res_prelu")(r)
        r = Conv(self.depth, 3, self.stride, 1, name="res_conv2")(r)
        r = BatchNorm(not self.train, name="res_bn2")(r)
        if self.use_se:
            r = SEModule(name="se")(r)
        return r + shortcut


class IRSEBackbone(nn.Module):
    """The shared trunk: input layer + flattened bottleneck body.

    Returns the tap activations at body indices ``taps`` plus the final
    body output (pSp taps 6/20/23, psp_encoders_new.py:109-117).
    """

    num_layers: int = 50
    mode: str = "ir_se"
    taps: Sequence[int] = (6, 20, 23)
    train: bool = False

    @nn.compact
    def __call__(self, x):
        x = Conv(64, 3, 1, 1, name="input_conv")(x)
        x = BatchNorm(not self.train, name="input_bn")(x)
        x = PReLU(name="input_prelu")(x)

        outs = {}
        for i, (in_ch, depth, stride) in enumerate(unit_list(self.num_layers)):
            x = BottleneckIRSE(depth, stride,
                               use_se=(self.mode == "ir_se"),
                               train=self.train, name=f"body_{i}")(x)
            if i in self.taps:
                outs[i] = x
        return [outs[i] for i in self.taps], x


class ArcFaceBackbone(nn.Module):
    """Full recognition net: trunk + (BN, flatten, linear, BN) head ->
    l2-normalised 512-d embedding (pSp/models/model_irse.py)."""

    num_layers: int = 50
    mode: str = "ir_se"
    train: bool = False

    @nn.compact
    def __call__(self, x):
        _, x = IRSEBackbone(self.num_layers, self.mode, taps=(),
                            train=self.train, name="trunk")(x)
        x = BatchNorm(not self.train, name="out_bn1")(x)
        # flatten channel-major to match the torch Linear's weight layout
        b = x.shape[0]
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, -1)
        x = nn.Dense(512, dtype=x.dtype, name="out_linear")(x)
        x = nn.BatchNorm(use_running_average=not self.train, momentum=0.9,
                         epsilon=1e-5, use_scale=True, use_bias=True,
                         dtype=x.dtype, name="out_bn2")(x)
        norm = jnp.linalg.norm(x, axis=1, keepdims=True)
        return x / jnp.maximum(norm, 1e-12)
