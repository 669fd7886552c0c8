"""ResNet-18 feature trunk (torchvision layout) in Flax.

Used by the pose classifier (reference
``our_interfaceGAN/ffhq_utils/dex/models.py:74-89``: resnet18 minus the
final fc, + Linear(512, n_class) + softmax).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax


def _bn(x, train=False, name="bn"):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=x.dtype, name=name)(x)


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    train: bool = False

    @nn.compact
    def __call__(self, x):
        identity = x
        y = nn.Conv(self.features, (3, 3), (self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=x.dtype, name="conv1")(x)
        y = _bn(y, self.train, "bn1")
        y = jax.nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=x.dtype, name="conv2")(y)
        y = _bn(y, self.train, "bn2")
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = nn.Conv(self.features, (1, 1),
                               (self.stride, self.stride), use_bias=False,
                               dtype=x.dtype, name="down_conv")(x)
            identity = _bn(identity, self.train, "down_bn")
        return jax.nn.relu(y + identity)


class ResNet18Features(nn.Module):
    """conv1..layer4 + global avg pool -> [B, 512]."""

    train: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=x.dtype, name="conv1")(x)
        x = _bn(x, self.train, "bn1")
        x = jax.nn.relu(x)
        x = lax.reduce_window(x, -jnp.inf, lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1),
                              ((0, 0), (1, 1), (1, 1), (0, 0)))
        plan = [(64, 1), (64, 1), (128, 2), (128, 1),
                (256, 2), (256, 1), (512, 2), (512, 1)]
        for i, (f, s) in enumerate(plan):
            x = BasicBlock(f, s, self.train, name=f"block{i}")(x)
        return jnp.mean(x, axis=(1, 2))
