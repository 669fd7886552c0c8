"""StyleGAN2 discriminator (reference model_spatial_query.py:801-859).

NHWC throughout; minibatch-stddev uses group=min(batch, 4), feat=1
(:832-852).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from transeditor_tpu.config import ModelConfig
from transeditor_tpu.nn.layers import ConvLayer, EqualLinear


class ResBlock(nn.Module):
    """Residual down block (model_spatial_query.py:780-798)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        out = ConvLayer(in_ch, 3, dtype=self.dtype, name="conv1")(x)
        out = ConvLayer(self.features, 3, downsample=True, dtype=self.dtype,
                        name="conv2")(out)
        skip = ConvLayer(self.features, 1, downsample=True, use_bias=False,
                         activate=False, dtype=self.dtype, name="skip")(x)
        return (out + skip) * jnp.asarray(1 / math.sqrt(2), out.dtype)


def minibatch_stddev(x: jax.Array, group_size: int = 4,
                     num_features: int = 1) -> jax.Array:
    """Append the cross-sample stddev map (model_spatial_query.py:844-852)."""
    b, h, w, c = x.shape
    g = min(b, group_size)
    while b % g:          # largest divisor of b not above group_size
        g -= 1
    y = x.reshape(g, b // g, h, w, num_features, c // num_features)
    y = y.astype(jnp.float32)
    var = jnp.var(y, axis=0)          # biased, matches torch var(0, unbiased=False)
    std = jnp.sqrt(var + 1e-8)
    std = jnp.mean(std, axis=(1, 2, 4), keepdims=True)  # over H, W, channels
    std = jnp.squeeze(std, axis=4)    # [b//g, 1, 1, num_features]
    std = jnp.tile(std, (g, h, w, 1)).astype(x.dtype)
    return jnp.concatenate([x, std], axis=-1)


class Discriminator(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, img: jax.Array) -> jax.Array:
        cfg = self.cfg
        dtype = cfg.compute_dtype
        ch = cfg.channels
        x = img.astype(dtype)

        x = ConvLayer(ch[cfg.size], 1, dtype=dtype, name="from_rgb")(x)
        for i in range(cfg.log_size, 2, -1):
            x = ResBlock(ch[2 ** (i - 1)], dtype=dtype,
                         name=f"res_{i}")(x)

        x = minibatch_stddev(x)
        x = ConvLayer(ch[4], 3, dtype=dtype, name="final_conv")(x)

        b = x.shape[0]
        # reference flattens NCHW (channel-major): match the ordering so
        # ported checkpoints line up with final_linear's weights.
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, -1)
        x = EqualLinear(ch[4], activation="fused_lrelu", dtype=dtype,
                        name="final_linear_0")(x)
        x = EqualLinear(1, dtype=dtype, name="final_linear_1")(x)
        return x
