"""pSp-style dual-space encoder + wrapper (Flax).

Reference: ``pSp/models/encoders/psp_encoders_new.py:11-140``
(GradualStyleEncoder: IR-SE-50 FPN trunk with taps at body indices
6/20/23; 14 style heads over three pyramid levels merged by
``adjust_style`` EqualLinear(14->16) into Z tokens; 16 spatial heads
off the coarsest map into P tokens) and ``pSp/models/psp_new.py:30-178``
(pSp wrapper: encoder + frozen TransEditor decoder, latent-average
offsets in the plus spaces).

Layout: images NHWC in [-1,1]; tokens [B, 16, 512].
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from transeditor_tpu.config import ModelConfig
from transeditor_tpu.models.generator import Generator
from transeditor_tpu.models.irse import Conv, IRSEBackbone
from transeditor_tpu.nn.layers import EqualLinear


def bilinear_align_corners(x: jax.Array, oh: int, ow: int) -> jax.Array:
    """Bilinear resize with align_corners=True (torch F.interpolate
    semantics used by the FPN merge, psp_encoders_new.py:100-101)."""
    b, h, w, c = x.shape
    ys = jnp.linspace(0.0, h - 1.0, oh)
    xs = jnp.linspace(0.0, w - 1.0, ow)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (ys - y0).astype(x.dtype)[None, :, None, None]
    wx = (xs - x0).astype(x.dtype)[None, None, :, None]
    rows = x[:, y0] * (1 - wy) + x[:, y1] * wy
    return rows[:, :, x0] * (1 - wx) + rows[:, :, x1] * wx


class GradualStyleBlock(nn.Module):
    """Strided conv stack + EqualLinear head -> one 512-d token
    (psp_encoders_new.py:11-32).  LeakyReLU slope 0.01 (torch default).
    """

    out_c: int = 512
    spatial: int = 16

    @nn.compact
    def __call__(self, x):
        num_pools = int(math.log2(self.spatial))
        for i in range(num_pools):
            x = nn.Conv(self.out_c, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], dtype=x.dtype,
                        name=f"conv{i}")(x)
            x = jax.nn.leaky_relu(x, 0.01)
        x = x.reshape(x.shape[0], -1)   # spatial collapsed to 1x1
        return EqualLinear(self.out_c, dtype=x.dtype, name="linear")(x)


class GradualStyleEncoder(nn.Module):
    """Image -> (Z tokens [B,16,512], P tokens [B,16,512])."""

    num_layers: int = 50
    mode: str = "ir_se"
    style_count: int = 14
    coarse_ind: int = 3
    middle_ind: int = 7
    spatial_count: int = 16
    train: bool = False

    @nn.compact
    def __call__(self, x) -> Tuple[jax.Array, jax.Array]:
        (c1, c2, c3), _ = IRSEBackbone(
            self.num_layers, self.mode, taps=(6, 20, 23),
            train=self.train, name="trunk")(x)

        def upsample_add(top, lateral):
            # bilinear, align_corners=True (psp_encoders_new.py:100-101)
            up = bilinear_align_corners(top, lateral.shape[1],
                                        lateral.shape[2])
            return up + lateral

        z_tokens = []
        for j in range(self.coarse_ind):
            z_tokens.append(GradualStyleBlock(512, 16,
                                              name=f"style_{j}")(c3))

        lat1 = Conv(512, 1, use_bias=True, name="latlayer1")(c2)
        p2 = upsample_add(c3, lat1)
        for j in range(self.coarse_ind, self.middle_ind):
            z_tokens.append(GradualStyleBlock(512, 32,
                                              name=f"style_{j}")(p2))

        lat2 = Conv(512, 1, use_bias=True, name="latlayer2")(c1)
        p1 = upsample_add(p2, lat2)
        for j in range(self.middle_ind, self.style_count):
            z_tokens.append(GradualStyleBlock(512, 64,
                                              name=f"style_{j}")(p1))

        z14 = jnp.stack(z_tokens, axis=1)             # [B, 14, 512]
        # adjust_style mixes 14 heads -> 16 tokens across the token axis
        z16 = EqualLinear(self.spatial_count, dtype=z14.dtype,
                          name="adjust_style")(jnp.swapaxes(z14, 1, 2))
        z_out = jnp.swapaxes(z16, 1, 2)               # [B, 16, 512]

        p_tokens = [GradualStyleBlock(512, 16, name=f"spatial_{j}")(c3)
                    for j in range(self.spatial_count)]
        p_out = jnp.stack(p_tokens, axis=1)           # [B, 16, 512]
        return z_out, p_out


class BackboneEncoderIntoW(nn.Module):
    """Secondary encoder: trunk -> global avg pool -> EqualLinear -> one
    512-d w vector (psp_encoders_new.py:143-173)."""

    num_layers: int = 50
    mode: str = "ir_se"
    train: bool = False

    @nn.compact
    def __call__(self, x):
        _, x = IRSEBackbone(self.num_layers, self.mode, taps=(),
                            train=self.train, name="trunk")(x)
        x = jnp.mean(x, axis=(1, 2))
        return EqualLinear(512, dtype=x.dtype, name="linear")(x)


class BackboneEncoderIntoWPlus(nn.Module):
    """Secondary encoder: trunk -> BN -> 7x7 pool -> Linear ->
    EqualLinear(512*18) -> [B, 18, 512] (psp_encoders_new.py:176-209)."""

    num_layers: int = 50
    mode: str = "ir_se"
    n_styles: int = 18
    train: bool = False

    @nn.compact
    def __call__(self, x):
        from transeditor_tpu.models.irse import BatchNorm
        _, x = IRSEBackbone(self.num_layers, self.mode, taps=(),
                            train=self.train, name="trunk")(x)
        x = BatchNorm(not self.train, name="out_bn")(x)
        # AdaptiveAvgPool2d((7,7)) exactly (psp_encoders_new.py:191) —
        # live path: the trunk emits 16x16 at 256px input
        if x.shape[1] != 7 or x.shape[2] != 7:
            from transeditor_tpu.zoo.backbones import adaptive_avg_pool_2d
            x = adaptive_avg_pool_2d(x, (7, 7))
        b = x.shape[0]
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, -1)
        x = nn.Dense(512, dtype=x.dtype, name="out_linear")(x)
        x = EqualLinear(512 * self.n_styles, dtype=x.dtype,
                        name="linear")(x)
        return x.reshape(b, self.n_styles, 512)


@dataclasses.dataclass
class PSPModel:
    """Encoder + frozen decoder bundle (the pSp wrapper,
    psp_new.py:30-178).

    ``latent_avg``: (z_avg, p_avg) plus-space averages added to encoder
    outputs when ``start_from_latent_avg`` (psp_new.py:101-107).
    """

    cfg: ModelConfig
    encoder: GradualStyleEncoder
    decoder: Generator
    start_from_latent_avg: bool = True

    @classmethod
    def create(cls, cfg: ModelConfig, train_encoder: bool = False):
        return cls(cfg=cfg,
                   encoder=GradualStyleEncoder(train=train_encoder),
                   decoder=Generator(cfg))

    def encode(self, enc_vars, images, latent_avg=None, train=False):
        out = self.encoder.apply(
            enc_vars, images,
            mutable=["batch_stats"] if train else False)
        (z, p), new_state = out if train else (out, None)
        if self.start_from_latent_avg and latent_avg is not None:
            z = z + latent_avg[0][None]
            p = p + latent_avg[1][None]
        return (z, p, new_state) if train else (z, p)

    def decode(self, dec_params, z, p, from_plus_space=True):
        out = self.decoder.apply(
            dec_params, z, p,
            map_z=not from_plus_space, map_p=not from_plus_space)
        return out.image

    def estimate_latent_avg(self, dec_params, key, n_samples: int = 10_000,
                            chunk: int = 1000):
        """Plus-space averages from mapped random draws
        (psp_new.py:137-178)."""
        from transeditor_tpu.utils.sampling import sample_zp

        # weight tree rides through jit as an ARGUMENT, not a closure
        # constant (numpy closures embed as HLO constants)
        dec_params = jax.tree.map(jnp.asarray, dec_params)

        @jax.jit
        def chunk_means(dp, k):
            z, p = sample_zp(k, chunk, self.cfg.n_tokens,
                             self.cfg.style_dim)
            zp, pp = self.decoder.apply(dp, z, p,
                                        method="map_codes")
            return jnp.sum(zp, 0), jnp.sum(pp, 0)

        zs = ps = 0.0
        n = n_samples // chunk
        for i in range(n):
            a, b = chunk_means(dec_params, jax.random.fold_in(key, i))
            zs, ps = zs + a, ps + b
        return zs / (n * chunk), ps / (n * chunk)
