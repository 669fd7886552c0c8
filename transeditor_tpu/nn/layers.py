"""Equalized-learning-rate building blocks (Flax Linen).

These mirror the math of the reference blocks in
``/root/reference/model_spatial_query.py`` (EqualLinear :194-226,
EqualConv2d :156-191, PixelNorm :75-81, ModulatedConv2d :241-337,
StyledConv :367-403, ToRGB :406-425) but are organised for TPU:

  * the 16 independent per-token mapping MLPs
    (model_spatial_query.py:626-646 — a Python loop over 16 separate
    ``nn.Linear`` calls in the reference) are ONE stacked einsum so the
    MXU sees a single [B,T,C]x[T,C,D] batched matmul;
  * token tensors are [batch, tokens, features]; images are NHWC.

Weights are float32; compute dtype is configurable per call site.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from transeditor_tpu.ops.act import fused_leaky_relu
from transeditor_tpu.ops.precision import conv_precision
from transeditor_tpu.ops.modconv import (modulated_conv2d,
                                           modulated_conv2d_up_fused)
from transeditor_tpu.ops.resample import blur, upsample_2d


def pixel_norm(x: jax.Array, axis: int = -1, eps: float = 1e-8) -> jax.Array:
    """x * rsqrt(mean(x^2, axis) + 1e-8)  (model_spatial_query.py:75-81)."""
    x32 = x.astype(jnp.float32)
    out = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=axis, keepdims=True)
                              + eps)
    return out.astype(x.dtype)


def layer_norm_tokens(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the LAST TWO dims jointly, no affine.

    The reference normalizes with ``F.layer_norm(x, x.size()[1:])``
    (model_spatial_query.py:924,931) — i.e. over tokens AND channels
    together, which is nonstandard and must be replicated exactly.
    """
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(-2, -1), keepdims=True)
    var = jnp.var(x32, axis=(-2, -1), keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class EqualLinear(nn.Module):
    """Linear with runtime weight scale (lr_mul / sqrt(fan_in)).

    Matches model_spatial_query.py:194-226: weight ~ N(0,1)/lr_mul,
    effective weight = weight * lr_mul/sqrt(in); bias scaled by lr_mul.
    ``activation='fused_lrelu'`` applies bias inside the activation.
    """

    features: int
    lr_mul: float = 1.0
    bias: bool = True
    bias_init: float = 0.0
    activation: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_dim = x.shape[-1]
        kernel = self.param(
            "kernel",
            lambda key, shape: jax.random.normal(key, shape) / self.lr_mul,
            (in_dim, self.features))
        scale = self.lr_mul / math.sqrt(in_dim)
        y = jnp.dot(x.astype(self.dtype),
                    (kernel * scale).astype(self.dtype))
        b = None
        if self.bias:
            b = self.param(
                "bias",
                lambda key, shape: jnp.full(shape, self.bias_init,
                                            jnp.float32),
                (self.features,))
        if self.activation == "fused_lrelu":
            return fused_leaky_relu(
                y, None if b is None else b * self.lr_mul)
        if b is not None:
            y = y + (b * self.lr_mul).astype(y.dtype)
        return y


class TokenMapping(nn.Module):
    """Per-token mapping network (the Z+/P+ "plus space" map).

    Reference (model_spatial_query.py:547-566,626-646): shared
    PixelNorm, then token *i* passes through its OWN
    EqualLinear(512,512, lr_mul=0.01, fused_lrelu) — depth 1 per token,
    16 independent layers.  Here: one stacked parameter
    [tokens, in, out] and a single einsum.

    ``n_mapping`` (= 16 / num_region, reference :462) is the number of
    mapping layers that actually exist.  The reference forward fills a
    zeros buffer and only writes tokens 0..n_mapping-1 (:630-634), so
    with num_region > 1 the tail tokens of the mapped code are EXACTLY
    zero — replicated here by padding, not by extra layers.
    """

    n_tokens: int
    features: int
    lr_mul: float = 0.01
    pixel_norm_axis: str = "feature"   # 'feature' => dim over channels
    dtype: jnp.dtype = jnp.float32
    n_mapping: Optional[int] = None    # defaults to n_tokens

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: [B, T, C]
        in_dim = x.shape[-1]
        n_map = self.n_mapping if self.n_mapping is not None else self.n_tokens
        # Reference layout is [B, C, T] with pixel_norm_op_dim=1 ==
        # feature axis; in [B, T, C] that's the last axis.
        axis = -1 if self.pixel_norm_axis == "feature" else -2
        x = pixel_norm(x, axis=axis)

        kernel = self.param(
            "kernel",
            lambda key, shape: jax.random.normal(key, shape) / self.lr_mul,
            (n_map, in_dim, self.features))
        bias = self.param("bias", nn.initializers.zeros,
                          (n_map, self.features))
        scale = self.lr_mul / math.sqrt(in_dim)
        y = jnp.einsum("btc,tcd->btd", x[:, :n_map].astype(self.dtype),
                       (kernel * scale).astype(self.dtype))
        y = y + (bias * self.lr_mul).astype(y.dtype)[None]
        y = jax.nn.leaky_relu(y, 0.2) * jnp.asarray(math.sqrt(2), y.dtype)
        if n_map < self.n_tokens:
            y = jnp.pad(y, ((0, 0), (0, self.n_tokens - n_map), (0, 0)))
        return y


class EqualConv2d(nn.Module):
    """Conv with 1/sqrt(fan_in) runtime scale (model_spatial_query.py:156-191).

    NHWC / HWIO.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        k = self.kernel_size
        weight = self.param("weight", nn.initializers.normal(stddev=1.0),
                            (k, k, in_ch, self.features))
        scale = 1.0 / math.sqrt(in_ch * k * k)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), (weight * scale).astype(self.dtype),
            window_strides=(self.stride, self.stride),
            padding=((self.padding, self.padding),
                     (self.padding, self.padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=conv_precision(self.dtype))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(y.dtype)
        return y


class ModulatedConv2d(nn.Module):
    """Style-modulated conv (see ops/modconv.py for the TPU form).

    ``fused_bias``/``fused_act`` fold the follow-up bias + LeakyReLU
    into the conv's epilogue — on the upsample path this becomes one
    Pallas pass with the FIR blur and demodulation.
    """

    features: int
    kernel_size: int
    style_dim: int
    demodulate: bool = True
    upsample: bool = False
    downsample: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    dtype: jnp.dtype = jnp.float32
    quantize: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, style: jax.Array,
                 fused_bias: Optional[jax.Array] = None,
                 fused_act: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        k = self.kernel_size
        weight = self.param("weight", nn.initializers.normal(stddev=1.0),
                            (k, k, in_ch, self.features))
        s = EqualLinear(in_ch, bias_init=1.0, dtype=self.dtype,
                        name="modulation")(style)
        if self.upsample:
            return modulated_conv2d_up_fused(
                x.astype(self.dtype), weight, s, bias=fused_bias,
                activate=fused_act, demodulate=self.demodulate,
                blur_kernel=self.blur_kernel, quantize=self.quantize)
        out = modulated_conv2d(
            x.astype(self.dtype), weight, s,
            demodulate=self.demodulate,
            upsample=False, downsample=self.downsample,
            blur_kernel=self.blur_kernel, quantize=self.quantize)
        if fused_act:
            out = fused_leaky_relu(out, fused_bias)
        elif fused_bias is not None:
            out = out + fused_bias.astype(out.dtype)
        return out


class StyledConv(nn.Module):
    """ModulatedConv2d + (optional) noise + fused bias/LeakyReLU
    (model_spatial_query.py:367-403).  Noise injection is OFF by
    default in the reference training config (train flag
    ``--inject_noise``, default False)."""

    features: int
    kernel_size: int
    style_dim: int
    upsample: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    demodulate: bool = True
    noise_injection: bool = False
    dtype: jnp.dtype = jnp.float32
    quantize: Optional[str] = None

    @nn.compact
    def __call__(self, x, style, noise=None):
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        conv = ModulatedConv2d(
            self.features, self.kernel_size, self.style_dim,
            demodulate=self.demodulate, upsample=self.upsample,
            blur_kernel=self.blur_kernel, dtype=self.dtype,
            quantize=self.quantize, name="conv")
        if not self.noise_injection:
            # bias + lrelu fused into the conv epilogue (one Pallas pass
            # with the blur on the TPU upsample path)
            return conv(x, style, fused_bias=bias, fused_act=True)
        out = conv(x, style)
        nw = self.param("noise_weight", nn.initializers.zeros, ())
        if noise is None:
            key = self.make_rng("noise")
            b, h, w, _ = out.shape
            noise = jax.random.normal(key, (b, h, w, 1), out.dtype)
        out = out + nw.astype(out.dtype) * noise.astype(out.dtype)
        return fused_leaky_relu(out, bias)


class ToRGB(nn.Module):
    """1x1 modulated conv (demod off) + bias + upsampled skip
    (model_spatial_query.py:406-425)."""

    style_dim: int
    upsample: bool = True
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, style, skip=None):
        out = ModulatedConv2d(
            3, 1, self.style_dim, demodulate=False, dtype=self.dtype,
            name="conv")(x, style)
        bias = self.param("bias", nn.initializers.zeros, (3,))
        out = out + bias.astype(out.dtype)
        if skip is not None:
            skip = upsample_2d(skip, self.blur_kernel)
            out = out + skip
        return out


class ConvLayer(nn.Module):
    """Discriminator conv unit: [Blur +] EqualConv2d [+ FusedLReLU]
    (model_spatial_query.py:731-777)."""

    features: int
    kernel_size: int
    downsample: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    use_bias: bool = True
    activate: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.downsample:
            p = (len(self.blur_kernel) - 2) + (self.kernel_size - 1)
            x = blur(x, self.blur_kernel, pad=((p + 1) // 2, p // 2))
            stride, padding = 2, 0
        else:
            stride, padding = 1, self.kernel_size // 2
        x = EqualConv2d(
            self.features, self.kernel_size, stride=stride, padding=padding,
            use_bias=self.use_bias and not self.activate, dtype=self.dtype,
            name="conv")(x)
        if self.activate:
            if self.use_bias:
                bias = self.param("bias", nn.initializers.zeros,
                                  (self.features,))
                x = fused_leaky_relu(x, bias)
            else:
                x = fused_leaky_relu(x, None)
        return x
