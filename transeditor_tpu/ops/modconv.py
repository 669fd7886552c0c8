"""StyleGAN2 modulated convolution, TPU-style.

Reference: ``ModulatedConv2d.forward``
(``/root/reference/model_spatial_query.py:296-337``) builds a separate
weight tensor per sample (``batch*out_ch`` filters) and runs a grouped
conv with ``groups=batch``.  That trick exists because cuDNN has no
per-sample weight scaling; on TPU it would materialise a [B,O,I,k,k]
tensor every step and defeat XLA's conv tiling.

Here we use the algebraic identity (exact, conv is linear in both
operands):

    conv(x, scale * w * s_in)[b,o] * demod[b,o]
      == demod[b,o] * scale * conv(x * s_in[b], w)[b,o]

so the MXU sees ONE ordinary batched convolution with shared weights,
and the modulation/demodulation are rank-1 scalings fused into the
surrounding elementwise ops by XLA.  ``demod`` itself reduces to a
single [B,I]x[I,O] matmul over the squared weights.

All images are NHWC; weights are HWIO ([kh, kw, in, out]).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from transeditor_tpu.ops.precision import conv_precision
from transeditor_tpu.ops.resample import blur


def _conv(x, w, *, stride=1, padding=0, transpose=False):
    """Plain NHWC/HWIO conv; transpose=True gives stride-2 conv_transpose
    semantics (padding=0) as used at model_spatial_query.py:318."""
    if transpose:
        kh, kw = w.shape[0], w.shape[1]
        return lax.conv_general_dilated(
            x, jnp.flip(w, (0, 1)),
            window_strides=(1, 1),
            padding=((kh - 1, kh - 1), (kw - 1, kw - 1)),
            lhs_dilation=(stride, stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=conv_precision(x.dtype),
        )
    return lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=conv_precision(x.dtype),
    )


def modulated_conv2d_up_fused(
    x: jax.Array,
    weight: jax.Array,
    style: jax.Array,
    bias: Optional[jax.Array] = None,
    activate: bool = False,
    demodulate: bool = True,
    blur_kernel: Sequence[int] = (1, 3, 3, 1),
    eps: float = 1e-8,
    quantize: Optional[str] = None,
) -> jax.Array:
    """Upsampling modulated conv with the post-conv chain
    (blur -> demod -> bias -> leaky) fused into ONE Pallas pass when the
    layout allows (ops/pallas_blur.py); exact fallback otherwise.

    demod commutes with the per-channel FIR, so demod-after-blur here
    equals the reference's demod-before-blur ordering exactly.
    """
    from transeditor_tpu.ops import pallas_blur
    from transeditor_tpu.ops.act import fused_leaky_relu

    kh, kw, in_ch, out_ch = weight.shape
    scale = 1.0 / math.sqrt(in_ch * kh * kw)
    dtype = x.dtype
    style32 = style.astype(jnp.float32)
    w32 = weight.astype(jnp.float32)

    demod = None
    if demodulate:
        wsq = jnp.sum(w32 * w32, axis=(0, 1))
        demod = lax.rsqrt((scale * scale) * ((style32 * style32) @ wsq)
                          + eps).astype(dtype)

    if quantize == "int8":
        from transeditor_tpu.ops.quant import quantized_conv
        xs = x * style32.astype(dtype)[:, None, None, :]
        out = quantized_conv(xs, w32 * scale, dtype, stride=2,
                             transpose=True)
    else:
        w = (w32 * scale).astype(dtype)
        xs = x * style32.astype(dtype)[:, None, None, :]
        out = _conv(xs, w, stride=2, transpose=True)

    k = len(blur_kernel)
    p = (k - 2) - (kh - 1)
    pad = ((p + 1) // 2 + 1, p // 2 + 1)

    if (k == 4 and pallas_blur.platform_ok()
            and pallas_blur.supports(out.shape, pad)):
        k1 = np.asarray(blur_kernel, np.float64)
        taps = tuple((k1 / k1.sum() * 2.0).tolist())   # per-axis up gain
        return pallas_blur.fused_blur4(out, taps, pad, scale=demod,
                                       bias=bias, act=activate)

    # fallback: the unfused exact chain
    if demod is not None:
        out = out * demod[:, None, None, :]
    out = blur(out, blur_kernel, pad=pad, upsample_factor=2)
    if bias is not None or activate:
        out = fused_leaky_relu(out, bias) if activate else \
            out + bias.astype(out.dtype)
    return out


def modulated_conv2d(
    x: jax.Array,
    weight: jax.Array,
    style: jax.Array,
    *,
    demodulate: bool = True,
    upsample: bool = False,
    downsample: bool = False,
    blur_kernel: Sequence[int] = (1, 3, 3, 1),
    eps: float = 1e-8,
    quantize: Optional[str] = None,
) -> jax.Array:
    """Modulated (optionally demodulated / resampling) conv.

    Args:
      x: [B, H, W, I] input features (NHWC).
      weight: [kh, kw, I, O] shared filter (HWIO), unit-variance init.
      style: [B, I] per-sample input-channel scales (the output of the
        modulation EqualLinear, bias_init=1).
      demodulate: apply the rsqrt(sum w^2) output normalisation.
      upsample / downsample: stride-2 resampling with the StyleGAN2 FIR
        blur placement (model_spatial_query.py:262-276,310-329).

    Returns:
      [B, H', W', O].
    """
    kh, kw, in_ch, out_ch = weight.shape
    fan_in = in_ch * kh * kw
    scale = 1.0 / math.sqrt(fan_in)

    dtype = x.dtype
    style = style.astype(jnp.float32)
    w32 = weight.astype(jnp.float32)

    if demodulate:
        # demod[b,o] = rsqrt(sum_{k,i} (scale*w*s)^2 + 1e-8)
        #            = rsqrt(scale^2 * (s^2 @ wsq) + 1e-8)
        wsq = jnp.sum(w32 * w32, axis=(0, 1))          # [I, O]
        ssq = style * style                            # [B, I]
        demod = lax.rsqrt(
            (scale * scale) * (ssq @ wsq) + eps)       # [B, O]
        demod = demod.astype(dtype)

    w = (w32 * scale).astype(dtype)
    xs = x * style.astype(dtype)[:, None, None, :]

    if quantize == "int8":
        from transeditor_tpu.ops.quant import quantized_conv
        ws = w32 * scale
        conv = lambda inp, **kw: quantized_conv(inp, ws, dtype, **kw)
    else:
        conv = lambda inp, **kw: _conv(inp, w, **kw)

    if upsample:
        out = conv(xs, stride=2, transpose=True)
        if demodulate:
            out = out * demod[:, None, None, :]
        k = len(blur_kernel)
        p = (k - 2) - (kh - 1)
        pad = ((p + 1) // 2 + 1, p // 2 + 1)
        out = blur(out, blur_kernel, pad=pad, upsample_factor=2)
    elif downsample:
        k = len(blur_kernel)
        p = (k - 2) + (kh - 1)
        pad = ((p + 1) // 2, p // 2)
        xb = blur(xs, blur_kernel, pad=pad)
        out = conv(xb, stride=2, padding=0)
        if demodulate:
            out = out * demod[:, None, None, :]
    else:
        out = conv(xs, padding=kh // 2)
        if demodulate:
            out = out * demod[:, None, None, :]

    return out
