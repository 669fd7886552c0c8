"""Int8 quantization for the synthesis convs — EXPERIMENTAL, opt-in.

Motivation: v5e int8 MXU peak is 2x bf16 (394 vs 197 TOP/s) and the
sampling path is MXU-bound (~45 GMAC/img, bf16 ceiling ~87% of
roofline).  MEASURED RESULT (2026-08, single v5e via axon, whole
256px generator, batch 256): **int8 is 0.85x bf16** — XLA does not
lower ``lax.conv_general_dilated`` with int8 operands to the
double-rate MXU mode on this stack (microbench: int8 matmul == bf16
matmul rate), so the quant/dequant overhead is pure loss.
Follow-up microbench (4096^3 matmul, same chip): XLA int8
``dot_general`` = 1.05x bf16 FLOP rate; a tiled **Pallas** int8 matmul
(int32 accum, exact-match vs XLA) = 0.66x bf16 — Mosaic does not emit
the double-rate int8 MXU mode either.  The 394-TOPS path is unreachable
from this toolchain entirely, closing the avenue at every level
(conv / matmul x XLA / Pallas).  Quality:
~28 dB PSNR vs f32 (13 quantized convs, random weights).  The mode is
kept behind ``ModelConfig.quantize='int8'`` for future toolchains
where the int8 conv path is real; do not enable it for parity work.

Design (if/when the backend cooperates):

  * weights: symmetric per-OUTPUT-CHANNEL int8, quantized on the fly
    from the f32 master weights (they are tiny next to activations and
    XLA constant-folds the quantization when weights are compile-time
    constants; as runtime args it is one cheap elementwise pass);
  * activations: symmetric dynamic per-SAMPLE int8 — the modulation
    ``x * s_in[b]`` makes per-sample ranges heterogeneous, so a single
    per-tensor scale would waste range.  amax is a cheap fused reduce;
    the int8 cast also HALVES the conv's HBM read traffic;
  * accumulation in int32 (``preferred_element_type``), dequantized by
    the rank-1 factor ``sx[b] * sw[o]`` which XLA fuses into the conv
    epilogue alongside StyleGAN2's demodulation (itself a rank-1 scale
    — the two multiply into one).

There is no reference analogue (the CUDA reference is fp32-only).
Quality is pinned by tests/test_quant.py (int8-vs-f32 PSNR on the
full generator); the bench always reports the bf16 (full-quality)
number.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def quantize_weight_per_oc(w: jax.Array):
    """[kh, kw, I, O] f32 -> (int8 weights, f32 scale[O]).

    Symmetric per-output-channel: sw[o] = amax(|w[..., o]|)/127.
    """
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=(0, 1, 2))
    sw = jnp.maximum(amax, 1e-12) / 127.0
    wq = jnp.clip(jnp.round(w32 / sw), -127, 127).astype(jnp.int8)
    return wq, sw


def quantize_act_per_sample(x: jax.Array):
    """[B, H, W, C] -> (int8, f32 scale[B]) with per-sample amax."""
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=(1, 2, 3))
    sx = jnp.maximum(amax, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(x32 / sx[:, None, None, None]),
                  -127, 127).astype(jnp.int8)
    return xq, sx


def conv2d_int8(
    xq: jax.Array,
    wq: jax.Array,
    *,
    stride: int = 1,
    padding: int = 0,
    transpose: bool = False,
) -> jax.Array:
    """Int8 NHWC/HWIO conv accumulating in int32.

    ``transpose=True`` gives the stride-2 conv_transpose semantics used
    by the upsample modconv (lhs_dilation + full pad of the flipped
    kernel), mirroring ops/modconv.py::_conv.
    """
    if transpose:
        kh, kw = wq.shape[0], wq.shape[1]
        return lax.conv_general_dilated(
            xq, jnp.flip(wq, (0, 1)),
            window_strides=(1, 1),
            padding=((kh - 1, kh - 1), (kw - 1, kw - 1)),
            lhs_dilation=(stride, stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
    return lax.conv_general_dilated(
        xq, wq,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def quantized_conv(
    xs: jax.Array,
    weight_scaled: jax.Array,
    out_dtype,
    *,
    stride: int = 1,
    padding: int = 0,
    transpose: bool = False,
) -> jax.Array:
    """Quantized core of a modulated conv: quantize(xs) ⊛
    quantize(weight) -> dequantized ``out_dtype``.

    ``xs`` is the already style-modulated input (x * s_in[b]);
    ``weight_scaled`` already carries the equalized-lr runtime scale
    (scale * w — a scalar that folds exactly into the per-channel
    weight scales, so quantization sees it for free).  Demodulation /
    bias / activation stay with the caller in ops/modconv.py so the
    surrounding math is IDENTICAL to the bf16 path.
    """
    wq, sw = quantize_weight_per_oc(weight_scaled)
    xq, sx = quantize_act_per_sample(xs)
    acc = conv2d_int8(xq, wq, stride=stride, padding=padding,
                      transpose=transpose)
    deq = sx[:, None, None, None] * sw[None, None, None, :]
    return (acc.astype(jnp.float32) * deq).astype(out_dtype)
