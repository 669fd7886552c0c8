"""Fused upsample -> FIR filter -> downsample (``upfirdn2d``) for TPU.

Semantics match the reference CUDA kernel
(``/root/reference/utils/op/upfirdn2d_kernel.cu:52-137`` and the Python
wrapper ``utils/op/upfirdn2d.py:143-148``):

  1. zero-stuff the input by ``up`` (each sample followed by ``up-1``
     zeros, in both spatial dims),
  2. pad by ``pad[0]`` before / ``pad[1]`` after (negative pad crops),
  3. convolve (true convolution) with the 2-D FIR kernel,
  4. keep every ``down``-th output sample.

  out = (in * up + pad0 + pad1 - kernel) // down + 1       (each dim)

TPU-native design: instead of a hand-written tiled kernel, the whole
pipeline is ONE ``lax.conv_general_dilated`` call — input dilation does
the zero-stuffing, the conv padding does the (possibly negative)
padding, and the window stride does the down-sampling.  XLA lowers this
to the convolution units directly and fuses neighbouring elementwise
ops into it; autodiff (including the second order needed by R1 /
path-length regularisation) falls out of the conv transpose rules, so
no hand-written double-backward graph is required (the reference needs
``UpFirDn2dBackward`` with its swapped-pad trick,
``utils/op/upfirdn2d.py:17-140``).

Layout: images are NHWC (channel = TPU lane dim).  The FIR kernel is
shared across channels, expressed as a depthwise conv
(``feature_group_count = C``).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from transeditor_tpu.ops.precision import conv_precision


def make_resample_kernel(k: Sequence[float]) -> jnp.ndarray:
    """Build a normalized 2-D FIR kernel from a 1-D tap vector.

    Mirrors ``make_kernel`` (model_spatial_query.py:84-92): outer
    product of a 1-D kernel with itself, normalized to sum 1.
    """
    k = np.asarray(k, dtype=np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    k = k / k.sum()
    return jnp.asarray(k)


@functools.partial(jax.jit, static_argnames=("up", "down", "pad"))
def upfirdn2d(
    x: jax.Array,
    kernel: jax.Array,
    up: int = 1,
    down: int = 1,
    pad: tuple[int, int] = (0, 0),
) -> jax.Array:
    """Apply upfirdn to an NHWC tensor. ``pad`` may be negative.

    Args:
      x: [N, H, W, C] input.
      kernel: [kh, kw] FIR filter (float32).
      up / down: integer resampling factors (same in both dims).
      pad: (before, after) padding applied to both spatial dims.

    Returns:
      [N, H', W', C] with H' = (H*up + pad0 + pad1 - kh)//down + 1.
    """
    return _upfirdn2d_nhwc(x, kernel, (up, up), (down, down),
                           (pad[0], pad[1], pad[0], pad[1]))


def _upfirdn2d_nhwc(x, kernel, up, down, pad):
    up_y, up_x = up
    down_y, down_x = down
    pad_y0, pad_y1, pad_x0, pad_x1 = pad
    n, h, w, c = x.shape
    kh, kw = kernel.shape

    # lhs_dilation inserts zeros BETWEEN samples: (H-1)*up + 1 elements.
    # The reference zero-stuffs AFTER each sample: H*up elements, i.e.
    # (up-1) extra trailing zeros — fold them into the trailing pad.
    extra_y = up_y - 1
    extra_x = up_x - 1

    # True convolution == correlation with the spatially flipped kernel.
    k = jnp.flip(kernel, (0, 1)).astype(jnp.float32)
    # Depthwise: one shared filter per channel.  HWIO with I=1, O=C.
    k = jnp.tile(k[:, :, None, None], (1, 1, 1, c)).astype(x.dtype)

    out = lax.conv_general_dilated(
        x,
        k,
        window_strides=(down_y, down_x),
        padding=((pad_y0, pad_y1 + extra_y), (pad_x0, pad_x1 + extra_x)),
        lhs_dilation=(up_y, up_x),
        rhs_dilation=(1, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=conv_precision(x.dtype),
    )
    return out


def _upsample_pads(k_len: int, factor: int) -> tuple[int, int]:
    """Pad for Upsample (model_spatial_query.py:95-113)."""
    p = k_len - factor
    return ((p + 1) // 2 + factor - 1, p // 2)


def _downsample_pads(k_len: int, factor: int) -> tuple[int, int]:
    """Pad for Downsample (model_spatial_query.py:116-134)."""
    p = k_len - factor
    return ((p + 1) // 2, p // 2)


def upsample_2d(x, kernel_1d=(1, 3, 3, 1), factor: int = 2):
    """FIR upsample; kernel gain factor**2 (model_spatial_query.py:100)."""
    k1 = np.asarray(kernel_1d, dtype=np.float32)
    kernel = make_resample_kernel(k1) * (factor ** 2)
    pad = _upsample_pads(len(k1), factor)
    return upfirdn2d(x, kernel, up=factor, down=1, pad=pad)


def downsample_2d(x, kernel_1d=(1, 3, 3, 1), factor: int = 2):
    """FIR downsample (model_spatial_query.py:116-134)."""
    k1 = np.asarray(kernel_1d, dtype=np.float32)
    kernel = make_resample_kernel(k1)
    pad = _downsample_pads(len(k1), factor)
    return upfirdn2d(x, kernel, up=1, down=factor, pad=pad)


def blur(x, kernel_1d=(1, 3, 3, 1), pad=(0, 0), upsample_factor: int = 1):
    """Plain FIR blur with explicit pad (model_spatial_query.py:137-153)."""
    k1 = np.asarray(kernel_1d, dtype=np.float32)
    kernel = make_resample_kernel(k1)
    if upsample_factor > 1:
        kernel = kernel * (upsample_factor ** 2)
    return upfirdn2d(x, kernel, up=1, down=1, pad=pad)
