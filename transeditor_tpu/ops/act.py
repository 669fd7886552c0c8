"""Fused bias + LeakyReLU activation.

Reference: the CUDA ``fused_bias_act`` kernel
(``/root/reference/utils/op/fused_bias_act_kernel.cu:36-45``) computes
``leaky_relu(x + b, 0.2) * sqrt(2)`` with a hand-written double-backward
graph (``utils/op/fused_act.py:18-69``).

On TPU this is a pure VPU elementwise chain that XLA fuses into the
producing matmul/conv for free, and ``jax.grad(jax.grad(...))`` derives
both backward passes — so the TPU-native implementation is simply the
math.  (A Pallas version would only add dispatch overhead; the win the
CUDA kernel buys on GPU — avoiding extra HBM round-trips — XLA's fusion
already provides.)
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_SQRT2 = math.sqrt(2.0)


def fused_leaky_relu(
    x: jax.Array,
    bias: jax.Array | None = None,
    negative_slope: float = 0.2,
    scale: float = _SQRT2,
    axis: int = -1,
) -> jax.Array:
    """``leaky_relu(x + bias, slope) * scale`` with bias broadcast on ``axis``.

    The reference broadcasts the bias over dim 1 of an NCHW tensor
    (``fused_bias_act_kernel.cu:69-71``); our canonical layouts put the
    channel last, hence ``axis=-1`` by default.
    """
    if bias is not None:
        shape = [1] * x.ndim
        shape[axis] = bias.shape[0]
        x = x + bias.astype(x.dtype).reshape(shape)
    return jax.nn.leaky_relu(x, negative_slope) * jnp.asarray(scale, x.dtype)


def scaled_leaky_relu(x: jax.Array, negative_slope: float = 0.2) -> jax.Array:
    """Bias-free variant (model_spatial_query.py:229-238)."""
    return jax.nn.leaky_relu(x, negative_slope) * jnp.asarray(_SQRT2, x.dtype)
