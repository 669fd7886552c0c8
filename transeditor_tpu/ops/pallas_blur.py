"""Pallas TPU kernel: fused separable FIR blur + conv epilogue.

Motivation (same-process A/B on v5e, batch 256, 256px generator):
the post-upsample FIR blur + demodulation + bias + leaky-relu chain
costs ~20% of sampling time when expressed as a depthwise conv plus
elementwise passes (1515 img/s vs a 1906 img/s no-blur ceiling).  This
kernel performs, in ONE pass over VMEM-resident tiles:

    y = leaky_relu( FIR4x4(x) * demod[b,c] + bias[c] ) * sqrt(2)

where FIR4x4 is the separable 4-tap blur (true convolution, 'valid'
over a pre-padded input).  The demod scale commutes with the
per-channel spatial FIR, so folding it here is exact.

Implementation notes:
  * rows are tiled; the 3-row halo comes from a SECOND BlockSpec view
    of the same input shifted one row-tile down (manual inter-memory
    DMA from a pl.ANY ref hard-crashes this TPU worker, so the kernel
    sticks to pipelined VMEM blocks);
  * the input is pre-padded so the shifted view never leaves bounds;
  * layout contract: NHWC, C % 128 == 0, square output with
    power-of-two height (every synthesis level qualifies).  Fallback to
    the conv path otherwise (see ops/modconv.py call site).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT2 = math.sqrt(2.0)


def _kernel(xa_ref, xb_ref, scale_ref, bias_ref, out_ref,
            *, taps, tr, wp, act, has_scale, has_bias):
    # rows r*tr .. r*tr+tr+3 of the padded input: the tr-row main block
    # plus the first 3 rows of the 4-row halo view
    block = jnp.concatenate([xa_ref[0], xb_ref[0][:3]], axis=0)
    # compute in the input dtype (bf16 in the serving path): the 4-tap
    # weighted sums lose <2^-8 relative — below the pipeline's own
    # bf16 noise — and halve VMEM temporaries
    rows = (taps[0] * block[0:tr] + taps[1] * block[1:tr + 1]
            + taps[2] * block[2:tr + 2] + taps[3] * block[3:tr + 3])
    wo = wp - 3
    y = (taps[0] * rows[:, 0:wo] + taps[1] * rows[:, 1:wo + 1]
         + taps[2] * rows[:, 2:wo + 2] + taps[3] * rows[:, 3:wo + 3])

    if has_scale:
        y = y * scale_ref[0, 0, :][None, None, :]
    if has_bias:
        y = y + bias_ref[0, :][None, None, :]
    if act:
        # max/min form: Mosaic v5e rejects bf16 compares (arith.cmpf)
        y = (jnp.maximum(y, 0) + jnp.asarray(0.2, y.dtype)
             * jnp.minimum(y, 0)) * jnp.asarray(_SQRT2, y.dtype)
    out_ref[0] = y.astype(out_ref.dtype)


@functools.lru_cache(maxsize=1)
def platform_ok() -> bool:
    """Opt-in (TEIO_PALLAS=1): measured on a v5e, the whole-generator
    throughput with this kernel is LOWER than XLA's depthwise-conv blur
    (883-977 img/s vs 1537 at batch 256) — the standalone custom call
    defeats XLA's producer/consumer fusion and pipelining around the
    blur, which outweighs the pass it saves.  The kernel is kept as
    validated infrastructure (exact vs the conv oracle at 1e-6 on
    hardware) for revisiting with a fused-transpose-conv formulation.
    """
    import os
    if not os.environ.get("TEIO_PALLAS"):
        return False
    try:
        return jax.devices()[0].platform in ("tpu",)
    except Exception:
        return False


def supports(x_shape, pad) -> bool:
    """Layout contract check for the fused kernel."""
    _, h, w, cch = x_shape
    hp = h + pad[0] + pad[1]
    ho = hp - 3
    return (cch % 128 == 0 and ho >= 8 and (ho & (ho - 1)) == 0
            and ho == (w + pad[0] + pad[1] - 3))


@functools.partial(jax.jit, static_argnames=("taps", "pad", "act",
                                             "interpret"))
def fused_blur4(x: jax.Array, taps: tuple, pad: tuple = (1, 1),
                scale: Optional[jax.Array] = None,
                bias: Optional[jax.Array] = None,
                act: bool = False, interpret: bool = False) -> jax.Array:
    """Fused FIR4 blur + optional demod scale [B,C] + bias [C] + lrelu.

    taps: 4 static per-axis filter taps (already normalised/gained).
    pad: symmetric spatial pre-pad (p0, p1) as in upfirdn2d.
    """
    assert len(taps) == 4
    b, h, w, cch = x.shape
    p0, p1 = pad
    hp, wp = h + p0 + p1, w + p0 + p1
    ho, wo = hp - 3, wp - 3
    tr = min(16, ho)   # row tile; halo arrives via a 4-row second view
    assert ho % tr == 0 and cch % 128 == 0
    n_row_tiles = ho // tr
    # pad rows to ho+4 so the 4-row halo view of the last tile is in
    # bounds (base padded height is ho+3)
    xp = jnp.pad(x, ((0, 0), (p0, p1 + 1), (p0, p1), (0, 0)))

    # true convolution == correlate with flipped taps
    tf = tuple(float(t) for t in taps[::-1])

    has_scale = scale is not None
    has_bias = bias is not None
    scale_in = (scale if has_scale
                else jnp.zeros((b, cch), x.dtype)).astype(x.dtype)
    bias_in = (bias if has_bias
               else jnp.zeros((cch,), x.dtype)).astype(x.dtype)

    grid = (b, n_row_tiles, cch // 128)
    kernel = functools.partial(_kernel, taps=tf, tr=tr, wp=wp, act=act,
                               has_scale=has_scale, has_bias=has_bias)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tr, wp, 128),
                         lambda b_, r_, c_: (b_, r_, 0, c_),
                         memory_space=pltpu.VMEM),          # rows tile
            pl.BlockSpec((1, 4, wp, 128),
                         lambda b_, r_, c_, tr_=tr: (b_, (r_ + 1) * tr_ // 4,
                                                     0, c_),
                         memory_space=pltpu.VMEM),          # 4-row halo
            pl.BlockSpec((1, 1, 128), lambda b_, r_, c_: (b_, 0, c_),
                         memory_space=pltpu.VMEM),          # scale
            pl.BlockSpec((1, 128), lambda b_, r_, c_: (0, c_),
                         memory_space=pltpu.VMEM),          # bias
        ],
        out_specs=pl.BlockSpec((1, tr, wo, 128),
                               lambda b_, r_, c_: (b_, r_, 0, c_),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ho, wo, cch), x.dtype),
        interpret=interpret,
    )(xp, xp, scale_in.reshape(b, 1, cch), bias_in.reshape(1, cch))
