"""Pallas fused blur kernel vs the conv-path oracle (interpret mode)."""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from transeditor_tpu.ops.pallas_blur import fused_blur4, supports
from transeditor_tpu.ops.resample import make_resample_kernel, upfirdn2d

TAPS = tuple((np.asarray([1., 3., 3., 1.]) / 8.0 * 2.0).tolist())  # up gain


def _oracle(x, taps, pad, scale=None, bias=None, act=False):
    k2d = jnp.asarray(np.outer(taps, taps), jnp.float32)
    y = upfirdn2d(x, k2d, up=1, down=1, pad=pad)
    if scale is not None:
        y = y * scale[:, None, None, :]
    if bias is not None:
        y = y + bias
    if act:
        y = jnp.where(y >= 0, y, 0.2 * y) * math.sqrt(2)
    return y


def test_supports():
    assert supports((2, 9, 9, 128), (1, 1))       # post-up-conv shape
    assert not supports((2, 9, 9, 64), (1, 1))    # C not 128-multiple
    assert not supports((2, 10, 9, 128), (1, 1))  # non-square output


@pytest.mark.parametrize("h,c", [(9, 128), (17, 256), (33, 128)])
def test_fused_blur_matches_oracle(h, c):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, h, h, c).astype(np.float32))
    got = fused_blur4(x, TAPS, (1, 1), interpret=True)
    want = _oracle(x, np.asarray(TAPS), (1, 1))
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_blur_epilogue():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 9, 9, 128).astype(np.float32))
    scale = jnp.asarray(rng.rand(2, 128).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(128).astype(np.float32))
    got = fused_blur4(x, TAPS, (1, 1), scale=scale, bias=bias, act=True,
                      interpret=True)
    want = _oracle(x, np.asarray(TAPS), (1, 1), scale, bias, act=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_fused_blur_row_tiling():
    """h big enough to span multiple 64-row tiles."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 129, 129, 128).astype(np.float32))
    got = fused_blur4(x, TAPS, (1, 1), interpret=True)
    want = _oracle(x, np.asarray(TAPS), (1, 1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
