"""Golden tests for upfirdn2d against an independent NumPy oracle.

The oracle implements the documented semantics of the reference CUDA
kernel (upsample-by-zero-stuffing, pad, true convolution, decimate;
``/root/reference/utils/op/upfirdn2d.py:101-102`` out-size formula)
directly with numpy loops/scipy — written from the spec, not the code.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from transeditor_tpu.ops import (
    blur,
    downsample_2d,
    make_resample_kernel,
    upfirdn2d,
    upsample_2d,
)


def upfirdn2d_numpy(x, k, up, down, pad):
    """Oracle: x [N,H,W,C], k [kh,kw], scalar up/down, pad (p0,p1)."""
    n, h, w, c = x.shape
    kh, kw = k.shape
    p0, p1 = pad

    # 1) zero-stuff: each sample followed by (up-1) zeros.
    ups = np.zeros((n, h * up, w * up, c), dtype=np.float64)
    ups[:, ::up, ::up, :] = x

    # 2) pad (negative = crop).
    hh, ww = h * up, w * up
    padded = np.zeros((n, hh + p0 + p1, ww + p0 + p1, c), dtype=np.float64)
    src = ups[:, max(-p0, 0):hh - max(-p1, 0), max(-p0, 0):ww - max(-p1, 0), :]
    padded[:, max(p0, 0):max(p0, 0) + src.shape[1],
           max(p0, 0):max(p0, 0) + src.shape[2], :] = src

    # 3) true convolution (flip kernel, correlate), valid mode.
    out_h = padded.shape[1] - kh + 1
    out_w = padded.shape[2] - kw + 1
    kf = k[::-1, ::-1]
    out = np.zeros((n, out_h, out_w, c), dtype=np.float64)
    for i in range(kh):
        for j in range(kw):
            out += kf[i, j] * padded[:, i:i + out_h, j:j + out_w, :]

    # 4) decimate.
    return out[:, ::down, ::down, :]


@pytest.mark.parametrize("up,down,pad", [
    (1, 1, (0, 0)),
    (1, 1, (2, 1)),
    (2, 1, (2, 1)),     # Upsample(kernel=[1,3,3,1], factor=2) pads
    (1, 2, (1, 1)),     # Downsample pads
    (1, 1, (1, 1)),
    (2, 1, (1, 1)),
    (1, 2, (2, 2)),
    (1, 1, (-1, 2)),    # negative pad (crop)
    (2, 2, (1, 1)),
])
def test_upfirdn2d_matches_oracle(up, down, pad):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 8, 3).astype(np.float32)
    k = np.asarray(make_resample_kernel([1, 3, 3, 1]))

    got = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(k),
                               up=up, down=down, pad=pad))
    want = upfirdn2d_numpy(x, np.asarray(k, np.float64), up, down, pad)

    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_out_size_formula():
    # out = (in*up + p0 + p1 - k) // down + 1  (upfirdn2d.py:101-102)
    x = jnp.zeros((1, 16, 16, 1))
    k = make_resample_kernel([1, 3, 3, 1])
    y = upfirdn2d(x, k, up=2, down=1, pad=(2, 1))
    assert y.shape[1] == (16 * 2 + 2 + 1 - 4) // 1 + 1 == 32
    y = upfirdn2d(x, k, up=1, down=2, pad=(1, 1))
    assert y.shape[1] == (16 + 2 - 4) // 2 + 1 == 8


def test_upsample_downsample_shapes_and_mass():
    x = jnp.ones((1, 8, 8, 2))
    up = upsample_2d(x)
    assert up.shape == (1, 16, 16, 2)
    # kernel has gain factor^2 and unit DC: interior values stay ~1.
    np.testing.assert_allclose(np.asarray(up)[0, 4:12, 4:12, 0], 1.0,
                               atol=1e-5)
    down = downsample_2d(x)
    assert down.shape == (1, 4, 4, 2)
    np.testing.assert_allclose(np.asarray(down)[0, 1:3, 1:3, 0], 1.0,
                               atol=1e-5)


def test_blur_identity_dc():
    x = jnp.ones((1, 8, 8, 1))
    y = blur(x, pad=(2, 1))
    assert y.shape == (1, 8, 8, 1)


def test_second_order_grad():
    """R1/path-reg differentiate through upfirdn2d twice
    (train_spatial_query.py:77-105); grad-of-grad must compile."""
    k = make_resample_kernel([1, 3, 3, 1])

    def f(x):
        return jnp.sum(upfirdn2d(x, k, up=2, down=1, pad=(2, 1)) ** 3)

    x = jnp.ones((1, 4, 4, 1)) * 0.5
    g2 = jax.grad(lambda x: jnp.sum(jax.grad(f)(x) ** 2))(x)
    assert np.isfinite(np.asarray(g2)).all()


@pytest.mark.parametrize("up,down,pad,gain", [
    (1, 1, (2, 1), 1.0),
    (2, 1, (2, 1), 2.0),     # upsample config (gain 2 per axis)
    (1, 2, (1, 1), 1.0),     # downsample config
    (1, 1, (1, 1), 1.0),
    (1, 1, (-1, 2), 1.0),
])
def test_separable_matches_conv_path(up, down, pad, gain):
    """The 1-D-taps fast path must equal the 2-D depthwise-conv path."""
    rng = np.random.RandomState(3)
    x = rng.randn(2, 10, 10, 3).astype(np.float32)
    k1 = np.asarray([1.0, 3.0, 3.0, 1.0])
    taps = jnp.asarray(k1 / k1.sum() * gain, jnp.float32)
    k2d = jnp.asarray(np.outer(k1, k1) / k1.sum() ** 2 * gain ** 2,
                      jnp.float32)
    fast = np.asarray(upfirdn2d(jnp.asarray(x), taps, up=up, down=down,
                                pad=pad))
    ref = np.asarray(upfirdn2d(jnp.asarray(x), k2d, up=up, down=down,
                               pad=pad))
    assert fast.shape == ref.shape
    np.testing.assert_allclose(fast, ref, rtol=1e-5, atol=1e-5)


def test_separable_second_order_grad():
    taps = jnp.asarray([0.25, 0.5, 0.25])

    def f(x):
        return jnp.sum(upfirdn2d(x, taps, up=2, down=1, pad=(1, 1)) ** 3)

    x = jnp.ones((1, 4, 4, 1)) * 0.5
    g2 = jax.grad(lambda x: jnp.sum(jax.grad(f)(x) ** 2))(x)
    assert np.isfinite(np.asarray(g2)).all()


@pytest.mark.parametrize("impl", ["matmul", "2pass", "shiftadd", "none"])
def test_blur_impl_variants_match_conv(impl):
    """Every `set_blur_impl` lowering must equal the default conv blur
    ('none' is the ablation identity — shape contract only).  These are
    the perf-probe alternates (README journal / docs/perf)."""
    from transeditor_tpu.ops import resample as R

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 12, 12, 8).astype(np.float32))
    for pad, gain in [((2, 1), 2), ((1, 1), 1)]:
        want = R.blur(x, (1, 3, 3, 1), pad=pad, upsample_factor=gain)
        R.set_blur_impl(impl)
        try:
            got = R.blur(x, (1, 3, 3, 1), pad=pad, upsample_factor=gain)
        finally:
            R.set_blur_impl("conv")
        assert got.shape == want.shape
        if impl != "none":
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("up,down,pad", [
    (1, 1, (2, 1)), (2, 1, (2, 1)), (1, 2, (1, 1)), (2, 2, (3, 0)),
])
def test_linear_call_adjoint_matches_autodiff(up, down, pad):
    """The explicit-transpose path (jax.linear_call + the reference's
    swapped-pad rule, utils/op/upfirdn2d.py:30-43) must produce the
    same vjp / grad-of-grad as jax's own conv transpose (the traced
    fallback).  This is what lets the 8-device GSPMD partition stay
    free of rev/reshape resharding (flagship_mesh_compile_r4)."""
    from transeditor_tpu.ops import resample as R
    if R._linear_call is None:
        pytest.skip("linear_call unavailable")
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 6, 6, 4).astype(np.float32))
    k2d = np.asarray(R.make_resample_kernel((1, 3, 3, 1)))
    padt = (pad[0], pad[1], pad[0], pad[1])

    def f_lin(x):
        return R._upfirdn2d_linear(x, k2d, (up, up), (down, down), padt)

    def f_ref(x):
        c = x.shape[-1]
        k = jnp.tile(jnp.flip(jnp.asarray(k2d), (0, 1))[:, :, None, None],
                     (1, 1, 1, c))
        return R._depthwise_conv_raw(x, k, (up, up), (down, down), padt)

    np.testing.assert_allclose(np.asarray(f_lin(x)), np.asarray(f_ref(x)),
                               rtol=1e-6, atol=1e-6)
    ct = jnp.asarray(rng.randn(*f_lin(x).shape).astype(np.float32))
    g_lin = jax.vjp(f_lin, x)[1](ct)[0]
    g_ref = jax.vjp(f_ref, x)[1](ct)[0]
    np.testing.assert_allclose(np.asarray(g_lin), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-6)
    # grad-of-grad (the R1 / path-reg composition)
    def gg(f):
        return jax.grad(lambda x: jnp.sum(jax.grad(
            lambda x: jnp.sum(f(x) ** 2))(x) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gg(f_lin)), np.asarray(gg(f_ref)),
                               rtol=1e-4, atol=1e-5)
