"""Modulated conv vs. a torch-CPU oracle implementing the reference's
grouped-conv-with-per-sample-weights formulation
(model_spatial_query.py:296-337), written independently from the spec.
"""

import math

import numpy as np
import pytest
import jax.numpy as jnp

from transeditor_tpu.ops import modulated_conv2d

torch = pytest.importorskip("torch")
F = torch.nn.functional


def modconv_torch(x, w, s, demodulate, upsample=False, downsample=False,
                  blur_k=(1, 3, 3, 1)):
    """Oracle. x [B,I,H,W], w [O,I,kh,kw], s [B,I] (post-modulation)."""
    b, in_ch, h, wd = x.shape
    out_ch, _, kh, kw = w.shape
    scale = 1.0 / math.sqrt(in_ch * kh * kw)

    weight = scale * w[None] * s[:, None, :, None, None]   # [B,O,I,kh,kw]
    if demodulate:
        demod = torch.rsqrt(weight.pow(2).sum([2, 3, 4]) + 1e-8)
        weight = weight * demod[:, :, None, None, None]

    if upsample:
        wt = weight.transpose(1, 2).reshape(b * in_ch, out_ch, kh, kw)
        xg = x.reshape(1, b * in_ch, h, wd)
        out = F.conv_transpose2d(xg, wt, stride=2, padding=0, groups=b)
        out = out.reshape(b, out_ch, out.shape[-2], out.shape[-1])
        out = _blur_torch(out, blur_k, up_factor=2,
                          pad=_up_blur_pad(len(blur_k), kh))
    elif downsample:
        x = _blur_torch(x, blur_k, pad=_down_blur_pad(len(blur_k), kh))
        xg = x.reshape(1, b * in_ch, x.shape[-2], x.shape[-1])
        out = F.conv2d(xg, weight.reshape(b * out_ch, in_ch, kh, kw),
                       stride=2, padding=0, groups=b)
        out = out.reshape(b, out_ch, out.shape[-2], out.shape[-1])
    else:
        xg = x.reshape(1, b * in_ch, h, wd)
        out = F.conv2d(xg, weight.reshape(b * out_ch, in_ch, kh, kw),
                       padding=kh // 2, groups=b)
        out = out.reshape(b, out_ch, h, wd)
    return out


def _up_blur_pad(klen, ksize):
    p = (klen - 2) - (ksize - 1)
    return ((p + 1) // 2 + 1, p // 2 + 1)


def _down_blur_pad(klen, ksize):
    p = (klen - 2) + (ksize - 1)
    return ((p + 1) // 2, p // 2)


def _blur_torch(x, k1, pad, up_factor=1):
    k = torch.tensor(k1, dtype=torch.float64)
    k = torch.outer(k, k)
    k = k / k.sum()
    if up_factor > 1:
        k = k * up_factor ** 2
    b, c, h, w = x.shape
    x = F.pad(x, (pad[0], pad[1], pad[0], pad[1]))
    kf = torch.flip(k, (0, 1)).reshape(1, 1, *k.shape).repeat(c, 1, 1, 1)
    return F.conv2d(x, kf.to(x.dtype), groups=c)


@pytest.mark.parametrize("mode", ["plain", "up", "down"])
@pytest.mark.parametrize("demod", [True, False])
def test_modconv_vs_oracle(mode, demod):
    rng = np.random.RandomState(1)
    b, in_ch, out_ch, k, h = 2, 8, 16, 3, 8
    if mode == "plain" and not demod:
        k = 1  # exercise the ToRGB configuration
    x = rng.randn(b, h, h, in_ch).astype(np.float32)
    w = rng.randn(k, k, in_ch, out_ch).astype(np.float32)
    s = (1 + 0.1 * rng.randn(b, in_ch)).astype(np.float32)

    got = np.asarray(modulated_conv2d(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(s),
        demodulate=demod,
        upsample=(mode == "up"), downsample=(mode == "down")))

    xt = torch.tensor(x.transpose(0, 3, 1, 2), dtype=torch.float64)
    wt = torch.tensor(w.transpose(3, 2, 0, 1), dtype=torch.float64)
    st = torch.tensor(s, dtype=torch.float64)
    want = modconv_torch(xt, wt, st, demod,
                         upsample=(mode == "up"),
                         downsample=(mode == "down"))
    want = want.numpy().transpose(0, 2, 3, 1)

    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
