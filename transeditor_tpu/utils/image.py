"""Image grid / PNG helpers (the save_image / make_image analogues,
reference ``utils/editing_utils.py:8-19`` and torchvision save_image
usage at train_spatial_query.py:352-359)."""

from __future__ import annotations

import math

import numpy as np


def to_uint8(img: np.ndarray) -> np.ndarray:
    """[-1,1] float NHWC -> uint8 NHWC."""
    img = np.asarray(img, dtype=np.float32)
    return np.clip((img + 1.0) * 127.5 + 0.5, 0, 255).astype(np.uint8)


def make_grid(imgs: np.ndarray, nrow: int = 8, pad: int = 2,
              normalize_range=(-1.0, 1.0)) -> np.ndarray:
    """Tile [N,H,W,3] into one uint8 grid image."""
    lo, hi = normalize_range
    x = (np.asarray(imgs, np.float32) - lo) / (hi - lo)
    x = np.clip(x, 0, 1)
    n, h, w, c = x.shape
    ncol = nrow
    nrow_ = math.ceil(n / ncol)
    grid = np.ones((nrow_ * (h + pad) + pad, ncol * (w + pad) + pad, c),
                   np.float32)
    for i in range(n):
        r, col = divmod(i, ncol)
        y0 = pad + r * (h + pad)
        x0 = pad + col * (w + pad)
        grid[y0:y0 + h, x0:x0 + w] = x[i]
    return (grid * 255 + 0.5).astype(np.uint8)


def save_png(path: str, img_uint8: np.ndarray) -> None:
    from PIL import Image
    Image.fromarray(img_uint8).save(path)


def colorize_heatmap(x: np.ndarray, upscale: int = 16) -> np.ndarray:
    """[H,W] scores -> uint8 RGB viridis-ish heatmap (the attention
    similarity plots, reference train_spatial_query.py:114-122)."""
    x = np.asarray(x, np.float32)
    x = (x - x.min()) / max(x.max() - x.min(), 1e-12)
    # compact 3-anchor colormap: dark blue -> green -> yellow
    anchors = np.asarray([[68, 1, 84], [33, 145, 140], [253, 231, 37]],
                         np.float32)
    t = x * 2.0
    lo = np.clip(np.floor(t).astype(int), 0, 1)
    frac = (t - lo)[..., None]
    rgb = anchors[lo] * (1 - frac) + anchors[lo + 1] * frac
    img = rgb.astype(np.uint8)
    if upscale > 1:
        img = np.repeat(np.repeat(img, upscale, 0), upscale, 1)
    return img
