import numpy as np
import pytest

from transeditor_tpu.data.dataset import ArraySource, make_train_iterator
from transeditor_tpu.edit.boundary import linear_interpolate, train_boundary
from transeditor_tpu.utils.image import make_grid, to_uint8


def test_train_boundary_recovers_direction():
    rng = np.random.RandomState(0)
    direction = np.zeros(16, np.float32)
    direction[3] = 1.0
    latents = rng.randn(2000, 16).astype(np.float32)
    scores = latents @ direction + 0.05 * rng.randn(2000)
    b = train_boundary(latents, scores, chosen_ratio=0.1, verbose=False)
    assert b.shape == (1, 16)
    np.testing.assert_allclose(np.linalg.norm(b), 1.0, rtol=1e-5)
    assert abs(float(b[0] @ direction)) > 0.95


def test_linear_interpolate_2d_recenters():
    lat = np.ones((1, 8), np.float32)
    b = np.zeros((1, 8), np.float32)
    b[0, 0] = 1.0
    out = linear_interpolate(lat, b, -2.0, 2.0, steps=5)
    assert out.shape == (5, 8)
    # projections onto boundary should BE the requested distances
    np.testing.assert_allclose(out @ b.T, [[-2], [-1], [0], [1], [2]],
                               atol=1e-5)


def test_linear_interpolate_3d_relative():
    lat = np.zeros((1, 4, 8), np.float32)
    b = np.zeros((1, 8), np.float32)
    b[0, 1] = 1.0
    out = linear_interpolate(lat, b, 0.0, 3.0, steps=4)
    assert out.shape == (4, 4, 8)
    np.testing.assert_allclose(out[:, 0, 1], [0, 1, 2, 3], atol=1e-5)
    np.testing.assert_allclose(out[:, 2, 1], [0, 1, 2, 3], atol=1e-5)


def test_train_iterator_shapes_and_sharding():
    # image i is the constant value 10*i so indices are recoverable
    data = np.stack([np.full((8, 8, 3), 10 * i, np.uint8)
                     for i in range(10)])
    src = ArraySource(data)
    it0 = make_train_iterator(src, 4, 8, host_index=0, host_count=2,
                              shuffle=False, flip=False)
    b = next(it0)
    assert b.shape == (4, 8, 8, 3)
    assert b.min() >= -1.0 and b.max() <= 1.0
    # host 0 sees only even indices when unshuffled
    idx = np.round((b[:, 0, 0, 0] + 1.0) * 127.5 / 10).astype(int)
    assert set(idx.tolist()) <= {0, 2, 4, 6, 8}


def test_grid_roundtrip():
    imgs = np.zeros((4, 8, 8, 3), np.float32)
    g = make_grid(imgs, nrow=2)
    assert g.shape == ((8 + 2) * 2 + 2, (8 + 2) * 2 + 2, 3)
    u = to_uint8(imgs)
    assert u.dtype == np.uint8 and u[0, 0, 0, 0] == 128
