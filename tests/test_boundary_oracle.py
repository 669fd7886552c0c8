"""Output-equality oracles for the InterfaceGAN editing math.

The reference's boundary trainer and interpolator
(our_interfaceGAN/train_boundary.py:5-139, linear_interpolation.py:4-48)
are pure numpy/sklearn and import cleanly, so these are direct
same-inputs -> same-outputs checks.  For ``train_boundary`` our seeded
``RandomState(seed).permutation`` consumes the generator exactly like
the reference's two global ``np.random.shuffle`` calls after
``np.random.seed(seed)``, so the train/val split — and therefore the
fitted SVM boundary — matches bit-for-bit.

The reference file uses the long-removed ``np.int`` alias at runtime;
the fixture patches it in for the duration of the call.
"""

import importlib.util
import os

import numpy as np
import pytest

from transeditor_tpu.edit.boundary import linear_interpolate, train_boundary

REF_DIR = "/root/reference/our_interfaceGAN"


def _load(name):
    spec = importlib.util.spec_from_file_location(
        f"ref_{name}", os.path.join(REF_DIR, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_train_boundary_exact_oracle(monkeypatch, capsys):
    monkeypatch.setattr(np, "int", int, raising=False)
    ref = _load("train_boundary")

    rng = np.random.RandomState(42)
    latents = rng.randn(200, 32).astype(np.float32)
    scores = rng.randn(200, 1).astype(np.float32)   # unique w.p. 1

    np.random.seed(7)
    want = ref.train_boundary(latents.copy(), scores.copy(),
                              chosen_num_or_ratio=0.1, split_ratio=0.7)
    got = train_boundary(latents, scores, chosen_ratio=0.1,
                         split_ratio=0.7, seed=7, verbose=False)
    assert want.shape == got.shape == (1, 32)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_train_boundary_invalid_value_filter(monkeypatch):
    monkeypatch.setattr(np, "int", int, raising=False)
    ref = _load("train_boundary")

    rng = np.random.RandomState(0)
    latents = rng.randn(150, 16).astype(np.float32)
    scores = rng.randn(150, 1).astype(np.float32)
    scores[::5] = -1.0   # invalid sentinel rows

    np.random.seed(3)
    want = ref.train_boundary(latents.copy(), scores.copy(),
                              chosen_num_or_ratio=12, split_ratio=0.7,
                              invalid_value=-1.0)
    got = train_boundary(latents, scores, chosen_ratio=12,
                         split_ratio=0.7, invalid_value=-1.0, seed=3,
                         verbose=False)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("shape", [(1, 24), (1, 16, 24)])
def test_linear_interpolate_exact_oracle(shape):
    ref = _load("linear_interpolation")
    rng = np.random.RandomState(1)
    latent = rng.randn(*shape).astype(np.float32)
    b = rng.randn(1, shape[-1]).astype(np.float32)
    b /= np.linalg.norm(b)

    want = ref.linear_interpolate(latent, b, start_distance=-3.0,
                                  end_distance=3.0, steps=7)
    got = linear_interpolate(latent, b, start_distance=-3.0,
                             end_distance=3.0, steps=7)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
