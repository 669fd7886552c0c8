import jax
import jax.numpy as jnp
import numpy as np

from transeditor_tpu.config import ModelConfig
from transeditor_tpu.models import Generator
from transeditor_tpu.serve import InferenceEngine, _pad_pow2

CFG = ModelConfig(size=16, style_dim=32, param_dim=32, max_channels=32,
                  n_trans=1)


def test_pad_pow2():
    assert _pad_pow2(1) == 1
    assert _pad_pow2(3) == 4
    assert _pad_pow2(65) == 128


def test_engine_endpoints():
    g = Generator(CFG)
    z = jnp.zeros((1, 16, 32))
    params = g.init(jax.random.PRNGKey(0), z, z)
    eng = InferenceEngine(CFG, params)

    img, zp, pp = eng.sample(3)
    assert img.shape == (3, 16, 16, 3) and img.dtype == np.uint8
    assert zp.shape == (3, 16, 32)

    dec = eng.decode(zp, pp, plus_space=True)
    assert dec.shape == (3, 16, 16, 3)
    # decode(sample's plus codes) reproduces the sampled images
    np.testing.assert_allclose(dec.astype(int), img.astype(int), atol=1)

    # boundaries live in the flattened token space [1, 16*D]
    boundary = np.random.RandomState(0).randn(1, 16 * 32).astype(np.float32)
    boundary /= np.linalg.norm(boundary)
    strip = eng.edit_strip(zp[0], pp[0], boundary, space="p", steps=5)
    assert strip.shape == (5, 16, 16, 3)
