"""Shape / mode tests for every Generator forward seam the reference
exposes (model_spatial_query.py:591-728) plus the Discriminator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transeditor_tpu.config import ModelConfig
from transeditor_tpu.models import Discriminator, Generator

TINY = ModelConfig(size=32, style_dim=64, param_dim=64, max_channels=64,
                   n_trans=2)


@pytest.fixture(scope="module")
def gen_and_params():
    g = Generator(TINY)
    z = jnp.zeros((2, 16, 64))
    p = jnp.zeros((2, 16, 64))
    params = g.init(jax.random.PRNGKey(0), z, p)
    return g, params


def _codes(key, b=2, d=64):
    kz, kp = jax.random.split(key)
    return (jax.random.normal(kz, (b, 16, d)),
            jax.random.normal(kp, (b, 16, d)))


def test_full_forward(gen_and_params):
    g, params = gen_and_params
    z, p = _codes(jax.random.PRNGKey(1))
    out = g.apply(params, z, p, return_similarity=True)
    assert out.image.shape == (2, 32, 32, 3)
    assert out.latent.shape == (2, TINY.n_latent, 64)
    assert out.p_plus.shape == (2, 16, 64)
    assert out.z_plus.shape == (2, 16, 64)
    assert len(out.similarity) == TINY.n_trans
    assert out.similarity[0].shape == (2, TINY.attn_groups, 16, 16)
    assert np.isfinite(np.asarray(out.image)).all()


def test_map_codes_mode(gen_and_params):
    g, params = gen_and_params
    z, p = _codes(jax.random.PRNGKey(2))
    z_plus, p_plus = g.apply(params, z, p, method="map_codes")
    assert z_plus.shape == z.shape and p_plus.shape == p.shape
    # plus-space decode must reproduce the full forward exactly
    out_full = g.apply(params, z, p)
    out_plus = g.apply(params, z_plus, p_plus, map_z=False, map_p=False)
    np.testing.assert_allclose(np.asarray(out_full.image),
                               np.asarray(out_plus.image), atol=1e-5)


def test_input_is_latent_mode(gen_and_params):
    """w-space direct decoding (reference :618-621,687-688)."""
    g, params = gen_and_params
    z, p = _codes(jax.random.PRNGKey(3))
    latent = g.apply(params, z, p).latent
    out = g.apply(params, latent, p, input_is_latent=True)
    ref = g.apply(params, z, p)
    np.testing.assert_allclose(np.asarray(out.image),
                               np.asarray(ref.image), atol=1e-5)


def test_style_latents_method(gen_and_params):
    g, params = gen_and_params
    z, p = _codes(jax.random.PRNGKey(4))
    zp, pp = g.apply(params, z, p, method="map_codes")
    tokens = g.apply(params, zp, pp, method="interact_codes")
    lat = g.apply(params, tokens, method="style_latents_from")
    assert lat.shape == (2, TINY.n_latent, 64)
    np.testing.assert_allclose(np.asarray(lat),
                               np.asarray(g.apply(params, z, p).latent),
                               atol=1e-5)


def test_no_trans_model():
    cfg = ModelConfig(size=32, style_dim=64, param_dim=64, max_channels=64,
                      no_trans=True)
    g = Generator(cfg)
    z = jnp.zeros((2, 16, 64))
    p = jnp.zeros((2, 16, 64))
    params = g.init(jax.random.PRNGKey(0), z, p)
    z, p = _codes(jax.random.PRNGKey(5))
    out = g.apply(params, z, p)
    assert out.image.shape == (2, 32, 32, 3)


def test_noise_injection_modes():
    cfg = ModelConfig(size=32, style_dim=64, param_dim=64, max_channels=64,
                      n_trans=2, layer_noise_injection=True)
    g = Generator(cfg)
    z = jnp.zeros((2, 16, 64))
    p = jnp.zeros((2, 16, 64))
    params = g.init({"params": jax.random.PRNGKey(0),
                     "noise": jax.random.PRNGKey(1)}, z, p)
    z, p = _codes(jax.random.PRNGKey(6))
    # randomized noise draws differ across rng keys
    a = g.apply(params, z, p, rngs={"noise": jax.random.PRNGKey(2)})
    b = g.apply(params, z, p, rngs={"noise": jax.random.PRNGKey(3)})
    # noise weights are zero-init so images match despite different noise
    np.testing.assert_allclose(np.asarray(a.image), np.asarray(b.image),
                               atol=1e-6)
    # fixed noise buffers: pass explicit noise list
    noise = [jnp.ones((2, 2 ** ((i + 5) // 2), 2 ** ((i + 5) // 2), 1))
             for i in range(cfg.num_layers)]
    c = g.apply(params, z, p, noise=noise)
    assert c.image.shape == (2, 32, 32, 3)


def test_discriminator():
    cfg = ModelConfig(size=32, max_channels=64)
    d = Discriminator(cfg)
    img = jnp.zeros((4, 32, 32, 3))
    params = d.init(jax.random.PRNGKey(0), img)
    img = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    score = d.apply(params, img)
    assert score.shape == (4, 1)
    assert np.isfinite(np.asarray(score)).all()
