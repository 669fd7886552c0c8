"""Golden regression: fixed seeds + fixed inputs must keep producing
the outputs recorded while oracle parity with the reference held
(tests/golden/generator_v1.npz).  Catches silent numerical drift in
refactors without needing torch or the reference tree."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from transeditor_tpu.config import ModelConfig
from transeditor_tpu.models import Discriminator, Generator

FIXTURE = os.path.join(os.path.dirname(__file__), "golden",
                       "generator_v1.npz")


def test_generator_golden():
    data = np.load(FIXTURE)
    cfg = ModelConfig(size=32, n_trans=2, pixel_norm_axis="feature")
    g = Generator(cfg)
    z0 = jnp.zeros((1, 16, 512))
    params = g.init(jax.random.PRNGKey(1234), z0, z0)
    out = g.apply(params, jnp.asarray(data["z"]), jnp.asarray(data["p"]))

    np.testing.assert_allclose(np.asarray(out.z_plus), data["z_plus"],
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.p_plus), data["p_plus"],
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.latent), data["latent"],
                               atol=5e-5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.image), data["image"],
                               atol=2e-4, rtol=1e-3)

    d = Discriminator(cfg)
    dparams = d.init(jax.random.PRNGKey(77), jnp.zeros((1, 32, 32, 3)))
    score = d.apply(dparams, out.image)
    np.testing.assert_allclose(np.asarray(score), data["d_score"],
                               atol=2e-3, rtol=1e-3)
