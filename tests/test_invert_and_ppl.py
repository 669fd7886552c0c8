"""Projector + PPL smoke tests on tiny configs (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transeditor_tpu.config import ModelConfig
from transeditor_tpu.invert.projector import (ProjectorConfig,
                                              estimate_latent_stats,
                                              noise_regularize, project)
from transeditor_tpu.metrics.ppl import compute_ppl
from transeditor_tpu.models import Generator
from transeditor_tpu.zoo.lpips import LPIPS

CFG = ModelConfig(size=16, style_dim=32, param_dim=32, max_channels=32,
                  n_trans=1)


@pytest.fixture(scope="module")
def gen_params():
    g = Generator(CFG)
    z = jnp.zeros((1, 16, 32))
    return g.init(jax.random.PRNGKey(0), z, z)


@pytest.fixture(scope="module")
def lpips_params():
    net = LPIPS(net="vgg")
    x = jnp.zeros((1, 16, 16, 3))
    return net.init(jax.random.PRNGKey(1), x, x)


def test_estimate_latent_stats(gen_params):
    zm, zs, pm = estimate_latent_stats(CFG, gen_params,
                                       jax.random.PRNGKey(2),
                                       n_samples=200, chunk=100)
    assert zm.shape == (16, 32)
    assert zs.shape == (32,)
    assert pm.shape == (16, 32)
    assert np.isfinite(np.asarray(zs)).all() and (np.asarray(zs) > 0).all()


def test_noise_regularize_scale_recursion():
    noises = [jnp.ones((1, 16, 16, 1))]
    v = noise_regularize(noises)
    # (mean 1)^2 * 2 directions * 2 scales (16 -> 8, break at 8)
    np.testing.assert_allclose(float(v), 4.0, rtol=1e-5)


def test_project_reduces_perceptual_loss(gen_params, lpips_params):
    g = Generator(CFG)
    # target = a real generator output, so a perfect inversion exists
    z = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 32))
    p = jax.random.normal(jax.random.PRNGKey(4), (2, 16, 32))
    target = g.apply(gen_params, z, p).image

    pcfg = ProjectorConfig(steps=30, lr=0.05, trace_every=1)
    res = project(CFG, gen_params, lpips_params, target, pcfg,
                  key=jax.random.PRNGKey(5))
    trace = res["perceptual_trace"]
    assert res["z_plus"].shape == (2, 16, 32)
    assert res["image"].shape == tuple(target.shape)
    assert trace[-1] < trace[0]  # loss went down


def test_project_with_noise_optimization(gen_params, lpips_params):
    cfg = ModelConfig(size=16, style_dim=32, param_dim=32, max_channels=32,
                      n_trans=1, layer_noise_injection=True)
    g = Generator(cfg)
    z = jnp.zeros((1, 16, 32))
    params = g.init({"params": jax.random.PRNGKey(0),
                     "noise": jax.random.PRNGKey(1)}, z, z)
    target = jnp.zeros((1, 16, 16, 3))
    pcfg = ProjectorConfig(steps=5, optimize_noise=True, trace_every=1)
    res = project(cfg, params, lpips_params, target, pcfg,
                  key=jax.random.PRNGKey(6))
    assert "noises" in res
    assert len(res["noises"]) == cfg.num_layers
    # normalized noise maps: mean ~0, UNBIASED std ~1 (torch .std()
    # semantics — see tests/test_projector_oracle.py)
    n0 = res["noises"][1]
    np.testing.assert_allclose(n0.mean(), 0.0, atol=1e-4)
    np.testing.assert_allclose(n0.std(ddof=1), 1.0, atol=1e-3)


def test_ppl_smoke(gen_params, lpips_params):
    for space in ("all", "z", "p"):
        v = compute_ppl(CFG, gen_params, lpips_params, space=space,
                        eval_plus=True, crop=False, n_samples=8, batch=4)
        assert np.isfinite(v), space
