"""E2e visual-driver tests on a tiny model (writes real PNG grids)."""

import os

import jax
import jax.numpy as jnp
import pytest

from transeditor_tpu.cli.visualize import (Sampler, run_dat_interp,
                                           run_interp, run_sample, run_swap)
from transeditor_tpu.config import ModelConfig
from transeditor_tpu.models import Generator

CFG = ModelConfig(size=16, style_dim=32, param_dim=32, max_channels=32,
                  n_trans=1)


@pytest.fixture(scope="module")
def sampler():
    g = Generator(CFG)
    z = jnp.zeros((1, 16, 32))
    params = g.init(jax.random.PRNGKey(0), z, z)
    return Sampler(CFG, params)


def test_run_sample(sampler, tmp_path):
    run_sample(sampler, str(tmp_path), n_sample=4, loops=2)
    assert os.path.exists(tmp_path / "0.png")
    assert os.path.exists(tmp_path / "1.png")


def test_run_swap(sampler, tmp_path):
    run_swap(sampler, str(tmp_path), "z", n_sample=3, loops=2)
    run_swap(sampler, str(tmp_path), "p", n_sample=3, loops=2)
    assert os.path.exists(tmp_path / "swap_z.png")
    assert os.path.exists(tmp_path / "swap_p.png")


def test_run_swap_asymmetric_dims(tmp_path):
    """style_dim != param_dim: each swap leg must sample the FIXED and
    FRESH codes with their own space's dim (regression: both used
    style_dim and only worked because the dims matched)."""
    cfg = ModelConfig(size=16, style_dim=32, param_dim=16,
                      max_channels=32, n_trans=1)
    g = Generator(cfg)
    params = g.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, 16, 32)), jnp.zeros((1, 16, 16)))
    s = Sampler(cfg, params)
    run_swap(s, str(tmp_path), "z", n_sample=2, loops=2)
    run_swap(s, str(tmp_path), "p", n_sample=2, loops=2)
    assert os.path.exists(tmp_path / "swap_z.png")
    assert os.path.exists(tmp_path / "swap_p.png")


@pytest.mark.parametrize("space", ["z", "z+", "w", "p", "p+"])
def test_run_interp_spaces(sampler, tmp_path, space):
    run_interp(sampler, str(tmp_path), space, n_rows=2, steps=3,
               num_tests=1)
    assert os.path.exists(tmp_path / f"interp_{space}_0.png")


@pytest.mark.parametrize("space", ["z", "z+", "p", "p+"])
def test_run_dat_interp_spaces(sampler, tmp_path, space):
    run_dat_interp(sampler, str(tmp_path), space, n=2, steps=2,
                   num_tests=1)
    assert os.path.exists(tmp_path / f"interp_{space}_0.png")
