"""bench.py's sharded sampling path on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_sampler
from transeditor_tpu.config import ModelConfig
from transeditor_tpu.parallel import create_mesh


def test_bench_sampler_on_mesh():
    assert len(jax.devices()) == 8
    cfg = ModelConfig(size=16, style_dim=32, param_dim=32,
                      max_channels=32, n_trans=1)
    mesh = create_mesh(n_data=8, n_model=1)
    params, sample_many, batch = build_sampler(cfg, batch_per_chip=2,
                                               iters=2, mesh=mesh)
    assert batch == 16  # 2 per chip x 8 chips
    acc = float(np.asarray(sample_many(params, jax.random.PRNGKey(0))))
    assert np.isfinite(acc)


def test_bench_sampler_single_device_matches_meshless():
    """mesh=None path still works and gives a deterministic checksum."""
    cfg = ModelConfig(size=16, style_dim=32, param_dim=32,
                      max_channels=32, n_trans=1)
    params, sample_many, batch = build_sampler(cfg, batch_per_chip=4,
                                               iters=2, mesh=None)
    assert batch == 4
    a = float(np.asarray(sample_many(params, jax.random.PRNGKey(1))))
    b = float(np.asarray(sample_many(params, jax.random.PRNGKey(1))))
    assert np.isfinite(a) and a == b
