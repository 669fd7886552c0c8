"""Evaluator fan-out sharded over the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from transeditor_tpu.config import ModelConfig
from transeditor_tpu.metrics.evaluator import evaluate_fid
from transeditor_tpu.metrics.inception import InceptionV3Features
from transeditor_tpu.models import Generator
from transeditor_tpu.parallel import create_mesh

CFG = ModelConfig(size=16, style_dim=32, param_dim=32, max_channels=32,
                  n_trans=1)


def test_fid_eval_on_mesh():
    gen = Generator(CFG)
    z = jnp.zeros((1, 16, 32))
    gen_params = gen.init(jax.random.PRNGKey(0), z, z)
    # tiny inception stand-in is too slow; use the real net at 16px
    # input (resize to 299 happens inside) but only 16 samples
    inception = InceptionV3Features()
    inc_params = inception.init(jax.random.PRNGKey(1),
                                jnp.zeros((1, 299, 299, 3)))
    mesh = create_mesh(n_data=8, n_model=1)

    rng = np.random.RandomState(0)
    real_feats = rng.randn(64, 2048)
    mean, cov = real_feats.mean(0), np.cov(real_feats, rowvar=False)

    fid = evaluate_fid(CFG, gen_params, inc_params, mean, cov,
                       n_samples=16, batch=16, mesh=mesh)
    assert np.isfinite(fid)
